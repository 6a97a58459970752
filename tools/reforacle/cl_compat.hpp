// OpenCL-C -> C++ compatibility prelude for the reference-oracle harness.
//
// The reference binary (Scthe/cnn-Super-Resolution) runs its math in 11
// OpenCL C kernels. This header lets those kernels compile UNMODIFIED as
// C++ (g++ -shared), so the actual reference binary can execute on plain
// CPU through tools/reforacle/cl_shim.cpp and mint true golden outputs
// for parity testing. It implements exactly the OpenCL C subset the
// kernels use (surveyed over src/kernel/*.cl): vector structs with
// .x/.y/.z/.w fields, dot/clamp/max, convert_* (truncating, per OpenCL
// round-toward-zero default), read_imageui with a CLAMP_TO_EDGE NEAREST
// sampler, get_global/local_id/size, barrier() via the shim's work-item
// scheduler, and atomic_cmpxchg (single-threaded execution, so plain).
//
// This is harness infrastructure, not framework code: nothing here is
// translated from the reference — it is a from-scratch mini OpenCL C
// runtime so the reference can be RUN as an oracle.
#pragma once
#include <cstddef>
#include <cstdint>
#include <cmath>

typedef unsigned int uint;
typedef unsigned char uchar;
typedef unsigned short ushort;

// address-space / access qualifiers: no-ops on the CPU
#define __kernel
#define __global
#define __constant static const
#define __local
#define __read_only
#define __write_only
#define __private
#ifndef __const
#define __const const
#endif

// ---------------------------------------------------------------------
// vector types (only the fields/ops the reference kernels use)
// ---------------------------------------------------------------------
struct int2 { int x, y; };
struct float2 { float x, y; };
struct float3 { float x, y, z; };
struct float4 { float x, y, z, w; };
struct uint3 { uint x, y, z; };
struct uint4 { uint x, y, z, w; };

static inline float dot(float4 a, float4 b) {
  return a.x * b.x + a.y * b.y + a.z * b.z + a.w * b.w;
}
static inline float3 clamp(float3 v, float lo, float hi) {
  float3 r;
  r.x = v.x < lo ? lo : (v.x > hi ? hi : v.x);
  r.y = v.y < lo ? lo : (v.y > hi ? hi : v.y);
  r.z = v.z < lo ? lo : (v.z > hi ? hi : v.z);
  return r;
}
static inline float clamp(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}
static inline float max(float a, float b) { return a > b ? a : b; }
static inline float min(float a, float b) { return a < b ? a : b; }

static inline float4 convert_float4(uint4 v) {
  float4 r; r.x = (float)v.x; r.y = (float)v.y; r.z = (float)v.z; r.w = (float)v.w;
  return r;
}
static inline float2 convert_float2(int2 v) {
  float2 r; r.x = (float)v.x; r.y = (float)v.y; return r;
}
// OpenCL convert_T on float defaults to round-toward-zero (truncate)
static inline uint convert_uint(float v) { return (uint)v; }
static inline uchar convert_uchar(uint v) { return (uchar)v; }
static inline uchar convert_uchar(float v) { return (uchar)v; }

// ---------------------------------------------------------------------
// images + samplers (only CLK_NORMALIZED_COORDS_FALSE | CLAMP_TO_EDGE |
// NEAREST is ever used — read_imageui ignores the sampler bits beyond
// clamping, which is all those flags ask for)
// ---------------------------------------------------------------------
typedef int sampler_t;
enum {
  CLK_NORMALIZED_COORDS_FALSE = 0,
  CLK_ADDRESS_CLAMP_TO_EDGE = 1,
  CLK_FILTER_NEAREST = 2,
};

struct __shim_image {  // layout shared with cl_shim.cpp's _cl_mem image view
  int w, h;
  const unsigned char* rgba;  // 4 bytes per pixel, row-major
};
typedef const __shim_image* image2d_t;

static inline uint4 read_imageui(image2d_t img, sampler_t, int2 pos) {
  int x = pos.x < 0 ? 0 : (pos.x >= img->w ? img->w - 1 : pos.x);
  int y = pos.y < 0 ? 0 : (pos.y >= img->h ? img->h - 1 : pos.y);
  const unsigned char* p = img->rgba + 4 * ((size_t)y * img->w + x);
  uint4 r; r.x = p[0]; r.y = p[1]; r.z = p[2]; r.w = p[3];
  return r;
}

// ---------------------------------------------------------------------
// work-item functions: the shim scheduler owns a WIIds block per running
// work-item and rebinds __cnnshim_ids before each resume
// ---------------------------------------------------------------------
struct __cnnshim_wi_ids {
  size_t gid[3], lid[3], lsz[3], gsz[3];
};
static __cnnshim_wi_ids* __cnnshim_ids = nullptr;
static void (*__cnnshim_barrier_fn)(void*) = nullptr;
static void* __cnnshim_barrier_arg = nullptr;

extern "C" void __cnnshim_bind(__cnnshim_wi_ids* ids, void (*bfn)(void*),
                               void* barg) {
  __cnnshim_ids = ids;
  __cnnshim_barrier_fn = bfn;
  __cnnshim_barrier_arg = barg;
}

static inline size_t get_global_id(uint d) { return __cnnshim_ids->gid[d]; }
static inline size_t get_global_size(uint d) { return __cnnshim_ids->gsz[d]; }
static inline size_t get_local_id(uint d) { return __cnnshim_ids->lid[d]; }
static inline size_t get_local_size(uint d) { return __cnnshim_ids->lsz[d]; }

enum { CLK_LOCAL_MEM_FENCE = 1, CLK_GLOBAL_MEM_FENCE = 2 };
static inline void barrier(int) { __cnnshim_barrier_fn(__cnnshim_barrier_arg); }

// single-threaded execution -> plain compare-exchange is exact
static inline uint atomic_cmpxchg(volatile uint* p, uint cmp, uint val) {
  uint old = *p;
  if (old == cmp) *p = val;
  return old;
}
