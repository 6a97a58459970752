// LP64-correct replacement for opencl::utils::work_sizes.
//
// The reference's implementation (UtilsOpenCL.cpp:129-197) copies its
// size_t work-group candidates with `memcpy(..., dim * sizeof(float))`
// (line 156) — correct only where sizeof(size_t) == sizeof(float) == 4
// (the 32-bit MinGW target of makefile:13-25). On LP64 it misplaces every
// element past dim 0 and leaves uninitialized stack in the rest, so every
// 2D launch dies in Kernel::check_work_parameters. The build script
// renames the broken symbol out of UtilsOpenCL.o (objcopy --redefine-sym)
// and links this implementation of the same CONTRACT instead:
//
//   - local work size: start [1,1,1]; round-robin over dims doubling one
//     dim at a time while (new dim <= device per-dim cap) && (new dim <=
//     pow2 ceiling of that dim's work amount) && (total items <= max
//     group size); stop entirely at the first failing dim.
//   - global work size: pow2[i] when the local dim reached the pow2
//     ceiling, else (work[i] / local[i] + 1) * local[i] — note the
//     unconditional +1 group, matching the reference formula exactly
//     (kernels bounds-check, so the overshoot is part of the contract).
//
// Device caps are the cnnshim device's (cl_shim.cpp clGetDeviceInfo):
// max group 256, per-dim [256, 256, 64]. work_sizes is only ever used
// against that device in this harness.
#include <cstddef>
#include <cstdio>
#include <stdexcept>

namespace opencl {
class Kernel;  // caps come from the shim device; the kernel is unused
namespace utils {

static size_t ceil_pow2(size_t v) {
  size_t p = 1;
  while (p < v) p <<= 1;
  return p;
}

void work_sizes(const Kernel&, size_t dim, size_t* global_work_size,
                size_t* local_work_size, size_t* work, bool print) {
  if (dim == 0 || dim > 3) throw std::runtime_error("work dim must be 1..3");
  const size_t dim_cap[3] = {256, 256, 64}, max_group = 256;

  size_t pow2[3] = {1, 1, 1};
  for (size_t i = 0; i < dim; i++) pow2[i] = ceil_pow2(work[i]);

  size_t local[3] = {1, 1, 1}, items = 1;
  for (size_t d = 0;; d = (d + 1) % dim) {
    size_t grown = local[d] * 2;
    if (grown > dim_cap[d] || grown > pow2[d] || items * 2 > max_group) break;
    local[d] = grown;
    items *= 2;
  }

  for (size_t i = 0; i < dim; i++) {
    local_work_size[i] = local[i];
    global_work_size[i] = (pow2[i] == local[i])
                              ? pow2[i]
                              : (work[i] / local[i] + 1) * local[i];
  }

  if (print) {
    printf("global work size: [%zu, %zu, %zu]\n", global_work_size[0],
           dim > 1 ? global_work_size[1] : 1,
           dim == 3 ? global_work_size[2] : 1);
    printf("local work size: [%zu, %zu, %zu]\n", local_work_size[0],
           dim > 1 ? local_work_size[1] : 1,
           dim == 3 ? local_work_size[2] : 1);
  }
}

}  // namespace utils
}  // namespace opencl
