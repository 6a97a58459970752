#!/bin/bash
# Build the UNMODIFIED reference binary (Scthe/cnn-Super-Resolution) against
# the cnnshim CPU OpenCL implementation, so it can run as a parity oracle.
#
# The reference's own makefile targets 32-bit MinGW/clang on Windows
# (makefile:13-25); this script is the Linux equivalent with three
# non-invasive compatibility shims (the reference tree is never modified):
#   1. an include dir containing files literally named 'opencl\Context.hpp'
#      etc. — Main_cl.cpp:13-14 and ConfigBasedDataPipeline.cpp:13-14 use
#      backslash include paths that MinGW resolved as path separators;
#   2. compat64.cpp + a forced-include declaration providing the
#      try_read_uint(JsonNode&, size_t&, ...) overload — the sources assume
#      ILP32 where size_t == unsigned int (e.g. Config.cpp:113-121);
#   3. tools/reforacle/cl_shim.cpp as the OpenCL library (no platform
#      exists in this environment: ocl-icd reports 0 vendors, no POCL).
#
# NOTE: `make test` (bin/test) is NOT buildable from the committed tree on
# ANY platform: test/specs/*.cpp call DataPipeline methods with arities
# that no longer exist in DataPipeline.hpp (e.g. LayerTest.cpp:125 passes
# 7 args to the 9-arg execute_layer) — upstream API drift. Only bin/cnn
# (the main binary) links.
set -euo pipefail

R=${REFERENCE_DIR:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
BUILD=${1:-/tmp/refbuild}
mkdir -p "$BUILD/obj" "$BUILD/bin"

# shim include dir for the backslash includes
mkdir -p "$BUILD/shim_inc"
printf '#include "opencl/Context.hpp"\n' > "$BUILD/shim_inc/opencl\\Context.hpp"
printf '#include "opencl/UtilsOpenCL.hpp"\n' > "$BUILD/shim_inc/opencl\\UtilsOpenCL.hpp"

# 64-bit compat shim (declaration forced into every TU + definition)
cat > "$BUILD/compat_decl.hpp" <<'EOF'
#include <cstddef>
struct JsonNode;
namespace cnn_sr { namespace utils {
bool try_read_uint(JsonNode&, unsigned long&, const char*);
}}
EOF
cat > "$BUILD/compat64.cpp" <<'EOF'
// size_t& overload of try_read_uint for LP64 (sources assume ILP32)
struct JsonNode;
namespace cnn_sr { namespace utils {
bool try_read_uint(JsonNode&, unsigned int&, const char*);
bool try_read_uint(JsonNode& node, unsigned long& lhs, const char* key) {
  unsigned int tmp = 0;
  if (try_read_uint(node, tmp, key)) { lhs = tmp; return true; }
  return false;
}
}}
EOF

CXXFLAGS="-std=c++11 -O2 -w -include $BUILD/compat_decl.hpp \
  -I$R/libs/include -I$R/src -I$BUILD/shim_inc"

for src in "$R"/src/*.cpp "$R"/src/opencl/*.cpp "$R"/libs/cpp/gason.cpp; do
  obj="$BUILD/obj/$(basename "${src%.cpp}").o"
  [ "$obj" -nt "$src" ] || g++ $CXXFLAGS -c -o "$obj" "$src"
done

# UtilsOpenCL.cpp:156 under-copies size_t work sizes on LP64 (sizeof(float)
# memcpy — a 32-bit-target bug); rename the broken work_sizes out of the
# object and link work_sizes_lp64.cpp's contract-equivalent instead
objcopy --redefine-sym \
  _ZN6opencl5utils10work_sizesERKNS_6KernelEmPmS4_S4_b=__cnnshim_broken_work_sizes \
  "$BUILD/obj/UtilsOpenCL.o"
g++ -std=c++11 -O2 -Wall -c -o "$BUILD/obj/work_sizes_lp64.o" \
  "$HERE/work_sizes_lp64.cpp"
g++ -std=c++11 -O2 -w -c -o "$BUILD/obj/compat64.o" "$BUILD/compat64.cpp"
g++ -std=c++11 -O2 -Wall -c -o "$BUILD/obj/cl_shim.o" "$HERE/cl_shim.cpp" \
  -I"$R/libs/include" -DCNNSHIM_COMPAT_DIR="\"$HERE\""

g++ -o "$BUILD/bin/cnn" "$BUILD"/obj/*.o -ldl

# run dir: binary resolves src/kernel/*.cl relative to cwd; the reference
# tree is read-only so outputs must land elsewhere
mkdir -p "$BUILD/run"
ln -sfn "$R/src" "$BUILD/run/src"
ln -sfn "$R/test" "$BUILD/run/test"
echo "built $BUILD/bin/cnn (run from $BUILD/run)"
