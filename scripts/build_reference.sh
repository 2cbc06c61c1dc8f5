#!/usr/bin/env bash
# Build the reference C++ encoder (sebsgit/fractencode) for baseline
# measurement and parity-golden regeneration.
#
# The pristine reference at /root/reference does not compile or run correctly
# on a modern toolchain; two patches are required (documented in BASELINE.md):
#   1. missing <mutex>/<condition_variable> includes + a condvar lost-wakeup
#      deadlock in EncodingEngine2.hpp (wait() without predicate);
#   2. -ffp-contract=off so GCC does not fuse the YUV multiply-adds into FMAs
#      (with FMA the binary's Y plane diverges from its own source semantics);
#      plus std::is_pod deprecation under C++20 -Werror.
#
# The patched copy lives in /tmp (never inside this repo).
set -euo pipefail

SRC=${1:-/root/reference}
DST=${2:-/tmp/refsrc}

if [ ! -e "$DST/CMakeLists.txt" ]; then
    cp -r "$SRC" "$DST"
fi

cd "$DST"
sed -i 's|#include <thread>|#include <thread>\n#include <mutex>\n#include <condition_variable>|' encode/EncodingEngine2.hpp || true
sed -i 's|std::is_pod<T>::value|std::is_standard_layout<T>::value \&\& std::is_trivial<T>::value|' image/Image2.hpp || true
sed -i 's|queueEmpty.wait(lock);|queueEmpty.wait(lock, [\&]{ return tasksDone == threads.size(); });|' encode/EncodingEngine2.hpp || true
grep -q 'ffp-contract' CMakeLists.txt || sed -i 's|-Wall -Werror|-Wall -ffp-contract=off|' CMakeLists.txt

mkdir -p build && cd build
cmake .. -DCMAKE_BUILD_TYPE=Release -G Ninja
ninja
echo "built: $DST/build/fractal_encode"
