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
# golden-dump patch: write per-range encode_item_t fields to encode_dump.txt
# (columns: x y w h dom_x dom_y dom_w dom_h transform s o distance), used to
# (re)generate tests/golden/*.txt.gz
if ! grep -q encode_dump.txt main.cpp; then
python3 - << 'PYEOF'
src = open('main.cpp').read()
anchor = '''    auto data = encoder.data();
    std::cout << "encoded in " << timer.elapsed() << " s.\\n";'''
dump = anchor + '''
    { // golden-dump patch (not upstream)
        FILE* df = fopen("encode_dump.txt", "w");
        for (const auto& e : data.encoded)
            fprintf(df, "%u %u %u %u %u %u %u %u %d %.9g %.9g %.9g\\n",
                    e.x, e.y, e.w, e.h, e.match.x, e.match.y,
                    e.match.sourceItemSize.x(), e.match.sourceItemSize.y(),
                    (int)e.match.score.transform, e.match.score.contrast,
                    e.match.score.brightness, e.match.score.distance);
        fclose(df);
    }'''
assert anchor in src
open('main.cpp','w').write(src.replace(anchor, dump))
PYEOF
fi
sed -i 's|std::is_pod<T>::value|std::is_standard_layout<T>::value \&\& std::is_trivial<T>::value|' image/Image2.hpp || true
sed -i 's|queueEmpty.wait(lock);|queueEmpty.wait(lock, [\&]{ return tasksDone == threads.size(); });|' encode/EncodingEngine2.hpp || true
grep -q 'ffp-contract' CMakeLists.txt || sed -i 's|-Wall -Werror|-Wall -ffp-contract=off|' CMakeLists.txt

mkdir -p build && cd build
cmake .. -DCMAKE_BUILD_TYPE=Release -G Ninja
ninja
echo "built: $DST/build/fractal_encode"
