#!/bin/bash
# Build the native runtime library (native/ -> native/build/libsdrpp_tpu_native.so)
set -e
cd "$(dirname "$0")/../native"
cmake -B build -G Ninja -DCMAKE_BUILD_TYPE=Release >/dev/null
ninja -C build
echo "built: $(ls build/libsdrpp_tpu_native.so)"
