#!/bin/sh
# Build the native frame-loading runtime -> libsuper_runtime.so
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -std=c++17 frame_loader.cpp -o libsuper_runtime.so \
    -lpng -lz -lpthread
echo "built $(pwd)/libsuper_runtime.so"
