#!/bin/sh
# Build the glam_native C++ data-path library.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -std=c++17 -shared -fPIC \
    csrc/glam_native.cpp -o lib/libglam_native.so
echo "built native/lib/libglam_native.so"
