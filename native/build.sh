#!/bin/sh
# Build the native IO/geometry library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -o libsdpgs_io.so sdpgs_io.cc
echo "built $(pwd)/libsdpgs_io.so"
