#!/bin/sh
# Build the native runtime components into neus2_tpu/native/.
set -e
cd "$(dirname "$0")"
mkdir -p ../neus2_tpu/native/lib
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    marching_cubes.cpp image_loader.cpp mesh_raster.cpp triangle_bvh.cpp \
    -lpng -ljpeg -lz -pthread \
    -o ../neus2_tpu/native/lib/libneus2_native.so
echo "built neus2_tpu/native/lib/libneus2_native.so"
