#!/bin/bash
# Build the Release-style (OpenMP-enabled) reference timing harness used as
# the bench.py baseline. Mirrors build.sh but with -DNDEBUG -fopenmp so the
# reference's OpenMP scanline loop is active (src/render.cpp:277-280).
set -e
cd "$(dirname "$0")"
REF=/root/reference
TP=$REF/framework/third_party
g++ -O2 -DNDEBUG -fopenmp -std=c++20 \
  -I. \
  -I$REF/src \
  -I$REF/framework/include -I$REF/framework/include/framework \
  -I$TP/glm \
  -I$TP/fmt/include \
  -I$TP/stb/include \
  -I$TP/tinyobjloader/include -I$TP/tinyobjloader/include/tinyobjloader \
  -I$TP/toml/include \
  -DFMT_HEADER_ONLY=1 \
  -DDATA_DIR="\"$REF/data/\"" \
  -DUSE_PREBUILT_INTERSECT=1 \
  bench_main.cpp stubs.cpp \
  $REF/src/render.cpp $REF/src/light.cpp $REF/src/shading.cpp \
  $REF/src/interpolate.cpp $REF/src/texture.cpp $REF/src/scene.cpp \
  $REF/src/config.cpp $REF/src/bounding_volume_hierarchy.cpp \
  $REF/src/bvh_interface.cpp \
  $REF/framework/src/mesh.cpp $REF/framework/src/image.cpp \
  $REF/framework/src/trackball.cpp $TP/tinyobjloader/src/tiny_obj_loader.cc \
  $REF/prebuilt/libIntersect_linux_x64.a \
  -o bench_oracle
echo built: $(pwd)/bench_oracle
