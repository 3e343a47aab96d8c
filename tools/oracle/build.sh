#!/bin/bash
# Build the headless oracle against the read-only reference tree.
set -e
cd "$(dirname "$0")"
REF=/root/reference
TP=$REF/framework/third_party
# overridable for sanitizer test builds (tests/test_sanitizers.py):
#   EXTRA_FLAGS="-fsanitize=address,undefined -g" OUT=/tmp/oracle_san build.sh
EXTRA_FLAGS=${EXTRA_FLAGS:-}
OUT=${OUT:-oracle}
g++ -O2 -std=c++20 $EXTRA_FLAGS \
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
  oracle_main.cpp stubs.cpp \
  $REF/src/render.cpp $REF/src/light.cpp $REF/src/shading.cpp \
  $REF/src/interpolate.cpp $REF/src/texture.cpp $REF/src/scene.cpp \
  $REF/src/config.cpp $REF/src/bounding_volume_hierarchy.cpp \
  $REF/src/bvh_interface.cpp \
  $REF/framework/src/mesh.cpp $REF/framework/src/image.cpp \
  $REF/framework/src/trackball.cpp $TP/tinyobjloader/src/tiny_obj_loader.cc \
  $REF/prebuilt/libIntersect_linux_x64.a \
  -o "$OUT"
echo built: "$OUT"
