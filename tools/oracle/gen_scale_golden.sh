#!/bin/bash
# Regenerate the scale-scene golden: the deterministic 614k-triangle dragon
# stand-in (tools/make_large_asset.py) rendered by the compiled reference at
# 256x256 through its file-load path (loadSceneFromFile, no normalization).
# Pairs with tests/test_golden_images.py::test_golden_dragon_scale_256.
set -e
cd "$(dirname "$0")"
OBJ=/tmp/cge_dragon_golden.obj
[ -f "$OBJ" ] || python ../make_large_asset.py "$OBJ"
./oracle "$OBJ" 256 256 shading,hard_shadow,normal_interp,accel \
  50 3 0,0,0 20,20,0 ../../tests/golden/images/dragon_scale_256.raw \
  pointlight:-1,1,-1
echo "dragon scale golden written"
