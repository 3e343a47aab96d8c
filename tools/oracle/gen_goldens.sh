#!/bin/bash
# Generate golden float images from the headless oracle for every
# deterministic feature combination (stochastic features — soft shadows,
# MSAA, DoF, glossy — use rand() in the reference and cannot be
# golden-tested pixel-exactly; see SURVEY.md §2.5 #14).
set -e
cd "$(dirname "$0")"
OUT=../../tests/golden/images
mkdir -p $OUT
R=${1:-64}

run() { # name scene features [fov dist look rot]
  local name=$1 scene=$2 feats=$3
  local fov=${4:-50} dist=${5:-3} look=${6:-0,0,0} rot=${7:-20,20,0}
  ./oracle "$scene" $R $R "$feats" $fov $dist $look $rot "$OUT/$name.raw"
}

run triangle_flat        single_triangle none
run triangle_shading     single_triangle shading
run spheres_shading      spheres         shading
run cornell_phong        cornell_box     shading,hard_shadow
run cornell_recursive    cornell_box     shading,hard_shadow,recursive
run cornell_accel        cornell_box     shading,hard_shadow,recursive,accel
run cornell_bloom        cornell_box     shading,hard_shadow,recursive,bloom
run cornell_cam2         cornell_box     shading,hard_shadow,recursive 65 2.2 0.1,-0.1,0 -15,40,0
run monkey_interp        monkey          shading,normal_interp,accel
run monkey_flat_normals  monkey          shading,accel
run cube_tex_nearest     cube_textured   shading,texture
run cube_tex_bilinear    cube_textured   shading,texture,bilinear
run cube_trans           cube            shading,transparency
run cube_rec_quirk       cube            shading,recursive
run cube_trans_rec       cube            shading,transparency,recursive
run teapot_accel         teapot          shading,accel
run teapot_sah           teapot          shading,accel,sah
run spheres_shadow       spheres         shading,hard_shadow
run custom_tex_nearest   custom          shading,texture
run custom_tex_bilinear  custom          shading,texture,bilinear
run cornell_pl_quirk     cornell_box_parallelogram_light shading,hard_shadow
echo "goldens written to $OUT"
