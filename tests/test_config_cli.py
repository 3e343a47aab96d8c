"""Config-file parsing + CLI parity tests (src/config.cpp:193-374,
src/main.cpp:478-535)."""

import os
import textwrap

import numpy as np
import pytest

from cge_tpu import Config, SceneType, read_config_file
from cge_tpu.cli import run
from cge_tpu.config import CameraConfig
from cge_tpu.scene.image_io import read_bmp
from cge_tpu.scene.scene import PointLight, SegmentLight, ParallelogramLight


def _write(tmp_path, body):
    p = tmp_path / "cfg.toml"
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_full_schema(tmp_path):
    path = _write(tmp_path, """
        command_line_rendering = true
        window_size = [320, 200]
        data_path = "default"
        scene = "cornell_box"
        output_dir = "~/renders"

        [features]
        enable_shading = true
        enable_recursive = true

        [features.extra]
        enable_bloom_effect = true
        enable_bilinear_texture_filtering = true

        [[cameras]]
        field_of_view = 65.0
        distance_from_look_at = 2.2
        look_at = [0.1, -0.1, 0.0]
        rotation = [-15.0, 40.0, 0.0]

        [[lights]]
        type = "point"
        position = [1.0, 2.0, 3.0]
        color = [1.0, 1.0, 1.0]

        [[lights]]
        type = "segment"
        endpoints = [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]
        colors = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]

        [[lights]]
        type = "parallelogram"
        corner = [0.0, 1.0, 0.0]
        edges = [[0.5, 0.0, 0.0], [0.0, 0.0, 0.5]]
        colors = [[1.0,0.0,0.0],[0.0,1.0,0.0],[0.0,0.0,1.0],[0.0,1.0,1.0]]
    """)
    cfg = read_config_file(path)
    assert cfg.cli_rendering_enabled
    assert tuple(cfg.window_size) == (320, 200)
    assert cfg.scene == SceneType.CornellBox
    # ~ expansion (config.cpp:245-247)
    assert cfg.output_dir == os.path.join(os.environ["HOME"], "renders")
    assert cfg.features.enable_shading and cfg.features.enable_recursive
    assert cfg.features.enable_bloom_effect
    assert cfg.features.enable_bilinear_texture_filtering
    assert not cfg.features.enable_hard_shadow
    assert len(cfg.cameras) == 1
    cam = cfg.cameras[0]
    assert cam.field_of_view == 65.0
    assert cam.look_at == (0.1, -0.1, 0.0)
    assert [type(l) for l in cfg.lights] == [PointLight, SegmentLight,
                                             ParallelogramLight]
    assert cfg.lights[2].color3 == (0.0, 1.0, 1.0)


def test_defaults_and_scene_int(tmp_path):
    path = _write(tmp_path, """
        scene = 6
        output_dir = "/tmp/x"
        [[lights]]
        type = "point"
        position = [0,0,0]
        color = [1,1,1]
    """)
    cfg = read_config_file(path)
    # command_line_rendering defaults TRUE in the parser (config.cpp:205)
    assert cfg.cli_rendering_enabled
    assert tuple(cfg.window_size) == (800, 800)
    assert cfg.scene == SceneType.Teapot
    assert cfg.cameras == []


def test_scene_obj_path(tmp_path):
    path = _write(tmp_path, """
        scene = "cube.obj"
        output_dir = "/tmp/x"
        [[lights]]
        type = "point"
        position = [0,0,0]
        color = [1,1,1]
    """)
    cfg = read_config_file(path)
    assert isinstance(cfg.scene, str) and cfg.scene.endswith("cube.obj")


def test_missing_scene_exits(tmp_path):
    path = _write(tmp_path, """
        scene = "nope.obj"
        output_dir = "/tmp/x"
    """)
    with pytest.raises(SystemExit):
        read_config_file(path)


def test_soft_shadow_not_parsed_quirk(tmp_path):
    """The reference parser never reads enable_soft_shadow /
    enable_transparency (config.cpp:257-315) — setting them in TOML must
    have no effect."""
    path = _write(tmp_path, """
        scene = "cube"
        output_dir = "/tmp/x"
        [features]
        enable_soft_shadow = true
        [features.extra]
        enable_transparency = true
    """)
    cfg = read_config_file(path)
    assert not cfg.features.enable_soft_shadow
    assert not cfg.features.enable_transparency


def test_cli_renders_bmp(tmp_path):
    from cge_tpu.types import Features

    cfg = Config(
        features=Features(enable_shading=True),
        cli_rendering_enabled=True,
        window_size=(24, 16),
        scene=SceneType.SingleTriangle,
        output_dir=str(tmp_path / "out"),
        cameras=[CameraConfig(), CameraConfig(field_of_view=65.0)],
    )
    paths = run(cfg)
    assert len(paths) == 2
    for i, p in enumerate(paths):
        assert os.path.exists(p)
        assert f"_cam_{i}.bmp" in p
        assert os.path.basename(p).startswith("single_triangle_")
        img = read_bmp(p)
        assert img.shape == (16, 24, 3)
    # the two cameras differ -> the images must differ
    a, b = read_bmp(paths[0]), read_bmp(paths[1])
    assert not np.array_equal(a, b)


def test_features_from_nested():
    """from_nested mirrors the reference's nested camelCase Features layout
    (common.h:54-77)."""
    from cge_tpu.types import Features

    f = Features.from_nested(
        {"enableShading": True, "enableAccelStructure": True,
         "extra": {"enableBvhSahBinning": True, "enableDepthOfField": True}})
    assert f == Features(enable_shading=True, enable_accel_structure=True,
                         enable_bvh_sah_binning=True,
                         enable_depth_of_field=True)
    f2 = Features.from_nested({"enableNormalInterp": True},
                              {"enableGlossyReflection": True})
    assert f2.enable_normal_interp and f2.enable_glossy_reflection
    import pytest
    with pytest.raises(KeyError):
        Features.from_nested({"enableWarpDrive": True})
