"""Core static configuration types.

Mirrors the reference's `Features`/`ExtraFeatures` flag structs
(/root/reference/src/common.h:54-77) and the mutable UI-slider globals
(/root/reference/src/render.cpp:14-25, /root/reference/src/light.cpp:12-13)
as *frozen, hashable* dataclasses so XLA specializes one program per feature
combination (the TPU-native equivalent of the C++ branch-per-ray dispatch).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Features:
    """Feature flags. Reference: src/common.h:54-77.

    Flat layout (the reference nests "extra" flags; we flatten for ergonomics
    but keep a ``from_nested`` constructor for config parity).
    """

    enable_shading: bool = False
    enable_recursive: bool = False
    enable_hard_shadow: bool = False
    enable_soft_shadow: bool = False
    enable_normal_interp: bool = False
    enable_texture_mapping: bool = False
    enable_accel_structure: bool = False
    # "extra" features (common.h:54-65)
    enable_environment_mapping: bool = False
    enable_bvh_sah_binning: bool = False
    enable_motion_blur: bool = False
    enable_bloom_effect: bool = False
    enable_bilinear_texture_filtering: bool = False
    enable_mipmap_texture_filtering: bool = False
    enable_multiple_rays_per_pixel: bool = False
    enable_glossy_reflection: bool = False
    enable_transparency: bool = False
    enable_depth_of_field: bool = False

    def replace(self, **kw) -> "Features":
        return dataclasses.replace(self, **kw)

    @classmethod
    def from_nested(cls, base: dict, extra: dict | None = None) -> "Features":
        """Build from the reference's nested camelCase layout
        (common.h:54-77): ``base`` maps the seven ``Features`` members,
        ``extra`` the ``ExtraFeatures`` members (or pass ``base['extra']``)."""
        import re

        def snake(name: str) -> str:
            return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()

        merged = dict(base)
        nested = merged.pop("extra", None)
        if extra is None:
            extra = nested or {}
        merged.update(extra)
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in merged.items():
            s = snake(k)
            if s not in fields:
                raise KeyError(f"unknown feature flag: {k!r}")
            kw[s] = bool(v)
        return cls(**kw)


@dataclasses.dataclass(frozen=True)
class RenderParams:
    """Tunable render parameters.

    The reference exposes these as mutable globals bound to ImGui sliders
    (src/render.cpp:14-25, src/light.cpp:12-13) with a hardcoded ray depth of
    5 (src/render.cpp:298,307,318). Here they are static (compile-time)
    parameters.
    """

    ray_depth: int = 5                       # render.cpp:298 (hardcoded 5)
    rays_per_pixel_side: int = 3             # render.cpp:14
    samples_dof: int = 5                     # render.cpp:15
    focus_plane_distance: float = 3.0        # render.cpp:16
    blur_strength: float = 0.005             # render.cpp:17
    bloom_scalar: float = 0.3                # render.cpp:19
    bloom_threshold: float = 0.4             # render.cpp:20
    bloom_debug_option: int = 0              # render.cpp:21
    glossy_reflections_cap: int = 3          # render.cpp:23
    rays_per_reflection: int = 40            # render.cpp:24
    alpha_modifier: float = 1.0              # render.cpp:25
    segment_light_samples: int = 25          # light.cpp:12
    parallelogram_light_direction_samples: int = 5  # light.cpp:13
    # TPU-specific knobs (no reference equivalent):
    # extra bounce-loop unroll levels past ray_depth: the reference's
    # transparency continuation path recurses *past* depth 0 until a miss or
    # an opaque hit (render.cpp:122-130 has no depth gate); we bound it.
    extra_transparency_unroll: int = 6
    # rays per tile for the chunked intersection sweep
    ray_tile: int = 2048
    # rays per compiled trace body: bigger wavefronts are lax.map-chunked at
    # this size so XLA compile time / VMEM stay resolution-independent,
    # while chunking also keeps the whole-level dead-skip granularity fine
    # enough to matter on mirror-bounce levels (64k measured best on the
    # teapot-512 bench in round 3; 256k/unchunked is ~2.5x worse)
    trace_chunk: int = 65536
    # triangles per tile in the intersection scan
    tri_tile: int = 512
    # rays per block in the Pallas cluster sweep (one grid program per
    # block walks its front-to-back cluster order); bigger blocks amortize
    # the per-visit loop overhead, smaller blocks cull tighter frustums
    sweep_br: int = 512
    # per-ray (exact) vs per-block interval-arithmetic (conservative) entry
    # keys for the sweep's visit order — exact costs O(blocks*boxes*rays)
    # but typically halves the dense-tile visits
    sweep_exact_keys: bool = True
    # separate key-pass choice for any-hit (shadow occlusion) sweeps, whose
    # results don't depend on visit order. Isolated 65k-dispatch timings
    # favored frustum keys (0.38-0.48 vs 0.50 ms) but the full teapot-512
    # frame measured WORSE with them (16.4 vs 15.6 ms — the approximate
    # order costs more dense visits than the cheap keys save), so the
    # default stays exact; the knob remains for scene-specific tuning.
    sweep_anyhit_exact_keys: bool = True
    # let primary-ray sweeps use the single-shared-origin fast path (hoists
    # the origin dot products out of the dense tiles)
    sweep_shared_origin: bool = True
    # clusters per supercluster (the HBM path's visit/DMA granularity) for
    # closest-hit and any-hit sweeps; None = the kernel default (1 resident,
    # SUPERCLUSTER streamed). The field-major repack (r5) made per-cluster
    # DMA 8x cheaper, so divergent bounce batches can afford finer visits.
    sweep_sc_n: int | None = None
    sweep_anyhit_sc_n: int | None = None
    # sweep-local coherence sort (alive-first + octant + origin-morton,
    # intersect.coherent_sweep_order) for divergent batches. Default OFF:
    # measured a LOSS even on the HBM dragon frame (259.6 vs 223.1 ms, r5
    # PERF log) — TPU argsort at 65k costs more than the packed blocks
    # save, on every scene tried (r4 tombstone confirmed at scale). The
    # knob + parity test stay for future hardware/shape regimes.
    sweep_sort_bounce: bool | None = None
    sweep_sort_shadow: bool | None = None
    # run the any-hit TRIANGLE shadow sweep reversed (origin at the light
    # sample — tight per-block origin hulls; measured 22% faster on teapot,
    # PERF_r04.md). Reversal is exact for triangles; spheres always test
    # forward (ADVICE r4). Scene-dependent: forward keeps the surface-tile
    # coherence instead.
    sweep_shadow_reverse: bool = True
    # mesh-axis name/size for primitive-sharded closest hit (the TP analogue;
    # set inside shard_map when the mesh has a 'prims' axis)
    prims_axis: str | None = None
    prims_axis_size: int = 1

    def replace(self, **kw) -> "RenderParams":
        return dataclasses.replace(self, **kw)


DEFAULT_FEATURES = Features()
DEFAULT_PARAMS = RenderParams()
