"""Profiling, metrics and observability.

The reference's only instrumentation is wall-clock prints — BVH build ms +
max leaf size (/root/reference/src/bounding_volume_hierarchy.cpp:192-193)
and per-render ms (/root/reference/src/main.cpp:232-236, 532-534). This
module reproduces those hooks and adds the TPU-native ones the reference
lacks (SURVEY.md §5): rays/s accounting, a jax.profiler trace context, and
a roofline estimate for the intersection sweep.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import numpy as np


@dataclasses.dataclass
class RenderStats:
    """One render's counters. rays = primary + shadow + bounce rays actually
    traced (what the wavefront dispatched, not what the reference would have
    recursed)."""

    wall_ms: float = 0.0
    width: int = 0
    height: int = 0
    primary_rays: int = 0
    total_rays: int = 0

    @property
    def rays_per_s(self) -> float:
        return self.total_rays / (self.wall_ms / 1e3) if self.wall_ms else 0.0

    def __str__(self) -> str:
        return (f"Rendering took {self.wall_ms:.0f} ms "
                f"({self.width}x{self.height}, "
                f"{self.total_rays / 1e6:.2f} Mrays, "
                f"{self.rays_per_s / 1e6:.2f} Mrays/s)")


def count_rays(width: int, height: int, scene, features, params) -> int:
    """Statically count the rays a wavefront render *dispatches*: per
    dispatched closest-hit unit, one closest-hit ray + one shadow ray per
    point light (area lights add their stratified sample counts when soft
    shadows are on); MSAA/DoF multiply the primary grid.

    The per-pixel dispatch-unit count is feature-exact to the trace shapes
    in cge_tpu.render.wavefront:
      - chain modes: _unroll_depth scan levels;
      - TRANS+REC tree: 2^d - 1 branch dispatches plus 2^d tail chains of
        1 + extra_transparency_unroll levels each (d = ray_depth);
      - glossy: 1 primary dispatch, then rays_per_reflection fan-out rays
        scanned for ray_depth levels.
    """
    n = width * height
    if features.enable_multiple_rays_per_pixel:
        n *= params.rays_per_pixel_side ** 2
    if features.enable_depth_of_field:
        n += width * height * params.samples_dof
    shadow = 0
    if features.enable_hard_shadow or features.enable_soft_shadow:
        shadow += int(np.asarray(scene.point_mask).sum())
    if features.enable_soft_shadow:
        shadow += int(np.asarray(scene.seg_mask).sum()) * \
            params.segment_light_samples
        shadow += int(np.asarray(scene.par_mask).sum()) * \
            params.parallelogram_light_direction_samples ** 2

    from cge_tpu.render.wavefront import _unroll_depth
    if features.enable_recursive and features.enable_glossy_reflection:
        units = 1 + params.rays_per_reflection * params.ray_depth
    elif features.enable_recursive and features.enable_transparency:
        d = params.ray_depth
        extra = 0 if scene.all_opaque else params.extra_transparency_unroll
        if getattr(scene, "all_diffuse", False):
            # single-child chain (mirror children statically dead)
            units = d + (1 + extra)
        else:
            units = (2 ** d - 1) + 2 ** d * (1 + extra)
    else:
        units = _unroll_depth(scene, params, features)
    return n * (1 + shadow) * units


def timed_render(scene, camera, features, params, width, height, seed=0):
    """render_image + RenderStats (the reference's render-ms print,
    main.cpp:232-236, with rays/s)."""
    from cge_tpu.render.renderer import render_image

    t0 = time.perf_counter()
    img = np.asarray(render_image(scene, camera, features, params,
                                  width, height, seed))
    wall_ms = (time.perf_counter() - t0) * 1e3
    stats = RenderStats(
        wall_ms=wall_ms, width=width, height=height,
        primary_rays=width * height,
        total_rays=count_rays(width, height, scene, features, params))
    return img, stats


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope: view with TensorBoard / xprof.

    with profiling.trace('/tmp/jax-trace'):
        render_image(...)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# --- sweep roofline model (definitions FROZEN in PERF_r05.md so rounds
# compare; change them only with a paired PERF note) -----------------------
#
# VPU issue-slot count per (ray, triangle) pair of the dense tile actually
# emitted by cluster_sweep._cluster_kernel.dense (r4 hit-point formulation),
# counting each elementwise VPU instruction as ONE slot (an fma is one
# issue, a divide ~4):
#   dn 3 (mul + 2 fma) | on 3 | t = (D-on)/dn: 1 sub + ~4 div
#   p = o + t*d: 3 fma | 3 edge tests: 3x(3 fma + 1 cmp) = 12
#   inside &&: 2 | accept (2 cmp + 2 and): 4 | t select: 1
#   min-reduce + id max-reduce (amortized per pair over the sublane axis): 2
# total: 35 slots/pair.
SWEEP_SLOTS_PER_PAIR = 35.0
# flop accounting for the same tile (fma = 2 flops, cmp/select = 1): ~37.
SWEEP_FLOPS_PER_PAIR = 37.0
# one v5e core's peak VPU f32 issue slots/s — kept consistent with the
# peak_flops = 4e12 figure every prior round used (which counts fma as 2):
# slots = flops / 2. Frozen for cross-round comparability.
PEAK_VPU_SLOTS_PER_S = 2.0e12


def sweep_roofline(n_rays: int, n_tris: int, wall_s: float,
                   peak_flops: float = 2 * PEAK_VPU_SLOTS_PER_S) -> dict:
    """Roofline estimate for the intersection sweep's dense tile.

    Reports THREE rates (VERDICT r4 weak #3):
      - fraction_of_peak: achieved flops / peak f32 VPU flops. The
        denominator is UNREACHABLE for this compare/select-heavy mix by
        construction (non-fma slots can never count 2); kept only for
        cross-round continuity.
      - fraction_of_attainable: pairs/s vs the ATTAINABLE ceiling
        peak_slots / slots_per_pair — the rate the tile would run at if
        the VPU issued one of its instructions every slot cycle with zero
        overhead (no keys, sort, visit loop, DMA or launch cost). This is
        the honest headroom number.
      - pairs_per_s: the cross-round comparable throughput.
    """
    flops = SWEEP_FLOPS_PER_PAIR * n_rays * n_tris
    achieved = flops / wall_s if wall_s > 0 else 0.0
    pairs_per_s = n_rays * n_tris / wall_s if wall_s > 0 else 0.0
    attainable = PEAK_VPU_SLOTS_PER_S / SWEEP_SLOTS_PER_PAIR
    return dict(
        pair_tests=n_rays * n_tris,
        achieved_flops=achieved,
        fraction_of_peak=achieved / peak_flops,
        pairs_per_s=pairs_per_s,
        slots_per_pair=SWEEP_SLOTS_PER_PAIR,
        attainable_pairs_per_s=attainable,
        fraction_of_attainable=pairs_per_s / attainable,
    )


@dataclasses.dataclass
class BuildStats:
    """BVH/cluster build observability (the reference prints these at
    bounding_volume_hierarchy.cpp:192-193)."""

    build_ms: float
    num_levels: int
    num_leaves: int
    max_per_leaf: int

    def __str__(self) -> str:
        return (f"BVH generation took {self.build_ms:.0f} ms.\n"
                f"Max triangles per node is: {self.max_per_leaf}")


def timed_bvh_build(scene, sah_binning: bool = False):
    """build_reference_bvh + the reference's build prints."""
    from cge_tpu.ops.bvh import build_reference_bvh

    t0 = time.perf_counter()
    bvh = build_reference_bvh(scene, sah_binning=sah_binning)
    ms = (time.perf_counter() - t0) * 1e3
    return bvh, BuildStats(build_ms=ms, num_levels=bvh.num_levels,
                           num_leaves=bvh.num_leaves,
                           max_per_leaf=bvh.max_per_leaf)
