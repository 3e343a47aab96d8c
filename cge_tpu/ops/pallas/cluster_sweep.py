"""Pallas TPU kernel: cluster-culled closest-hit / any-hit sweep.

The TPU-native acceleration structure. Triangles are pre-permuted into
spatially-coherent clusters of CLUSTER_SIZE (cge_tpu.ops.bvh.build_clusters),
grouped into *superclusters* of SUPERCLUSTER consecutive clusters, and
traversal splits into stages that each play to an engine's strength:

  1. a vectorized key pass slab-tests every (ray block, supercluster) pair —
     massively parallel VPU work, no serial chains;
  2. an XLA argsort turns the keys into each block's front-to-back
     supercluster visit order (entry t of the nearest live ray);
  3. one grid program per ray block walks its order from SMEM: each visited
     supercluster's member clusters are re-culled per ray against the
     current best t, and survivors run a dense, divergence-free [C, BR] VPU
     intersection tile. The walk stops as soon as the next supercluster's
     entry key is behind every live ray's best t — a triangle's t is >= its
     cluster's entry t, so ordered visiting makes the stop exact, like a
     BVH's ordered traversal, while every tile that does run is dense SIMD
     work with rays on the lane axis.

Scale story: small scenes keep the whole packed tile stack VMEM-resident
(zero streaming); big scenes leave it in HBM packed FIELD-major per
cluster ([L, 16, C]: dense 128-lane rows, streamed bytes == useful bytes)
and double-buffer-DMA only *visited* superclusters, so scene size is
bounded by HBM and per-block work by the plausible set. The dense tile
un-transposes each visited cluster's [16, C] block in-register. (r4
lane-padded each triangle row to 128 instead — 8x the DMA bytes; Mosaic
rejects DMA into sub-128-lane VMEM blocks, which is what forced a padded
layout before the field-major repack.)

The 16 packed fields are plane + edge-plane constants (n, D, then
m_i = cross(n, edge_i), b_i = dot(m_i, v_i)): the reference's
pointInTriangle edge test dot(cross(edge_i, p - v_i), n) >= 0 equals
dot(m_i, p) - b_i >= 0 by the scalar-triple-product identity, and
p = o + t*d turns it into two dot products — no per-pair cross products.

Modes:
  - closest (default): reference accept rules (0 <= t <= budget), last
    accepted wins on exact ties *in visit order* — the same class of tie
    divergence as the reference's own BVH-on traversal
    (bounding_volume_hierarchy.cpp:312-362) vs its brute loop.
  - any_hit: occlusion query; a ray that accepts any triangle is marked done
    (best_t = DONE) and stops contributing to the stop bound. Used for
    shadow rays when the transparency feature is off (light.cpp:60-63 only
    needs *a* blocker then).
  - shared_origin: static promise that all rays share one origin (primary
    pinhole rays): hoists the o-dot products out of the pair loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cge_tpu.ops.bvh import CLUSTER_SIZE

DEFAULT_BR = 512
# clusters per supercluster: the visit/DMA granularity of the HBM-resident
# sweep. 4 measured best on the 1M-triangle scale scene (5.6 Mray/s vs 4.1
# at 8, vs 4.2 at 1): small enough that a visit's dense work stays in the
# plausible set, big enough to amortize the DMA issue overhead.
SUPERCLUSTER = 4
# compact tile stacks up to this size stay VMEM-resident (no per-visit DMA)
RESIDENT_TILE_BYTES = 4 * 1024 * 1024
FLT_MAX = 3.4028234663852886e38  # python float: jnp scalars would be captured consts
FLT_MIN = 1.1754943508222875e-38
_DONE = -3.0e38                  # any-hit sentinel: stops visiting for that ray

_INVALID_ROW = [0.0] * 4 + [0.0, 0.0, 0.0, 1.0] * 3   # b_i = 1 kills edges


def pack_cluster_tiles(vertices, tris, perm, hbm: bool | None = None):
    """Build the packed cluster constants inside jit.

    perm: [L, C] int32 triangle ids (-1 = pad). Returns:
      aabbs [L, 8] f32 — lanes 0:3 cluster AABB lower, 3:6 upper, 2 pad;
      tiles — per-triangle constants (nx, ny, nz, D, m0, b0, m1, b1, m2,
        b2 with m_i 3-wide): [L, C, 16] triangle-major for the
        VMEM-resident layout; [L, 16, C] FIELD-major (field k's row spans
        the cluster's C triangles on the lane axis — fully dense 128-lane
        rows, so streamed DMA bytes == useful bytes) when the stack will
        live in HBM. r4 lane-padded each triangle row to 128 instead,
        moving 8x the useful bytes per supercluster DMA (VERDICT r4); the
        dense tile un-transposes the field-major block in-register.
    Invalid (pad) triangles get all-zero constants with b_i = 1, which makes
    every edge test fail (s_i = -1 < 0) — no separate valid lane needed.

    hbm: force the layout; None picks by RESIDENT_TILE_BYTES.
    """
    L, C = perm.shape
    if hbm is None:
        hbm = L * C * 16 * 4 > RESIDENT_TILE_BYTES
    safe = jnp.maximum(perm, 0)
    tv = vertices[tris[safe]]                # [L, C, 3, 3]
    v0, v1, v2 = tv[:, :, 0], tv[:, :, 1], tv[:, :, 2]
    n = jnp.cross(v1 - v0, v2 - v0)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    D = jnp.sum(n * v0, axis=-1)
    valid = perm >= 0

    def edge_consts(va, vb):
        m = jnp.cross(n, vb - va)
        b = jnp.sum(m * va, axis=-1)
        return m, b

    m0, b0 = edge_consts(v0, v1)
    m1, b1 = edge_consts(v1, v2)
    m2, b2 = edge_consts(v2, v0)

    tri_rows = jnp.stack([
        n[..., 0], n[..., 1], n[..., 2], D,
        m0[..., 0], m0[..., 1], m0[..., 2], b0,
        m1[..., 0], m1[..., 1], m1[..., 2], b1,
        m2[..., 0], m2[..., 1], m2[..., 2], b2], axis=-1)   # [L, C, 16]
    inval = jnp.asarray(_INVALID_ROW, jnp.float32)
    tri_rows = jnp.where(valid[..., None], tri_rows, inval)
    if hbm:
        tri_rows = tri_rows.transpose(0, 2, 1)      # field-major [L, 16, C]

    # cluster AABBs over valid triangles; empty clusters land at +inf lower,
    # -inf upper (slab entry t = +inf => never visited, unions ignore them)
    big = jnp.where(valid[..., None, None], tv, jnp.inf)
    small = jnp.where(valid[..., None, None], tv, -jnp.inf)
    lo = big.min(axis=(1, 2))                          # [L, 3]
    hi = small.max(axis=(1, 2))
    aabbs = jnp.concatenate([lo, hi, jnp.zeros((L, 2))], axis=1)  # [L, 8]
    return aabbs.astype(jnp.float32), tri_rows.astype(jnp.float32)


def pad_cluster_stack(aabbs, tiles, padL):
    """Append padL EMPTY clusters to a packed stack (slab entry +inf so
    they are never visited; all-invalid triangle rows as belt-and-braces).
    Handles both tile layouts: triangle-major [L, C, 16] (VMEM-resident)
    and field-major [L, 16, C] (HBM/DMA)."""
    pad_box = jnp.concatenate([
        jnp.full((padL, 3), FLT_MAX, jnp.float32),
        jnp.full((padL, 3), -FLT_MAX, jnp.float32),
        jnp.zeros((padL, 2), jnp.float32)], axis=1)
    aabbs = jnp.concatenate([aabbs, pad_box], axis=0)
    inval = jnp.asarray(_INVALID_ROW, jnp.float32)
    if tiles.shape[2] == 16:                              # triangle-major
        pad_t = jnp.broadcast_to(inval, (padL,) + tiles.shape[1:])
    else:                                                 # field-major
        pad_t = jnp.broadcast_to(inval[:, None], (padL,) + tiles.shape[1:])
    tiles = jnp.concatenate([tiles, pad_t], axis=0)
    return aabbs, tiles


def _entry_slab(rays, lo_cols, hi_cols):
    """Per-(box, ray) slab entry t within budget: [S?, BR], inf = miss.

    rays: [8, BR] packed block; lo_cols/hi_cols: 3-tuples of [S?, 1]
    box-coordinate columns (S? broadcasts against the ray lanes).

    Inverted boxes (lo > hi on any axis — the lo=+inf/hi=-inf empty-cluster
    and pad encodings) are explicitly invalid: without the lo<=hi term the
    per-axis min/max swap would turn them into (-inf, +inf) slabs with entry
    key 0, making pad superclusters sort FIRST in every visit order and
    defeating the zero-visit early-out.
    """
    o = (rays[0:1], rays[1:2], rays[2:3])
    d = (rays[3:4], rays[4:5], rays[5:6])
    tm = rays[6:7]
    tnear, tfar = None, None
    box_ok = None
    for ax in range(3):
        nz = d[ax] != 0
        inv = jnp.where(nz, 1.0 / jnp.where(nz, d[ax], 1.0), 0.0)
        t1 = (lo_cols[ax] - o[ax]) * inv
        t2 = (hi_cols[ax] - o[ax]) * inv
        t1 = jnp.where(nz, t1, -FLT_MAX)    # zero-dir: conservative pass
        t2 = jnp.where(nz, t2, FLT_MAX)
        a, b = jnp.minimum(t1, t2), jnp.maximum(t1, t2)
        tnear = a if tnear is None else jnp.maximum(tnear, a)
        tfar = b if tfar is None else jnp.minimum(tfar, b)
        ok = lo_cols[ax] <= hi_cols[ax]
        box_ok = ok if box_ok is None else (box_ok & ok)
    live = tm >= 0
    geo = (tnear <= tfar) & (tfar >= 0) & live & (tnear <= tm) & box_ok
    return jnp.where(geo, jnp.maximum(tnear, 0.0), jnp.inf)


def _keys_kernel(ray_ref, aabb_ref, keys_ref):
    """Key pass: per-block box entry keys [S, 1] (min over the block's
    rays). Pure vectorized VPU work; the [S, BR] intermediate lives in
    VMEM, never HBM. All-dead blocks (every tmax < 0 — bounce levels after
    ray sorting bunch them together) skip the slab math entirely."""
    rays = ray_ref[0]
    keys_ref[0] = jnp.full_like(keys_ref[0], jnp.inf)

    @pl.when(jnp.any(rays[6] >= 0))
    def _():
        lo = tuple(aabb_ref[:, k:k + 1] for k in range(3))
        hi = tuple(aabb_ref[:, 3 + k:4 + k] for k in range(3))
        entry = _entry_slab(rays, lo, hi)                  # [S, BR]
        keys_ref[0] = jnp.min(entry, axis=1, keepdims=True)


def _block_frustum_keys(rays, aabbs):
    """Per-block CONSERVATIVE box entry keys [NB, S] via interval
    arithmetic — the cheap replacement for the exact per-ray key pass.

    Each ray block is summarized by interval hulls of its origins and
    directions (the 32x16 tile swizzle keeps both tight); the slab test then
    runs once per (block, box) pair instead of once per (ray, box) pair —
    ~BR x less work. The returned key is a true LOWER bound on every live
    ray's clipped entry t, so the kernel's ordered early stop stays exact
    (a lower bound can only delay the stop, never skip work that matters);
    visit order is approximate front-to-back.

    rays: [NB, 8, BR]; aabbs: [S, 8]. inf = provably no live ray can enter.
    """
    o = rays[:, 0:3, :]                                    # [NB, 3, BR]
    d = rays[:, 3:6, :]
    tm = rays[:, 6, :]                                     # [NB, BR]
    live = tm >= 0
    lv = live[:, None, :]
    ol = jnp.min(jnp.where(lv, o, jnp.inf), axis=-1)       # [NB, 3]
    oh = jnp.max(jnp.where(lv, o, -jnp.inf), axis=-1)
    dl = jnp.min(jnp.where(lv, d, jnp.inf), axis=-1)
    dh = jnp.max(jnp.where(lv, d, -jnp.inf), axis=-1)
    tmx = jnp.max(jnp.where(live, tm, -jnp.inf), axis=-1)  # [NB]
    any_live = jnp.any(live, axis=-1)

    blo = aabbs[:, 0:3]                                    # [S, 3]
    bhi = aabbs[:, 3:6]
    box_ok = jnp.all(blo <= bhi, axis=-1)                  # [S]

    tnear_lb, tfar_ub = None, None
    for ax in range(3):
        bl = blo[None, :, ax]                              # [1, S]
        bh = bhi[None, :, ax]
        o0 = ol[:, None, ax]                               # [NB, 1]
        o1 = oh[:, None, ax]
        d0 = dl[:, None, ax]
        d1 = dh[:, None, ax]
        # numerator intervals for the two slab planes
        n1a, n1b = bl - o1, bl - o0                        # (blo - o)
        n2a, n2b = bh - o1, bh - o0                        # (bhi - o)
        # interval division candidates. When the d interval spans 0, t(d) is
        # still monotone on each sign side, so endpoint divisions bound the
        # finite extrema — exact-zero endpoints are nudged to +/-FLT_MIN
        # (huge, conservative candidates).
        spans0 = (d0 <= 0) & (d1 >= 0)
        safe0 = jnp.where(d0 != 0, d0, -FLT_MIN)
        safe1 = jnp.where(d1 != 0, d1, FLT_MIN)
        cands = [n1a / safe0, n1a / safe1, n1b / safe0, n1b / safe1,
                 n2a / safe0, n2a / safe1, n2b / safe0, n2b / safe1]
        lo_ax = cands[0]
        hi_ax = cands[0]
        for c in cands[1:]:
            lo_ax = jnp.minimum(lo_ax, c)
            hi_ax = jnp.maximum(hi_ax, c)
        # d spanning 0 with an origin possibly INSIDE the slab: a
        # near-parallel inside ray enters at -inf — conservative pass. An
        # origin strictly outside keeps the finite endpoint bound (t -> +inf
        # as d -> 0 there, which never lowers the min). The exit bound stays
        # +FLT_MAX either way (near-parallel rays exit arbitrarily late,
        # and the kernel's exact-zero-dir quirk passes the slab outright).
        o_in_slab = (o1 >= bl) & (o0 <= bh)
        lo_ax = jnp.where(spans0 & o_in_slab, -FLT_MAX, lo_ax)
        hi_ax = jnp.where(spans0, FLT_MAX, hi_ax)
        tnear_lb = lo_ax if tnear_lb is None else jnp.maximum(tnear_lb, lo_ax)
        tfar_ub = hi_ax if tfar_ub is None else jnp.minimum(tfar_ub, hi_ax)

    maybe = ((tnear_lb <= tfar_ub) & (tfar_ub >= 0)
             & (tnear_lb <= tmx[:, None]) & any_live[:, None]
             & box_ok[None, :])
    return jnp.where(maybe, jnp.maximum(tnear_lb, 0.0), jnp.inf)


def _block_entry_keys(rays, aabbs, interpret=False, box_chunk=1024):
    """Per-block box entry keys [NB, S]. rays: [NB, 8, BR]; aabbs: [S, 8].

    The box axis is chunked so the [chunk, BR] slab intermediate stays well
    under the VMEM scoped limit for scenes with many boxes."""
    NB = rays.shape[0]
    S = aabbs.shape[0]
    KC = min(box_chunk, S)
    KG = -(-S // KC)
    pad = KG * KC - S
    if pad:
        pad_row = jnp.concatenate([
            jnp.full((pad, 3), FLT_MAX, jnp.float32),
            jnp.full((pad, 3), -FLT_MAX, jnp.float32),
            jnp.zeros((pad, 2), jnp.float32)], axis=1)
        aabbs = jnp.concatenate([aabbs, pad_row], axis=0)
    keys = pl.pallas_call(
        _keys_kernel,
        grid=(NB, KG),
        in_specs=[
            pl.BlockSpec((1, 8, rays.shape[2]), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KC, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KC, 1), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, KG * KC, 1), jnp.float32),
        interpret=interpret,
    )(rays, aabbs)
    return keys[:, :S, 0]


def _cluster_kernel(order_ref, skey_ref, ray_ref, aabb_ref, tile_ref,
                    best_t_ref, best_i_ref, buf_ref, sem_ref, *,
                    c, sc_n, n_sc, any_hit, shared_origin, resident,
                    refine_members, mxu=False):
    rays = ray_ref[0]                                 # [8, BR]
    o_x, o_y, o_z = rays[0:1], rays[1:2], rays[2:3]   # [1, BR]
    d_x, d_y, d_z = rays[3:4], rays[4:5], rays[5:6]
    tm = rays[6:7]
    # row 7: per-ray exit t from the scene's union AABB (computed by the
    # wrapper). Any hit satisfies t <= exit (every cluster lies inside the
    # union box), so the ordered-stop bound min(best, tm) tightens EXACTLY
    # to min(best, tm, exit). Decisive for divergent bounce batches: a live
    # ray that misses everything used to pin its block's need at +inf and
    # force visiting every frustum-touching cluster; now it contributes
    # only its (typically small) exit t. -inf = provably misses the scene.
    ex = rays[7:8]
    tm_eff = jnp.minimum(tm, ex)
    live = tm >= 0
    BR = rays.shape[1]

    if mxu:
        # ray-side matrix for the MXU contraction, built ONCE per block:
        # columns 0:BR are o_ext = (ox, oy, oz, -1, 0...), columns BR:2BR
        # are d_ext = (dx, dy, dz, 0, 0...). One dot with the [4C, 8]
        # quantity-major tile then yields all eight per-pair dot products.
        zero = jnp.zeros((1, BR), jnp.float32)
        o_ext = jnp.concatenate(
            [o_x, o_y, o_z, jnp.full((1, BR), -1.0, jnp.float32),
             zero, zero, zero, zero], axis=0)          # [8, BR]
        d_ext = jnp.concatenate(
            [d_x, d_y, d_z, zero, zero, zero, zero, zero], axis=0)
        ray_ext = jnp.concatenate([o_ext, d_ext], axis=1)   # [8, 2BR]

    def _accept(t, inside, base, prev_t, prev_i):
        """Shared accept/selection tail of a dense tile (both layouts)."""
        ok = (t >= 0) & (t <= tm) & inside
        if any_hit:
            hit = jnp.any(ok, axis=0, keepdims=True)          # [1, BR]
            new_t = jnp.where(hit, _DONE, prev_t)
            new_i = jnp.where(hit, 1, prev_i)
        else:
            t = jnp.where(ok, t, jnp.inf)
            tmin = jnp.min(t, axis=0, keepdims=True)          # [1, BR]
            flat = base.astype(jnp.float32) + jax.lax.broadcasted_iota(
                jnp.int32, (c, 1), 0).astype(jnp.float32)
            idx = jnp.max(jnp.where(t == tmin, flat, -1.0),
                          axis=0, keepdims=True).astype(jnp.int32)
            take = (tmin <= prev_t) & jnp.isfinite(tmin)
            new_t = jnp.where(take, tmin, prev_t)
            new_i = jnp.where(take, idx, prev_i)
        return new_t, new_i

    def dense_mxu(cl, base, prev_t, prev_i):
        """MXU variant of the dense tile (resident stack only): the eight
        per-(tri, ray) dot products are one [4C, 8] x [8, 2BR] contraction
        (rows grouped quantity-major: n, m0, m1, m2), leaving the VPU only
        the divide, three edge FMAs and the accept/min logic. Invalid pad
        rows are all-zero with b = 1, so Eo = -1, dn = dm = 0 and
        t = -0/0 = NaN -> every accept test fails, as in the VPU tile.

        MEASURED (r4, tools/tune_mxu.py, teapot-512 swizzled rays, v5e):
        full parity (hit/id match 1.0, max t err 1.1e-5) but 1.7x SLOWER
        than the VPU tile with exact keys (5.86 vs 3.46 ms) and 2.4x with
        frustum keys. The contraction depth K=8 runs the MXU at 6% depth
        utilization, and f32 ray t's need Precision.HIGHEST (multi-pass);
        the VPU's 8-dot formulation is dense f32 at full lane occupancy.
        VPU-bound IS the right operating point at C=128/BR=512 — kept as
        an opt-in flag so the experiment stays reproducible."""
        A = tile_ref[pl.ds(cl, 1), :, :][0]           # [4C, 8]
        out = jnp.dot(A, ray_ext, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)   # [4C, 2BR]
        onD = out[0:c, 0:BR]                          # o.n - D
        dn = out[0:c, BR:]
        t = -onD / dn
        inside = None
        for k in range(3):
            eo = out[(k + 1) * c:(k + 2) * c, 0:BR]   # o.m_k - b_k
            dm = out[(k + 1) * c:(k + 2) * c, BR:]
            e_ok = eo + t * dm >= 0
            inside = e_ok if inside is None else (inside & e_ok)
        return _accept(t, inside, base, prev_t, prev_i)

    def dense(cl, m, slot, base, prev_t, prev_i):
        """One [C, BR] intersection tile against cluster `cl`'s constants
        (VMEM-resident stack, or DMA buffer slot when the stack is HBM).
        best-so-far flows through the visit loop's CARRY — no ref
        round-trips per tile (measured ~15% kernel time in r3: every tile
        broadcast-wrote two (8, BR) blocks and re-read them)."""
        if resident:
            tri = tile_ref[pl.ds(cl, 1), :, :][0]     # [C, 16]
        else:
            # the DMA block is FIELD-major [16, C] (dense 128-lane rows;
            # streamed bytes == useful bytes) — one in-register transpose
            # per visited cluster recovers the triangle-major [C, 16]
            # orientation the tile math broadcasts from
            tri = buf_ref[slot, m].T

        def col(k):
            return tri[:, k:k + 1]                    # [C, 1]

        nx, ny, nz, D = col(0), col(1), col(2), col(3)
        dn = d_x * nx + d_y * ny + d_z * nz           # [C, BR]
        if shared_origin:
            ox, oy, oz = o_x[0:1, 0:1], o_y[0:1, 0:1], o_z[0:1, 0:1]
        else:
            ox, oy, oz = o_x, o_y, o_z
        on = ox * nx + oy * ny + oz * nz              # [C, BR] or [C, 1]
        t = (D - on) / dn
        # hit point once (3 fmas), then each edge test m.p - b >= 0 is 3
        # fmas + a compare — vs the two-dot form (o.m - b) + t*(d.m) at ~12
        # ops/edge. Algebraically identical (p = o + t*d distributes), ~40%
        # fewer VPU ops per pair (the tile is op-count-bound; PERF_r04.md).
        # Pad rows (m = 0, b = 1) give e = -1 < 0; dn = 0 rows give
        # t = +-inf/NaN whose comparisons are false — both still rejected.
        # Always the [1, BR] origin rows here (not the [1, 1] shared-origin
        # hoist): Mosaic cannot broadcast along sublanes AND lanes at once.
        px = o_x + t * d_x                            # [C, BR]
        py = o_y + t * d_y
        pz = o_z + t * d_z

        def edge_ok(k):
            mx, my, mz, b = col(4 * k + 4), col(4 * k + 5), \
                col(4 * k + 6), col(4 * k + 7)
            return (px * mx - b) + py * my + pz * mz >= 0

        inside = edge_ok(0) & edge_ok(1) & edge_ok(2)
        return _accept(t, inside, base, prev_t, prev_i)

    def member_entry(cl):
        """Refined per-ray slab entry for ONE cluster: [1, BR]."""
        box = aabb_ref[pl.ds(cl, 1), :]               # [1, 8]
        lo = tuple(box[:, k:k + 1] for k in range(3))
        hi = tuple(box[:, 3 + k:4 + k] for k in range(3))
        return _entry_slab(rays, lo, hi)

    def past(key, need):
        # no remaining supercluster can help: next key behind every live
        # ray's need, or +inf (= no live ray enters it; inf > inf is False,
        # so the finiteness test is load-bearing for blocks of
        # unbounded-budget rays that miss everything)
        return jnp.logical_or(key > need, key >= FLT_MAX)

    def get_dma(slot, step):
        """DMA of visit `step`'s supercluster tiles into buffer `slot`."""
        sc = order_ref[0, 0, step]
        return pltpu.make_async_copy(
            tile_ref.at[pl.ds(sc * sc_n, sc_n)], buf_ref.at[slot],
            sem_ref.at[slot])

    def cond(carry):
        step, stop = carry[0], carry[1]
        return jnp.logical_and(step < n_sc, jnp.logical_not(stop))

    def visit(carry):
        step, _, bt, bi = carry
        sc = order_ref[0, 0, step]
        slot = jax.lax.rem(step, 2)
        if not resident:
            # invariant: this visit's DMA was started by the previous
            # iteration (or the warm-up), so only a wait remains here
            get_dma(slot, step).wait()
        for m in range(sc_n):
            cl = sc * sc_n + m
            if mxu:
                bt, bi = dense_mxu(cl, cl * c, bt, bi)
            elif refine_members:
                # per-cluster re-cull against the current best before the
                # dense tile — pays off when member tiles are often skipped
                # (big scenes); for small resident stacks the extra
                # reductions/branches cost more than the skipped tiles
                entry = member_entry(cl)
                bt, bi = jax.lax.cond(
                    jnp.any(entry <= bt),
                    lambda bt=bt, bi=bi, m=m, cl=cl: dense(
                        cl, m, slot, cl * c, bt, bi),
                    lambda bt=bt, bi=bi: (bt, bi))
            else:
                bt, bi = dense(cl, m, slot, cl * c, bt, bi)
        step = step + 1
        need = jnp.max(jnp.where(live, jnp.minimum(bt, tm_eff), -jnp.inf))
        stop = jnp.logical_or(
            step >= n_sc,
            past(skey_ref[0, 0, jnp.minimum(step, n_sc - 1)], need))
        if not resident:
            # prefetch the next visit's tiles; started iff the loop
            # continues, so no DMA is ever left dangling at exit
            @pl.when(jnp.logical_not(stop))
            def _():
                get_dma(jax.lax.rem(step, 2),
                        jnp.minimum(step, n_sc - 1)).start()
        return step, stop, bt, bi

    # first-key guard: an all-dead / no-overlap block does zero visits
    need0 = jnp.max(jnp.where(live, tm_eff, -jnp.inf))
    stop0 = past(skey_ref[0, 0, 0], need0)
    if not resident:
        @pl.when(jnp.logical_not(stop0))
        def _():
            get_dma(0, 0).start()
    steps, _, bt, bi = jax.lax.while_loop(
        cond, visit, (jnp.int32(0), stop0,
                      jnp.full((1, BR), jnp.inf, jnp.float32),
                      jnp.full((1, BR), -1, jnp.int32)))
    best_t_ref[0] = jnp.broadcast_to(bt, best_t_ref.shape[1:])
    best_i_ref[0] = jnp.broadcast_to(bi, best_i_ref.shape[1:])
    # stash the block's visit count in (unused) row 1 of the index output:
    # exact dense-tile work for the resident path (refine_members off), an
    # upper bound for the HBM path — the roofline accounting in bench.py
    best_i_ref[0, 1:2, :] = jnp.broadcast_to(
        steps, (1, best_i_ref.shape[2]))


@functools.partial(jax.jit, static_argnames=("br", "sc_n", "any_hit",
                                             "shared_origin", "interpret",
                                             "with_stats", "refine_members",
                                             "exact_keys", "perm_ids",
                                             "mxu"))
def pallas_cluster_tris(o, d, tmax, aabbs, tiles, perm, br=DEFAULT_BR,
                        sc_n=None, any_hit=False,
                        shared_origin=False, interpret=False,
                        with_stats=False, refine_members=None,
                        exact_keys=True, perm_ids=False, mxu=None):
    """Cluster-accelerated triangle sweep.

    o, d: [R, 3]; tmax: [R] per-ray budget (-1 = dead ray);
    aabbs [L, 8], tiles: from pack_cluster_tiles — triangle-major
    [L, C, 16] selects VMEM-resident traversal, field-major [L, 16, C]
    selects HBM+DMA streaming; perm: [L, C].

    closest mode: returns (best_t [R], best_idx [R] — *scene* triangle ids,
    -1 on miss).  any_hit mode: returns (hit [R] bool, hit [R] bool) — no
    meaningful t.  with_stats appends a third result: per-ray-block
    supercluster visit counts [NB] i32 (dense work actually executed —
    exact on the resident path, an upper bound with refine_members).

    perm_ids=True returns best_idx in *cluster-permuted* space (the flat
    [L*C] slot, -1 on miss) instead of scene triangle ids: the 1-D
    perm-table gather that translates to scene space costs ~100us per
    launch on TPU (scalar-indexed rows), so hot render paths skip it and
    gather attributes from tables pre-permuted with the same perm
    (cge_tpu.render.wavefront.pack_attr_table(tri_ids=...)).
    """
    R = o.shape[0]
    L = tiles.shape[0]
    resident = tiles.shape[2] == 16          # triangle-major [L, C, 16]
    C = tiles.shape[1] if resident else tiles.shape[2]
    assert C == perm.shape[1], (tiles.shape, perm.shape)
    if mxu is None:
        mxu = False       # pending measurement; see tools/tune_mxu.py
    mxu = mxu and resident and not interpret
    if refine_members is None:
        # per-member re-culling loses on BOTH layouts (1M-tri scale scene:
        # 5.6 Mray/s off vs 4.9 on at sc_n=4): the extra per-cluster slab
        # reductions and branches cost more than the dense tiles they skip,
        # because the supercluster key already culled the easy misses
        refine_members = False
    if sc_n is None:
        # resident stacks visit per cluster (finest ordering, no wasted
        # dense tiles); HBM stacks amortize the DMA over SUPERCLUSTER tiles
        sc_n = 1 if resident else SUPERCLUSTER
    n_sc = -(-L // sc_n)
    padL = n_sc * sc_n - L
    if padL:
        aabbs, tiles = pad_cluster_stack(aabbs, tiles, padL)
    Lp = n_sc * sc_n

    # supercluster AABBs: union of member boxes (empty members are
    # lo=+inf/hi=-inf and vanish in the min/max)
    sc_lo = aabbs[:, 0:3].reshape(n_sc, sc_n, 3).min(axis=1)
    sc_hi = aabbs[:, 3:6].reshape(n_sc, sc_n, 3).max(axis=1)
    sc_aabbs = jnp.concatenate(
        [sc_lo, sc_hi, jnp.zeros((n_sc, 2), jnp.float32)], axis=1)

    Rp = -(-R // br) * br

    def pad_r(x, fill=0.0):
        return jnp.pad(x, (0, Rp - R), constant_values=fill)

    # per-ray exit t from the scene's union AABB (see the kernel's row-7
    # comment): slab test with the prebuilt lib's zero-direction quirk
    # (a zero component passes the slab outright — conservative here, the
    # exit merely stays large). Empty/pad cluster rows are lo=+inf/hi=-inf
    # and vanish in the union min/max.
    u_lo = jnp.min(aabbs[:, 0:3], axis=0)                     # [3]
    u_hi = jnp.max(aabbs[:, 3:6], axis=0)
    nz = d != 0
    inv_d = jnp.where(nz, 1.0 / jnp.where(nz, d, 1.0), 0.0)
    t1 = (u_lo[None, :] - o) * inv_d
    t2 = (u_hi[None, :] - o) * inv_d
    t1 = jnp.where(nz, t1, -FLT_MAX)
    t2 = jnp.where(nz, t2, FLT_MAX)
    tnear_s = jnp.max(jnp.minimum(t1, t2), axis=1)            # [R]
    tfar_s = jnp.min(jnp.maximum(t1, t2), axis=1)
    # small relative inflation: boundary triangles lie ON the union box, and
    # the slab division can round exit an ulp below the triangle t computed
    # via the plane equation — stay conservative, keep the bound exact.
    # The validity test carries the same tolerance (ADVICE r4): a ray
    # grazing an edge/corner of the union box while hitting a boundary
    # triangle can get a rounding-INVERTED slab interval, and without the
    # epsilon its exit would be -inf — letting its block early-stop past
    # the cluster holding the real hit.
    exit_pad = jnp.abs(tfar_s) * 1e-4 + 1e-6
    exit_t = jnp.where((tnear_s <= tfar_s + exit_pad) & (tfar_s >= -exit_pad),
                       tfar_s + exit_pad, -jnp.inf)

    rays = jnp.stack([
        pad_r(o[:, 0]), pad_r(o[:, 1]), pad_r(o[:, 2]),
        pad_r(d[:, 0]), pad_r(d[:, 1]), pad_r(d[:, 2]),
        pad_r(tmax, -1.0), pad_r(exit_t, -FLT_MAX)], axis=0)
    rays = rays.reshape(8, Rp // br, br).transpose(1, 0, 2)   # [NB, 8, BR]

    n_ray_blocks = Rp // br
    # per-block front-to-back supercluster visit order ([NB, 1, S] so the
    # (1, 1, S) SMEM block equals the array's trailing dims). Default: the
    # O(NB*S) conservative frustum key pass; exact_keys selects the
    # O(NB*S*BR) per-ray pass (tightest possible order + earliest stop —
    # only worth it when visits, not keys, dominate).
    if exact_keys:
        keys = _block_entry_keys(rays, sc_aabbs, interpret)   # [NB, S]
    else:
        keys = _block_frustum_keys(rays, sc_aabbs)            # [NB, S]
    # one sort carrying the iota: argsort + take_along_axis would add a
    # scalar-indexed gather (~30us per sweep on TPU, measured)
    iota = jnp.broadcast_to(
        jnp.arange(n_sc, dtype=jnp.int32)[None, :], keys.shape)
    skeys, order = jax.lax.sort((keys, iota), num_keys=1, dimension=-1)
    order = order[:, None, :]
    skeys = skeys[:, None, :]

    if mxu:
        # quantity-major MXU layout [Lp, 4C, 8]: rows [0:C] = (n | D),
        # [C:2C] = (m0 | b0), ..., K zero-padded from 4 to the 8-lane tile
        tiles = jnp.pad(
            tiles.reshape(Lp, C, 4, 4).transpose(0, 2, 1, 3)
            .reshape(Lp, 4 * C, 4), ((0, 0), (0, 0), (0, 4)))
        tile_spec = pl.BlockSpec((Lp, 4 * C, 8), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    elif resident:
        tile_spec = pl.BlockSpec((Lp, C, 16), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        tile_spec = pl.BlockSpec(memory_space=pl.ANY)

    best_t, best_i = pl.pallas_call(
        functools.partial(_cluster_kernel, c=C, sc_n=sc_n, n_sc=n_sc,
                          any_hit=any_hit, shared_origin=shared_origin,
                          resident=resident, refine_members=refine_members,
                          mxu=mxu),
        grid=(n_ray_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, n_sc), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_sc), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, br), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, 8, br), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, br), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_ray_blocks, 8, br), jnp.float32),
            jax.ShapeDtypeStruct((n_ray_blocks, 8, br), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, 1, 8, 128) if resident else (2, sc_n, 16, C),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # expected work, not worst case: the ordered early stop leaves each
        # block ~2-4 dense visits on real scenes (bench.py visit counters),
        # and per visited pair the VPU tile runs ~55 flops (8 dots + accept
        # logic) while the MXU tile runs a 128-flop contraction + ~13 VPU
        # flops. Far below the n_sc * C worst case a naive bound would give.
        cost_estimate=pl.CostEstimate(
            flops=(n_ray_blocks * min(n_sc, 4) * sc_n * C * br
                   * (141 if mxu else 55)),
            bytes_accessed=(Rp * 8 + Lp * C * 16 + Lp * 8) * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(order, skeys, rays, aabbs, tiles)
    visits = best_i[:, 1, 0]                       # [NB] per-block visit count
    best_t = best_t[:, 0, :].reshape(-1)[:R]
    flat = best_i[:, 0, :].reshape(-1)[:R]
    if any_hit:
        hit = flat > 0
        return (hit, hit, visits) if with_stats else (hit, hit)
    if perm_ids:
        return (best_t, flat, visits) if with_stats else (best_t, flat)
    scene_ids = jnp.where(flat >= 0, perm.reshape(-1)[jnp.maximum(flat, 0)],
                          -1)
    return (best_t, scene_ids, visits) if with_stats else (best_t, scene_ids)
