"""The wavefront trace core.

The reference renders each pixel with a recursive `recursiveRayTrace`
(/root/reference/src/render.cpp:27-150). Every deterministic path of that
recursion is *affine* in the child ray's radiance:

    result = A * local + B * child_radiance

with per-ray scalar coefficients A, B determined by the feature flags and
the hit material (see the derivation in the docstrings below, citing each
reference branch). We therefore evaluate the whole bounce recursion as an
iterative wavefront loop carrying (origin, direction, weight, accumulator)
for the entire ray batch — the TPU-native replacement for per-pixel
recursion + OpenMP scanlines (render.cpp:277-280).

The only non-chain shapes are:
  - transparency + recursion both enabled (two distinct children per
    bounce: the mirror and the straight-through continuation) — folded
    into the ray batch axis, one level per dispatch (see
    trace_tree_trans_recursive);
  - glossy reflections (a cone of stochastic children, render.cpp:56-99) —
    handled by sampled fan-out.

Quirks replicated (SURVEY.md §2.5):
  #5 with enableRecursive and glossy off, the mirror contribution is added
     twice per bounce (render.cpp:100 and 118);
  #6 the transparency blend paths and their epsilons;
  the t != 1 early-return path (render.cpp:122-130) runs regardless of the
     transparency *feature* flag and recurses past depth 0 (no depth gate on
     line 123) — bounded here by params.extra_transparency_unroll.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cge_tpu.ops.intersect import (Accel, HitIds, _on_tpu, build_accel,
                                   closest_hit_chunked, triangle_plane,
                                   uses_cluster_sweep)
from cge_tpu.ops.interpolate import (barycentric_coord, interpolate_normal,
                                     interpolate_texcoord)
from cge_tpu.ops.shading import compute_reflection_ray
from cge_tpu.ops.texture import acquire_texel
from cge_tpu.render.lights import light_contribution

_sg = jax.lax.stop_gradient


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v):
    # grad-safe at |v| = 0 (zero-sentinel mirror children): the guard must
    # sit INSIDE the sqrt — see cge_tpu.ops.shading._normalize
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    pos = n2 > 0
    return jnp.where(pos, v / jnp.sqrt(jnp.where(pos, n2, 1.0)), 0.0)


class HitAttrs(NamedTuple):
    """Differentiable per-ray hit attributes (the reference's HitInfo +
    material fill, bounding_volume_hierarchy.cpp:369-424)."""

    hit: jax.Array          # [N] bool
    t: jax.Array            # [N] f32 — recomputed differentiably
    normal: jax.Array       # [N,3]
    kd: jax.Array           # [N,3] (texture-substituted if enabled)
    ks: jax.Array           # [N,3]
    shininess: jax.Array    # [N]
    transparency: jax.Array  # [N]


# packed attribute-table layout (pack_attr_table): one [T, 40] row per
# triangle so hit_attributes does ONE gather per ray instead of ~11
# (measured 4x faster per bounce level on TPU — gathers dominate a level).
# lanes: 0:9 v0 v1 v2 | 9:18 n0 n1 n2 | 18:24 kd ks | 24 shininess |
# 25 transparency | 26:32 uv0 uv1 uv2 | 32 tex_id (as f32) | 33:40 pad
_ATTR_W = 40


def pack_attr_table(scene, tri_ids=None):
    """Build the per-triangle attribute rows [T, 40] (differentiable: the
    gathers here scatter-add gradients back to vertices/normals/uvs/
    materials in reverse mode — built once per trace, reused by every
    bounce level).

    tri_ids: optional [K] int32 triangle ids to build the table in a
    different order (the cluster permutation's flat [L*C] slots, -1 pads
    allowed) — hot paths then consume the sweep kernel's perm-space hit ids
    directly, skipping a ~100us/launch scalar id-translation gather."""
    T = scene.tris
    V = scene.vertices
    Nr = scene.normals
    UV = scene.uvs
    mid = scene.tri_mat
    if tri_ids is not None:
        safe = jnp.maximum(tri_ids.reshape(-1), 0)
        T = T[safe]
        mid = mid[safe]
    cols = [V[T[:, 0]], V[T[:, 1]], V[T[:, 2]],
            Nr[T[:, 0]], Nr[T[:, 1]], Nr[T[:, 2]],
            scene.mat_kd[mid], scene.mat_ks[mid],
            scene.mat_shininess[mid][:, None],
            scene.mat_transparency[mid][:, None],
            UV[T[:, 0]], UV[T[:, 1]], UV[T[:, 2]],
            scene.mat_tex[mid][:, None].astype(jnp.float32)]
    rows = jnp.concatenate(cols, axis=1)
    return jnp.pad(rows, ((0, 0), (0, _ATTR_W - rows.shape[1])))


def hit_attributes(scene, o, d, ids: HitIds, features,
                   attr_rows=None) -> HitAttrs:
    """Gather + recompute hit attributes from discrete hit ids.

    The discrete selection (which primitive) carries stop_gradient; the
    continuous quantities (t, barycentrics, normals, texcoords) are
    recomputed from scene parameters so gradients flow to vertices,
    materials, lights and texels. attr_rows: prebuilt pack_attr_table
    rows (one gather per ray); built here when not supplied.
    """
    prim = _sg(ids.prim)
    is_sphere = _sg(ids.is_sphere)
    hit = _sg(ids.hit)

    # --- triangle branch: one packed row gather
    if attr_rows is None:
        attr_rows = pack_attr_table(scene)
    row = attr_rows[prim]                        # [N, 40]
    v0, v1, v2 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
    n_geo_raw, D = triangle_plane(v0, v1, v2)
    denom = _dot(d, n_geo_raw)
    denom = jnp.where(jnp.abs(denom) > 0, denom, 1.0)     # NaN-safe for grads
    t_tri = (D - _dot(o, n_geo_raw)) / denom

    # --- sphere branch (normal = p - center, bvh cpp:400-403)
    ctr = scene.sph_center[prim]
    rad = scene.sph_radius[prim]
    oc = o - ctr
    b = 2.0 * _dot(d, oc)
    c = _dot(oc, oc) - rad * rad
    disc = b * b - 4.0 * c
    # double-where: sqrt only sees strictly positive values so its backward
    # never yields 0/0 NaN for the (masked-out) non-sphere rays
    disc_pos = disc > 0
    sq = jnp.where(disc_pos, jnp.sqrt(jnp.where(disc_pos, disc, 1.0)), 0.0)
    t0 = (-b - sq) / 2.0
    t1 = (-b + sq) / 2.0
    t_sph = jnp.where(_sg(t0) >= 0, t0, t1)

    t = jnp.where(is_sphere, t_sph, t_tri)
    t = jnp.where(hit, t, 0.0)
    p = o + t[:, None] * d

    # --- normal fill (bounding_volume_hierarchy.cpp:369-404)
    if features.enable_normal_interp:
        bary = barycentric_coord(v0, v1, v2, p)
        n0, n1, n2 = row[:, 9:12], row[:, 12:15], row[:, 15:18]
        n_i = interpolate_normal(n0, n1, n2, bary)
        flip = _dot(n_i, d) > 0
        n_tri = jnp.where(flip[:, None], -n_i, n_i)       # flip quirk (383-387)
    else:
        u1 = v1 - v0
        u2 = v2 - v0
        n_tri = _normalize(jnp.cross(u1, u2))             # geometric, unflipped
    n_sph = _normalize(p - ctr)
    normal = jnp.where(is_sphere[:, None], n_sph, n_tri)

    # --- material fill (bvh cpp:407-424): triangles read the packed row;
    # spheres (few) override via their own material gathers
    sph_mid = scene.sph_mat[prim]
    kd = jnp.where(is_sphere[:, None], scene.mat_kd[sph_mid], row[:, 18:21])
    ks = jnp.where(is_sphere[:, None], scene.mat_ks[sph_mid], row[:, 21:24])
    shininess = jnp.where(is_sphere, scene.mat_shininess[sph_mid],
                          row[:, 24])
    transparency = jnp.where(is_sphere, scene.mat_transparency[sph_mid],
                             row[:, 25])

    if features.enable_texture_mapping:
        tex_id = jnp.where(is_sphere, scene.mat_tex[sph_mid],
                           _sg(row[:, 32]).astype(jnp.int32))
        bary_t = barycentric_coord(v0, v1, v2, p)
        uv0, uv1, uv2 = row[:, 26:28], row[:, 28:30], row[:, 30:32]
        uv = interpolate_texcoord(uv0, uv1, uv2, bary_t)
        texel = acquire_texel(scene.textures, scene.tex_hw, tex_id, uv,
                              features.enable_bilinear_texture_filtering)
        use_tex = (tex_id >= 0) & (~is_sphere)
        kd = jnp.where(use_tex[:, None], texel, kd)

    return HitAttrs(hit=hit, t=t, normal=normal, kd=kd, ks=ks,
                    shininess=shininess, transparency=transparency)


def _intersect_and_shade(scene, o, d, features, params, key,
                         alive=None, accel: Accel | None = None,
                         shared_origin: bool = False, tables=None,
                         ray_ids=None):
    """One bounce: closest hit, attributes, local radiance.

    alive: optional [N] bool — dead rays get tmax = -1, which both sweep
    paths treat as an unconditional miss and the cluster kernel exploits to
    skip whole tiles (its block cull requires a live ray).
    shared_origin: static promise that every ray in the batch shares one
    origin (pinhole primary rays) — the cluster kernel hoists the
    origin-side dot products out of its dense tiles.

    NOTE a ray-sorting variant (octant+morton coherence permutation for
    the divergent bounce levels) was built in r3, measured a loss on
    teapot-512, re-measured in r4 with alive-first packing and sub-chunked
    variants, and lost every time (PERF_r04.md items 2/8): TPU
    sorts/gathers at wavefront sizes dwarf the sweep work they save, and
    the kernel's own per-block liveness culls absorb most dead-ray cost.
    The sort path was deleted; this note is the tombstone."""
    N = o.shape[0]
    shared_origin = shared_origin and params.sweep_shared_origin
    if alive is None:
        tmax = jnp.full(N, jnp.inf, jnp.float32)
    else:
        tmax = jnp.where(alive, jnp.inf, -1.0)

    sort = params.sweep_sort_bounce
    if sort is None:      # default off — measured a loss at frame level
        sort = False
    ids = closest_hit_chunked(scene, o, d, tmax, params.ray_tile,
                              params.tri_tile, params.prims_axis,
                              params.prims_axis_size, accel=accel,
                              shared_origin=shared_origin,
                              br=params.sweep_br,
                              exact_keys=params.sweep_exact_keys,
                              perm_ids=_perm_tables(accel, params),
                              sc_n=params.sweep_sc_n,
                              sort_rays=bool(sort)
                              and params.prims_axis is None)
    attrs = hit_attributes(scene, o, d, ids, features, attr_rows=tables)
    if _on_tpu():
        # materialize the per-ray attributes: without this barrier XLA
        # fuses the [N, 40] attr-row slices into the downstream light-slot
        # cond bodies, forcing whole-row relayout copies across each cond
        # boundary (3x [65k, 40] copies/level, ~1 ms/frame on teapot-512,
        # r4 xplane trace). The sliced [N]/[N,3] attrs are 13x smaller.
        attrs = jax.tree.map(jax.lax.optimization_barrier, attrs)
    local = light_contribution(scene, o, d, attrs.t, attrs.normal, attrs.kd,
                               attrs.ks, attrs.shininess, features, params,
                               key, alive=jnp.asarray(attrs.hit)
                               if alive is None else (alive & attrs.hit),
                               accel=accel, ray_ids=ray_ids)
    local = jnp.where(attrs.hit[:, None], local, 0.0)
    return attrs, local


def _perm_tables(accel, params) -> bool:
    """True when the trace consumes cluster-perm-space hit ids (and so its
    attribute tables must be built with tri_ids=accel.perm): exactly the
    condition under which closest_hit takes the accel Pallas path —
    delegated to intersect.uses_cluster_sweep so the two predicates can
    never drift (ADVICE r3)."""
    return uses_cluster_sweep(accel, params.prims_axis)


def scene_tables(scene, accel, params):
    """Attribute rows matching closest_hit's hit-id space for this accel:
    cluster-perm-ordered when the Pallas sweep will emit perm-space ids,
    scene-ordered otherwise (the _perm_tables predicate)."""
    return pack_attr_table(
        scene, tri_ids=accel.perm if _perm_tables(accel, params) else None)


def scene_accel(scene, features) -> Accel | None:
    """Build the cluster accel once per trace (TPU only; the XLA fallback
    sweeps brute-force regardless, so skip the packing work elsewhere).
    intersect.FORCE_CLUSTER_INTERPRET extends this to off-TPU interpreter
    runs (CPU-mesh validation of the sharded accel branch)."""
    from cge_tpu.ops import intersect as _isect
    if features.enable_accel_structure and scene.cluster_perm is not None \
            and (_on_tpu() or _isect.FORCE_CLUSTER_INTERPRET):
        return build_accel(scene)
    return None


def _chain_coefficients(attrs: HitAttrs, depth_remaining, features):
    """Per-ray affine coefficients (A, B) for the single-child chain modes.

    Derivation (render.cpp:27-150), glossy off:
      REC on:  first block adds RT(mirror) when ks != 0 and depth >= 1
               (line 52-101); second block adds RT(mirror) again (106-120);
               if transparency(material) != 1, early-returns
               t*RT(mirror) + (1-t)*Lo (122-130) — the transparency
               *feature* being off makes the second-block ray the mirror.
               => A = (1-t) if t != 1 else 1;
                  B = (1-t)*g + t if t != 1 else g, with g = 2 when
                  ks != 0 and depth >= 1; B = 0 when ks == 0 (the
                  sentinel zero-ray traces to black).
      REC off, TRANS on: block 1 (36-49): A = t, B = 1-t, child =
               continuation — only when t != 1 and depth > 0.
      REC off, TRANS off: A = 1, B = 0.
    """
    valid_mirror = jnp.any(attrs.ks != 0.0, axis=-1)
    t_mat = attrs.transparency
    trans_ne1 = t_mat != 1.0

    if features.enable_recursive:
        g = jnp.where(valid_mirror & (depth_remaining >= 1), 2.0, 0.0)
        A = jnp.where(trans_ne1, 1.0 - t_mat, 1.0)
        B = jnp.where(trans_ne1, (1.0 - t_mat) * g + t_mat, g)
        B = jnp.where(valid_mirror, B, 0.0)  # zero-sentinel child = black
        return A, B
    if features.enable_transparency:
        cond = trans_ne1 & (depth_remaining > 0)
        A = jnp.where(cond, t_mat, 1.0)
        B = jnp.where(cond, 1.0 - t_mat, 0.0)
        return A, B
    return jnp.ones_like(t_mat), jnp.zeros_like(t_mat)


def _child_ray(o, d, attrs: HitAttrs, features):
    """The single distinct child ray for the chain modes."""
    if features.enable_recursive:
        ro, rd, _ = compute_reflection_ray(o, d, attrs.t, attrs.normal, attrs.ks)
        return ro, rd
    # continuation ray (render.cpp:42-43): origin = (1e-5 + t) * d + o
    co = (1e-5 + attrs.t)[:, None] * d + o
    return co, d


def _unroll_depth(scene, params, features) -> int:
    """Static bounce-loop length per mode:
      - no recursion, no transparency: one level (B is always 0);
      - transparency continuation (REC off): depth-gated, ray_depth + 1;
      - recursive: ray_depth + 1 for all-opaque scenes; non-opaque scenes
        keep flowing past depth 0 via the t != 1 quirk path — bounded by
        extra_transparency_unroll.
    """
    if features.enable_recursive:
        base = params.ray_depth + 1
        if scene.all_opaque:
            return base
        return base + params.extra_transparency_unroll
    if features.enable_transparency and not scene.all_opaque:
        return params.ray_depth + 1
    return 1


def _scan_chain(scene, o, d, W, acc, features, params, key,
                start_level: int, n_levels: int, tail_trans: bool = False,
                accel: Accel | None = None, shared_origin: bool = False,
                tables=None, ray_ids=None):
    """Run n_levels affine-chain bounces as one lax.scan (single compiled
    body — a 12x-unrolled python loop trips XLA:CPU's MLIR limits and bloats
    TPU compile time).

    tail_trans selects the coefficient set for the post-branching tail of
    the TRANS+REC tree: A = (1-t), B = t, child = continuation ray
    (render.cpp:122-130 with depth gates all closed).

    shared_origin runs the FIRST level as its own 1-iteration scan whose
    body promises a single shared ray origin (pinhole primary rays) — the
    cluster kernel's fast path. It stays a scan (not a peel into straight-
    line code) so the level-0 math compiles as a loop body in every calling
    context and chunked/unchunked renders remain bit-identical.
    """
    if n_levels <= 0:
        return acc
    alive = W != 0.0

    def level_core(o, d, W, alive, k, depth_remaining, shared_origin_lvl):
        """One level's per-ray work: intersect, shade, affine coefficients,
        child ray. A pure map over the ray axis (no cross-ray interaction),
        so callers may run it over any sub-batch of the wavefront.
        Returns (contrib, o', d', W', alive')."""
        attrs, local = _intersect_and_shade(
            scene, o, d, features, params, k, alive, accel,
            shared_origin=shared_origin_lvl, tables=tables,
            ray_ids=ray_ids)
        # pin t: without this one barrier the child-ray fma
        # (1e-5 + t) * d + o fuses differently inline vs inside the
        # chunking lax.map, breaking chunked == unchunked bit-exactness
        # at ulp level (one [N] array — measured free on TPU)
        attrs = attrs._replace(
            t=jax.lax.optimization_barrier(attrs.t))
        live_hit = alive & attrs.hit
        if tail_trans:
            trans_ne1 = attrs.transparency != 1.0
            A = jnp.where(trans_ne1, 1.0 - attrs.transparency, 1.0)
            B = jnp.where(trans_ne1, attrs.transparency, 0.0)
            co = (1e-5 + attrs.t)[:, None] * d + o
            cd = d
        else:
            A, B = _chain_coefficients(attrs, depth_remaining, features)
            co, cd = _child_ray(o, d, attrs, features)
        contrib = jnp.where(live_hit[:, None], (W * A)[:, None] * local, 0.0)
        W = jnp.where(live_hit, W * B, 0.0)
        alive = live_hit & (W != 0.0)
        o = jnp.where(alive[:, None], co, o)
        d = jnp.where(alive[:, None], cd, d)
        return contrib, o, d, W, alive

    # NOTE on compaction (measured, round 4): two wavefront-compaction
    # variants for the bounce levels were built and benchmarked on
    # teapot-512 — (a) alive-first morton sort + sub-chunked level bodies
    # (argsort + state gathers: 52 ms vs 15.4 baseline) and (b) unsorted
    # bounce_chunk sub-chunks with lax.cond dead-skip (19-23 ms). Both LOSE:
    # TPU sorts/gathers at 65k rays and per-sub-chunk launch overheads dwarf
    # the dense work they save, and the sweep kernel's own per-block
    # liveness culls already absorb most of the dead-ray cost. The level
    # body therefore stays dense over the wavefront.
    def make_body(first: bool):
        def live_level(carry, level):
            o, d, W, acc, alive = carry
            k = jax.random.fold_in(key, level)
            depth_remaining = params.ray_depth - level
            # first = the peeled shared-origin level: every ray shares
            # the pinhole origin (the sweep kernel hoists the origin
            # dot products out of its dense tiles) and every ray is alive.
            contrib, o, d, W, alive = level_core(
                o, d, W, alive, k, depth_remaining, first)
            return (o, d, W, acc + contrib, alive)

        def body(carry, level):
            # whole-level skip: once every ray is dead (e.g. an all-diffuse
            # scene past bounce 0) a remaining scan level costs one
            # predicate + an identity cond branch — the ENTIRE body
            # (intersection, shading, child-ray and carry updates) lives
            # inside the cond so dead levels launch none of it.
            return jax.lax.cond(jnp.any(carry[4]), live_level,
                                lambda c, lv: c, carry, level), None
        return body

    levels = jnp.arange(start_level, start_level + n_levels)
    carry = (o, d, W, acc, alive)
    if shared_origin:
        # the caller promises level start_level's rays are already coherent
        # (the renderer's 32x16 swizzle) — split it out of the scan so only
        # the divergent bounce levels pay the re-sort. Barriers pin the
        # level subgraph: a 1-iteration scan is unrolled, and without them
        # XLA fuses it differently inline vs inside the chunking lax.map,
        # breaking chunked == unchunked bit-exactness.
        carry = jax.lax.optimization_barrier(carry)
        carry, _ = jax.lax.scan(make_body(True), carry, levels[:1])
        carry = jax.lax.optimization_barrier(carry)
        levels = levels[1:]
    if levels.shape[0]:
        carry, _ = jax.lax.scan(make_body(False), carry, levels)
    return carry[3]


def trace_chain(scene, o, d, features, params, key, accel=None,
                shared_origin: bool = False, tables=None, ray_ids=None):
    """Linear-chain wavefront trace (all modes except TRANS+REC and glossy).

    o, d: [N, 3]. Returns radiance [N, 3]. shared_origin peels bounce 0 out
    of the scan and runs it with the pinhole fast path (all primary rays
    share the camera origin; bounce children do not).
    """
    N = o.shape[0]
    acc = jnp.zeros((N, 3), jnp.float32)
    W = jnp.ones(N, jnp.float32)
    unroll = _unroll_depth(scene, params, features)
    return _scan_chain(scene, o, d, W, acc, features, params, key, 0, unroll,
                       accel=accel, shared_origin=shared_origin,
                       tables=tables, ray_ids=ray_ids)


def trace_tree_trans_recursive(scene, o, d, features, params, key,
                               accel: Accel | None = None,
                               shared_origin: bool = False, tables=None,
                               ray_ids=None):
    """TRANS + REC (glossy off): two distinct children per bounce, folded
    into the ray axis (the bounded-wavefront formulation of the
    reference's 2^depth recursion).

    Reference semantics (render.cpp:27-150): for a hit with material
    transparency t,

        result = (1-t)*(local + g1*RT(mirror) + g2*RT(second)) +
                 t*RT(second)          when t != 1 (early return 122-130)
        result = local + g1*RT(mirror) + g2*RT(second)   when t == 1

    where g1 = [ks != 0] (first mirror add, render.cpp:100), the second-
    block ray (108-113) is the transparency continuation when t != 1 and
    the mirror again when opaque, and g2 = [that ray is valid]. Collecting
    RT(second) terms makes each bounce affine with TWO weighted children:

        A  = (1-t) or 1          (local weight)
        wM = A*g1                (mirror child)
        wS = A*g2 + t or g2      (second child)

    so level l is ONE batched dispatch over N*2^l rays with per-ray
    product weights — children concatenate as [mirror; second], preserving
    parent identity at index mod N, so per-level radiance folds back onto
    the original rays with a reshape-sum. Branching runs while
    depth_remaining >= 1 (the gates at render.cpp:52,117); the 2^depth
    leaves then share one tail scan for the ungated t != 1 continuation
    path. depth+1 compiled sweep bodies instead of 2^depth+1.
    """
    N = o.shape[0]
    acc = jnp.zeros((N, 3), jnp.float32)
    co, cd = o, d
    cw = jnp.ones(N, jnp.float32)
    if ray_ids is None:
        ray_ids = jnp.arange(N, dtype=jnp.int32)
    ids = ray_ids
    for level in range(params.ray_depth):
        k = jax.random.fold_in(key, level)
        alive = cw != 0.0
        attrs, local = _intersect_and_shade(scene, co, cd, features, params,
                                            k, alive if level else None,
                                            accel,
                                            shared_origin=(shared_origin
                                                           and level == 0),
                                            tables=tables, ray_ids=ids)
        live_hit = alive & attrs.hit
        t_mat = attrs.transparency
        trans_ne1 = t_mat != 1.0
        valid_mirror = jnp.any(attrs.ks != 0.0, axis=-1)

        mo, md, _ = compute_reflection_ray(co, cd, attrs.t, attrs.normal,
                                           attrs.ks)
        cono = (1e-5 + attrs.t)[:, None] * cd + co      # continuation
        so = jnp.where(trans_ne1[:, None], cono, mo)    # second-block ray
        sd = jnp.where(trans_ne1[:, None], cd, md)

        g1 = jnp.where(valid_mirror, 1.0, 0.0)
        g2 = jnp.where(trans_ne1, 1.0, g1)     # continuation always valid
        A = jnp.where(trans_ne1, 1.0 - t_mat, 1.0)
        wM = A * g1
        wS = jnp.where(trans_ne1, A * g2 + t_mat, g2)

        contrib = jnp.where(live_hit[:, None], (cw * A)[:, None] * local, 0.0)
        acc = acc + contrib.reshape(-1, N, 3).sum(axis=0)

        if scene.all_diffuse:
            # ks == 0 everywhere: the mirror child is ALWAYS the dead zero
            # sentinel (wM = A*g1 = 0), so don't double the batch for it —
            # the tree is a single-child chain. Radiance is bitwise equal
            # (summing the dropped branch's exact zeros changes nothing);
            # surviving paths keep the ids they had (2i+1), so stochastic
            # streams are unchanged too. Cube transrec-512: 140 -> see
            # PERF_r05.md.
            co, cd = so, sd
            cw = jnp.where(live_hit, cw * wS, 0.0)
            ids = ids * 2 + 1
        else:
            co = jnp.concatenate([mo, so])
            cd = jnp.concatenate([md, sd])
            cw = jnp.concatenate([jnp.where(live_hit, cw * wM, 0.0),
                                  jnp.where(live_hit, cw * wS, 0.0)])
            # children get distinct GLOBAL ids (mirror 2i, second 2i+1) so
            # any stochastic sampling they feed stays chunk/shard-invariant
            ids = jnp.concatenate([ids * 2, ids * 2 + 1])

    # tail: only the ungated t != 1 continuation path flows past depth 0
    tail = _unroll_depth(scene, params, features) - params.ray_depth
    tail_acc = _scan_chain(scene, co, cd, cw,
                           jnp.zeros((co.shape[0], 3), jnp.float32),
                           features, params, key, params.ray_depth, tail,
                           tail_trans=True, accel=accel, tables=tables,
                           ray_ids=ids)
    return acc + tail_acc.reshape(-1, N, 3).sum(axis=0)


def _orthonormal_cone_basis(w):
    """Min-component trick (render.cpp:57-71): t = w with its min component
    set to 1, u = normalize(cross(t, w)), v = cross(w, u)."""
    t = w
    minidx = jnp.argmin(t, axis=-1)
    t = t.at[jnp.arange(t.shape[0]), minidx].set(1.0)
    u = jnp.cross(t, w)
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    v = jnp.cross(w, u)
    return u, v


def _glossy_sample_dirs(attrs, md, n_samples, params, key, ray_ids):
    """Cone sample directions (render.cpp:84-90). md: mirror direction.
    Returns (dirs [N, S, 3], above [N, S]); jitter streams keyed per ray."""
    from cge_tpu.render.lights import per_ray_uniform
    w = _normalize(md)
    u, v = _orthonormal_cone_basis(w)
    a = ((1.0 / jnp.where(attrs.shininess != 0, attrs.shininess, 1.0))
         * params.alpha_modifier)
    N = md.shape[0]
    r1 = per_ray_uniform(jax.random.fold_in(key, 0), ray_ids, (n_samples,))
    r2 = per_ray_uniform(jax.random.fold_in(key, 1), ray_ids, (n_samples,))
    wu = (-a[:, None] / 2 + r1 * a[:, None])[..., None]
    wv = (-a[:, None] / 2 + r2 * a[:, None])[..., None]
    dirs = _normalize(w[:, None, :] + wu * u[:, None, :] + wv * v[:, None, :])
    above = _dot(attrs.normal[:, None, :], dirs) > 0
    return dirs, above


def trace_glossy(scene, o, d, features, params, key, accel=None,
                 shared_origin: bool = False, tables=None, ray_ids=None):
    """Glossy reflections (render.cpp:56-99), wavefront form.

    Reference semantics per bounce (glossy feature on, material shininess
    != 0): average over rays_per_reflection cone samples of
    ks * RT(sample, min(depth-1, glossyReflectionsCap)); samples below the
    horizon (dot(n, dir) <= 0) contribute 0 but still divide by the sample
    count (render.cpp:91-97). shininess == 0 materials take the plain
    mirror add instead (render.cpp:99-101); transparency paths are skipped
    entirely in glossy mode (the blocks at 36 and 106 require !glossy).

    TPU shape: the first bounce fans out rays_per_reflection cone samples
    into the ray batch axis; subsequent bounces trace ONE cone sample per
    ray inside a lax.scan chain with per-ray componentwise (vec3) weights
    and per-ray depth bookkeeping (depth = min(depth-1, cap) on glossy
    bounces, depth-1 on plain mirror bounces). Matches the reference in
    expectation; the reference's literal 40^depth fan-out is intractable.
    """
    N = o.shape[0]
    S = params.rays_per_reflection
    if ray_ids is None:
        ray_ids = jnp.arange(N, dtype=jnp.int32)
    k0 = jax.random.fold_in(key, 0)
    attrs, local = _intersect_and_shade(scene, o, d, features, params, k0,
                                        accel=accel,
                                        shared_origin=shared_origin,
                                        tables=tables, ray_ids=ray_ids)
    valid_mirror = jnp.any(attrs.ks != 0.0, axis=-1)
    glossy_active = valid_mirror & (attrs.shininess != 0.0)
    mo, md, _ = compute_reflection_ray(o, d, attrs.t, attrs.normal, attrs.ks)

    gdirs, above = _glossy_sample_dirs(attrs, md, S, params,
                                       jax.random.fold_in(k0, 100), ray_ids)
    # child rays: cone samples for glossy materials, the mirror (sample 0
    # carries full weight) for shininess == 0 materials
    child_d = jnp.where(glossy_active[:, None, None], gdirs,
                        md[:, None, :])                       # [N,S,3]
    child_o = jnp.broadcast_to(mo[:, None, :], child_d.shape)
    # per-sample weights [N,S,3]
    w_glossy = jnp.where(above[..., None], attrs.ks[:, None, :], 0.0) / S
    w_plain = jnp.zeros((N, S, 3)).at[:, 0, :].set(1.0)
    W1 = jnp.where(glossy_active[:, None, None], w_glossy, w_plain)
    spawn = valid_mirror & attrs.hit & (params.ray_depth >= 1)
    W1 = jnp.where(spawn[:, None, None], W1, 0.0)
    depth1 = jnp.where(glossy_active,
                       jnp.minimum(params.ray_depth - 1,
                                   params.glossy_reflections_cap),
                       params.ray_depth - 1)                  # [N]
    depth1 = jnp.broadcast_to(depth1[:, None], (N, S))

    # flatten samples into the ray axis and scan the remaining bounces;
    # sample s of parent ray i carries global id i*S + s
    fids = (ray_ids[:, None] * S
            + jnp.arange(S, dtype=jnp.int32)[None, :]).reshape(N * S)
    fo = child_o.reshape(N * S, 3)
    fd = child_d.reshape(N * S, 3)
    fW = W1.reshape(N * S, 3)
    fdepth = depth1.reshape(N * S)
    facc = jnp.zeros((N * S, 3), jnp.float32)

    def live_body(carry, level):
        o, d, W, depth, acc = carry
        k = jax.random.fold_in(key, 1000 + level)
        live_in = jnp.any(W != 0.0, axis=-1)
        attrs, local = _intersect_and_shade(scene, o, d, features,
                                            params, k, live_in, accel,
                                            tables=tables, ray_ids=fids)
        alive = live_in & attrs.hit
        acc = acc + jnp.where(alive[:, None], W * local, 0.0)
        vm = jnp.any(attrs.ks != 0.0, axis=-1)
        ga = vm & (attrs.shininess != 0.0)
        mo, md, _ = compute_reflection_ray(o, d, attrs.t, attrs.normal,
                                           attrs.ks)
        gdir, abv = _glossy_sample_dirs(attrs, md, 1, params,
                                        jax.random.fold_in(k, 5), fids)
        nd = jnp.where(ga[:, None], gdir[:, 0], md)
        spawn = alive & vm & (depth >= 1)
        w_step = jnp.where(ga[:, None],
                           jnp.where(abv[:, 0][:, None], attrs.ks, 0.0),
                           jnp.ones_like(attrs.ks))
        W = jnp.where(spawn[:, None], W * w_step, 0.0)
        depth = jnp.where(ga, jnp.minimum(depth - 1,
                                          params.glossy_reflections_cap),
                          depth - 1)
        o = jnp.where(spawn[:, None], mo, o)
        d = jnp.where(spawn[:, None], nd, d)
        return (o, d, W, depth, acc)

    def body(carry, level):
        # dead-level skip (cf. _scan_chain): the full body lives inside the
        # cond, so once every sample path dies the rest of the scan is free
        return jax.lax.cond(jnp.any(carry[2] != 0.0), live_body,
                            lambda c, lv: c, carry, level), None

    (_, _, _, _, facc), _ = jax.lax.scan(
        body, (fo, fd, fW, fdepth, facc),
        jnp.arange(params.ray_depth))
    child_sum = facc.reshape(N, S, 3).sum(axis=1)
    lo = local + child_sum
    return jnp.where(attrs.hit[:, None], lo, 0.0)


def trace(scene, o, d, features, params, key, accel=None,
          shared_origin: bool = False, tables=None, ray_ids=None):
    """Dispatch to the right statically-specialized trace shape.

    accel: pass a prebuilt Accel to share the packed cluster tiles across
    chunked trace calls (cge_tpu.render.renderer); None builds one here.
    tables: prebuilt pack_attr_table rows matching accel's id space (see
    renderer.prepare_render) — building the [T, 40] rows costs real frame
    time at scale (~160 ms/frame on the 614k-tri dragon, measured r4), so
    repeated renders of one scene should prepare them once. None builds
    them here (keeps gradients flowing scene -> table -> radiance for the
    differentiable paths).
    shared_origin: static promise that all rays share one origin (pinhole
    primary batches — plain and MSAA paths; not DoF). Only the first bounce
    exploits it; children scatter to per-ray origins.
    """
    if accel is None:
        accel = scene_accel(scene, features)
    if tables is None:
        tables = pack_attr_table(
            scene, tri_ids=accel.perm if _perm_tables(accel, params) else None)
    if features.enable_recursive and features.enable_glossy_reflection:
        return trace_glossy(scene, o, d, features, params, key, accel=accel,
                            shared_origin=shared_origin, tables=tables,
                            ray_ids=ray_ids)
    if features.enable_recursive and features.enable_transparency:
        return trace_tree_trans_recursive(scene, o, d, features, params, key,
                                          accel=accel,
                                          shared_origin=shared_origin,
                                          tables=tables, ray_ids=ray_ids)
    return trace_chain(scene, o, d, features, params, key, accel=accel,
                       shared_origin=shared_origin, tables=tables,
                       ray_ids=ray_ids)
