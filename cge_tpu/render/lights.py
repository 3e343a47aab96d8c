"""Light sampling, shadow visibility, and per-hit radiance.

Mirrors /root/reference/src/light.cpp:
  - sampleSegmentLight (19-26): stratified jitter along the segment,
    position lerp + color lerp with weight w = (index + r) / samples;
  - sampleParallelogramLight (30-45): stratified 2-D jitter, bilinear color;
  - testVisibilityLightSample (49-73): hit point pulled back 1e-5 along the
    normalized ray, shadow ray {p, samplePos - p, t budget 1}; blocked -> 0,
    or the closest blocker's transparency when the transparency feature is
    on (65-68);
  - computeLightContribution (108-165): shading off => raw kd; point lights
    shaded x hard-shadow visibility; segment/parallelogram lights contribute
    only when soft shadows are enabled, averaged over 25 / 5x5 stratified
    samples.

Stochastic jitter uses deterministic threefry keys (documented divergence
from the reference's irreproducible rand()/mt19937 — SURVEY.md §2.5 #14),
folded PER RAY by global ray id (r5): the samples a ray draws depend only
on (seed, level, light, ray id), so renders are bit-identical across
chunk sizes, shardings and batch layouts — which is what lets the sharded
train step assert grads == single-device for the stochastic features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cge_tpu.ops.intersect import any_hit_occlusion, closest_hit_chunked
from cge_tpu.ops.shading import compute_shading


def _norm(v):
    return jnp.linalg.norm(v, axis=-1, keepdims=True)


def per_ray_uniform(key, ray_ids, shape):
    """U[0,1) samples from per-ray threefry streams keyed by GLOBAL ray id
    (the SURVEY §7 'per-pixel fold-in'). ray_ids: [N] i32. Returns
    [N, *shape]; invariant to how the ray batch is chunked or sharded."""
    ks = jax.vmap(lambda i: jax.random.fold_in(key, i))(ray_ids)
    return jax.vmap(lambda kk: jax.random.uniform(kk, shape))(ks)


def shadow_visibility(scene, ray_o, ray_d, ray_t, sample_pos, features,
                      params, alive=None, accel=None):
    """testVisibilityLightSample (light.cpp:49-73), batched.

    ray_o/ray_d: [N,3] the *shaded* ray; ray_t: [N] its hit parameter (in
    units of |d|); sample_pos: [N,3] light sample positions.
    alive: optional [N] bool — dead rays get a -1 t budget (guaranteed miss,
    lets the cluster sweep skip their tiles). Returns visibility [N] in [0,1].
    """
    if not (features.enable_hard_shadow or features.enable_soft_shadow):
        return jnp.ones(ray_o.shape[0], jnp.float32)
    # grad-safe length: zero-sentinel rays (TRANS+REC tree children of
    # non-mirror materials) make |d| = 0, and both the norm's backward
    # (v/|v|) and the division produce NaN regardless of the cotangent —
    # guard INSIDE the sqrt (r5 transrec grad test)
    d2 = jnp.sum(ray_d * ray_d, axis=-1, keepdims=True)
    dpos = d2 > 0
    dlen = jnp.where(dpos, jnp.sqrt(jnp.where(dpos, d2, 1.0)), 0.0)
    dhat = jnp.where(dpos, ray_d / jnp.where(dpos, dlen, 1.0), 0.0)
    t_norm = ray_t * dlen[..., 0]
    p = ray_o + dhat * (t_norm - 1e-5)[..., None]
    sdir = sample_pos - p
    if alive is None:
        tmax = jnp.ones(p.shape[0], jnp.float32)
    else:
        tmax = jnp.where(alive, 1.0, -1.0)
    if not features.enable_transparency and accel is not None \
            and params.prims_axis is None:
        # only existence of a blocker matters (light.cpp:60-63): the any-hit
        # kernel lets a blocked ray prune all remaining clusters. The
        # TRIANGLE sweep runs REVERSED — origin at the light sample,
        # direction toward the hit point — which covers the same [p, sample]
        # segment (t' = 1-t, same budget-1 acceptance set for the plane-t
        # test) but gives every block a tight origin hull at the light:
        # measured 22% faster on the teapot shadow batch with a
        # bit-identical blocked set (PERF_r04.md). Spheres test the forward
        # rays inside any_hit_occlusion: their a==1 quadratic quirk is not
        # reversal-invariant (ADVICE r4).
        rev = ((sample_pos, p - sample_pos)
               if params.sweep_shadow_reverse else None)
        sort = params.sweep_sort_shadow
        if sort is None:   # default off — measured a loss at frame level
            sort = False
        blocked = any_hit_occlusion(scene, p, sdir, tmax,
                                    accel=accel, br=params.sweep_br,
                                    exact_keys=params.sweep_anyhit_exact_keys,
                                    tri_rays=rev,
                                    sc_n=params.sweep_anyhit_sc_n,
                                    sort_rays=bool(sort))
        return jnp.where(blocked, 0.0, 1.0)
    res = closest_hit_chunked(scene, p, sdir, tmax,
                              params.ray_tile, params.tri_tile,
                              params.prims_axis, params.prims_axis_size,
                              accel=accel, br=params.sweep_br,
                              exact_keys=params.sweep_exact_keys,
                              sc_n=params.sweep_sc_n)
    if features.enable_transparency:
        # the *closest* blocker's transparency (light.cpp:65-68)
        tri_tr = scene.mat_transparency[scene.tri_mat[res.prim]]
        sph_tr = scene.mat_transparency[scene.sph_mat[res.prim]]
        blocker_tr = jnp.where(res.is_sphere, sph_tr, tri_tr)
        return jnp.where(res.hit, blocker_tr, 1.0)
    return jnp.where(res.hit, 0.0, 1.0)


def sample_segment_light(p0, p1, c0, c1, index, n_samples, r):
    """sampleSegmentLight (light.cpp:19-26). index/r broadcast over samples."""
    w = (index + r) / n_samples
    pos = (p1 - p0) * w[..., None] + p0
    color = w[..., None] * c1 + (1.0 - w[..., None]) * c0
    return pos, color


def sample_parallelogram_light(v0, e01, e02, c0, c1, c2, c3,
                               hi, vi, na, nb, r1, r2):
    """sampleParallelogramLight (light.cpp:30-45)."""
    hw = (hi + r1) / na
    vw = (vi + r2) / nb
    pos = v0 + hw[..., None] * e01 + vw[..., None] * e02
    bottom = hw[..., None] * c1 + (1.0 - hw[..., None]) * c0
    top = hw[..., None] * c3 + (1.0 - hw[..., None]) * c2
    color = vw[..., None] * top + (1.0 - vw[..., None]) * bottom
    return pos, color


def light_contribution(scene, ray_o, ray_d, ray_t, normal, kd, ks, shininess,
                       features, params, key, alive=None, accel=None,
                       ray_ids=None):
    """computeLightContribution (light.cpp:108-165), batched over rays [N].

    Returns radiance [N, 3]. Caller guards the hit mask; `alive` additionally
    masks the shadow sweeps (dead rays cost nothing in the cluster kernel).
    ray_ids: [N] global ray ids keying the per-ray stochastic streams
    (None = arange — correct for unchunked, unsharded batches).
    """
    N = ray_o.shape[0]
    if not features.enable_shading:
        return kd  # light.cpp:161-164
    if ray_ids is None:
        ray_ids = jnp.arange(N, dtype=jnp.int32)

    result = jnp.zeros((N, 3), jnp.float32)

    def shade_vis(sample_pos, sample_color, want_vis):
        sh = compute_shading(sample_pos, sample_color, ray_o, ray_d, ray_t,
                             normal, kd, ks, shininess)
        if want_vis:
            vis = shadow_visibility(scene, ray_o, ray_d, ray_t, sample_pos,
                                    features, params, alive, accel)
            return sh * vis[..., None]
        return sh

    def masked(mask_li, body):
        """One light slot's contribution, skipped ENTIRELY when the slot is
        masked out (scene arrays carry fixed-size typed light slots; a
        masked slot used to run its full stratified shadow sweep and then
        multiply by zero — 46 ms/chunk for a dead segment slot on the
        soft-shadow bench, measured r4). lax.cond keeps the skip at
        runtime; under vmap (render_images) it may degrade to select,
        which merely restores the old always-compute behavior."""
        return jax.lax.cond(
            mask_li, body, lambda: jnp.zeros((N, 3), jnp.float32))

    # ---- point lights (light.cpp:115-122)
    LP = scene.point_pos.shape[0]
    for li in range(LP):
        def point_body(li=li):
            pos = jnp.broadcast_to(scene.point_pos[li], (N, 3))
            col = jnp.broadcast_to(scene.point_color[li], (N, 3))
            return shade_vis(pos, col, features.enable_hard_shadow)
        result = result + masked(scene.point_mask[li], point_body)

    # ---- segment lights (light.cpp:123-138): soft shadows only
    if features.enable_soft_shadow:
        SS = params.segment_light_samples
        LS = scene.seg_p0.shape[0]
        for li in range(LS):
            def seg_body(li=li):
                k = jax.random.fold_in(key, 1000 + li)
                r = per_ray_uniform(k, ray_ids, (SS,))
                idx = jnp.arange(SS, dtype=jnp.float32)[None, :]
                pos, col = sample_segment_light(
                    scene.seg_p0[li], scene.seg_p1[li],
                    scene.seg_c0[li], scene.seg_c1[li], idx, float(SS), r)
                # flatten samples into the ray axis: one batched shadow sweep
                o_f = jnp.repeat(ray_o, SS, axis=0)
                d_f = jnp.repeat(ray_d, SS, axis=0)
                t_f = jnp.repeat(ray_t, SS, axis=0)
                n_f = jnp.repeat(normal, SS, axis=0)
                kd_f = jnp.repeat(kd, SS, axis=0)
                ks_f = jnp.repeat(ks, SS, axis=0)
                sh_f = jnp.repeat(shininess, SS, axis=0)
                pos_f = pos.reshape(-1, 3)
                col_f = col.reshape(-1, 3)
                a_f = None if alive is None else jnp.repeat(alive, SS, axis=0)
                sh = compute_shading(pos_f, col_f, o_f, d_f, t_f, n_f, kd_f,
                                     ks_f, sh_f)
                vis = shadow_visibility(scene, o_f, d_f, t_f, pos_f, features,
                                        params, a_f, accel)
                return (sh * vis[..., None]).reshape(N, SS, 3).sum(axis=1) / SS
            result = result + masked(scene.seg_mask[li], seg_body)

        # ---- parallelogram lights (light.cpp:139-157)
        PS = params.parallelogram_light_direction_samples
        LQ = scene.par_v0.shape[0]
        for li in range(LQ):
            def par_body(li=li):
                k = jax.random.fold_in(key, 2000 + li)
                r1 = per_ray_uniform(jax.random.fold_in(k, 0), ray_ids,
                                     (PS, PS))
                r2 = per_ray_uniform(jax.random.fold_in(k, 1), ray_ids,
                                     (PS, PS))
                hi = jnp.arange(PS, dtype=jnp.float32)[None, :, None]
                vi = jnp.arange(PS, dtype=jnp.float32)[None, None, :]
                pos, col = sample_parallelogram_light(
                    scene.par_v0[li], scene.par_e01[li], scene.par_e02[li],
                    scene.par_c0[li], scene.par_c1[li], scene.par_c2[li],
                    scene.par_c3[li],
                    jnp.broadcast_to(hi, (N, PS, PS)),
                    jnp.broadcast_to(vi, (N, PS, PS)), float(PS), float(PS),
                    r1, r2)
                M = PS * PS
                o_f = jnp.repeat(ray_o, M, axis=0)
                d_f = jnp.repeat(ray_d, M, axis=0)
                t_f = jnp.repeat(ray_t, M, axis=0)
                n_f = jnp.repeat(normal, M, axis=0)
                kd_f = jnp.repeat(kd, M, axis=0)
                ks_f = jnp.repeat(ks, M, axis=0)
                sh_f = jnp.repeat(shininess, M, axis=0)
                pos_f = pos.reshape(-1, 3)
                col_f = col.reshape(-1, 3)
                a_f = None if alive is None else jnp.repeat(alive, M, axis=0)
                sh = compute_shading(pos_f, col_f, o_f, d_f, t_f, n_f, kd_f,
                                     ks_f, sh_f)
                vis = shadow_visibility(scene, o_f, d_f, t_f, pos_f, features,
                                        params, a_f, accel)
                return (sh * vis[..., None]).reshape(N, M, 3).sum(axis=1) / M
            result = result + masked(scene.par_mask[li], par_body)

    return result
