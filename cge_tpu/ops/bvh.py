"""Bounding volume hierarchies.

Two structures, for two jobs:

1. **Reference-parity BVH** (`build_reference_bvh`): replicates the exact
   construction rules of /root/reference/src/bounding_volume_hierarchy.cpp —
   median split via nth_element on axis depth%3 (cpp:74-78) or SAH binning
   (full per-axis sort, <=8 stride-sampled candidate splits, cost =
   SA_L*n_L + SA_R*n_R, cpp:97-128); leaf iff depth+1 == MAX_DEPTH(16) or
   exactly one primitive (cpp:136); primitives = all mesh triangles then all
   spheres (cpp:158-171). Exposes numLevels/numLeaves/max-per-leaf (the
   debug-slider API, cpp:198-208) and linearized node arrays for traversal
   and debug exports.

2. **Cluster accel** (`build_clusters`): the TPU-native acceleration
   structure — triangles permuted into spatially-coherent clusters of
   CLUSTER_SIZE, built by largest-extent median splits. The Pallas cluster
   sweep kernel tests a whole ray block against a cluster AABB and skips the
   dense intersection tile when no ray can hit it (predicated execution).
   Pure perf structure: results are identical to the brute-force sweep up to
   exact-t tie order.

Both builders run host-side in NumPy (construction is a one-off per scene,
like the reference's ctor); everything consumed on-device is a static-shaped
array.
"""

from __future__ import annotations

import dataclasses

import numpy as np

MAX_DEPTH = 16       # bounding_volume_hierarchy.h:43
NUM_OF_BINS = 8      # bounding_volume_hierarchy.h:44
CLUSTER_SIZE = 128   # triangles per TPU cluster tile


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _primitive_soup(scene):
    """Flatten the scene into primitive AABBs + centers, reference order:
    all mesh triangles (centroid = mean of corners, cpp:70-72,160-165), then
    spheres (center, cpp:169-171). Returns (lo, hi, center, is_sphere,
    prim_index) over VALID primitives only."""
    v = np.asarray(scene.vertices)
    t = np.asarray(scene.tris)
    mask = np.asarray(scene.tri_mask)
    tv = v[t[mask]]                       # [Tv, 3, 3]
    lo = tv.min(axis=1)
    hi = tv.max(axis=1)
    center = tv.mean(axis=1, dtype=np.float32)
    idx = np.nonzero(mask)[0].astype(np.int32)
    is_sphere = np.zeros(len(idx), bool)

    smask = np.asarray(scene.sph_mask)
    if smask.any():
        sc = np.asarray(scene.sph_center)[smask]
        sr = np.asarray(scene.sph_radius)[smask][:, None]
        lo = np.concatenate([lo, sc - sr])
        hi = np.concatenate([hi, sc + sr])
        center = np.concatenate([center, sc.astype(np.float32)])
        idx = np.concatenate([idx, np.nonzero(smask)[0].astype(np.int32)])
        is_sphere = np.concatenate([is_sphere, np.ones(smask.sum(), bool)])
    return lo.astype(np.float32), hi.astype(np.float32), center, is_sphere, idx


def _surface_area(lo, hi):
    e = hi - lo
    return 2.0 * (e[0] * e[1] + e[1] * e[2] + e[2] * e[0])


# ---------------------------------------------------------------------------
# 1. reference-parity BVH
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SAHCuts:
    """Candidate SAH split planes of one internal node (the reference's
    SAHCuts, bounding_volume_hierarchy.h:25-29): per axis, each candidate
    plane as a degenerate AABB (the parent box flattened at the cut
    coordinate, getSplitPlane cpp:91-96), plus which (axis, index) won."""

    cuts: list                # 3 lists of (lo [3], hi [3]) plane AABBs
    chosen_dim: int
    chosen_ind: int


@dataclasses.dataclass
class ReferenceBVH:
    """Linearized reference-rule BVH.

    Node layout mirrors the reference's Node.data
    (bounding_volume_hierarchy.h:31-41): [is_leaf, depth, beg, end,
    left, right] over the *permuted* primitive order."""

    node_lo: np.ndarray       # [N, 3]
    node_hi: np.ndarray       # [N, 3]
    node_meta: np.ndarray     # [N, 6] int32: is_leaf, depth, beg, end, l, r
    root: int
    perm_is_sphere: np.ndarray  # [P] bool   (permuted primitive kinds)
    perm_index: np.ndarray      # [P] int32  (permuted primitive scene ids)
    num_levels: int
    num_leaves: int
    max_per_leaf: int
    # per-depth SAHCuts lists (sahCutsPerLevel, h:91) — only populated by
    # SAH builds with record_sah_cuts=True (a debug re-build; the hot native
    # builder doesn't record them)
    sah_cuts_per_level: list | None = None

    def debug_level_boxes(self, level: int):
        """AABBs of all nodes at a given depth (debugDrawLevel,
        cpp:221-228) — as arrays instead of GL wireframes."""
        sel = self.node_meta[:, 1] == level
        return self.node_lo[sel], self.node_hi[sel]

    def debug_leaf(self, leaf_idx: int):
        """AABB + primitive ids of the i-th leaf in node order
        (debugDrawLeaf, cpp:244-270; 1-based like the UI slider)."""
        count = 0
        for n in range(len(self.node_meta)):
            if self.node_meta[n, 0]:
                count += 1
                if count == leaf_idx:
                    beg, end = self.node_meta[n, 2], self.node_meta[n, 3]
                    return (self.node_lo[n], self.node_hi[n],
                            self.perm_index[beg:end],
                            self.perm_is_sphere[beg:end])
        return None

    def debug_sah_splits(self, level: int, axis: int):
        """Candidate SAH split planes of every node at `level` along `axis`
        (debugDrawSAHSplits, cpp:230-237): every recorded cut of that axis
        as a flattened plane AABB, the globally chosen one flagged (drawn
        green there, red otherwise). Returns (lo [K,3], hi [K,3],
        chosen [K] bool); requires a build with record_sah_cuts=True."""
        if self.sah_cuts_per_level is None:
            raise ValueError("build with sah_binning=True, "
                             "record_sah_cuts=True to record split planes")
        los, his, chosen = [], [], []
        if 0 <= level < len(self.sah_cuts_per_level):
            for sc in self.sah_cuts_per_level[level]:
                for i, (lo, hi) in enumerate(sc.cuts[axis]):
                    los.append(lo)
                    his.append(hi)
                    chosen.append(sc.chosen_dim == axis
                                  and sc.chosen_ind == i)
        if not los:
            z = np.zeros((0, 3), np.float32)
            return z, z, np.zeros(0, bool)
        return (np.asarray(los, np.float32), np.asarray(his, np.float32),
                np.asarray(chosen, bool))


def build_reference_bvh(scene, sah_binning: bool = False,
                        use_native: bool = True,
                        record_sah_cuts: bool = False) -> ReferenceBVH:
    lo, hi, center, is_sphere, prim_idx = _primitive_soup(scene)
    P = len(center)
    if record_sah_cuts:
        use_native = False      # debug re-build; the native lib won't record

    if use_native:
        from cge_tpu import native as cge_native
        r = cge_native.build_bvh_native(lo, hi, center, sah_binning)
        if r is not None:
            node_lo, node_hi, node_meta, perm, (lv, leaves, mx) = r
            return ReferenceBVH(
                node_lo=node_lo, node_hi=node_hi, node_meta=node_meta,
                root=len(node_meta) - 1,
                perm_is_sphere=is_sphere[perm], perm_index=prim_idx[perm],
                num_levels=lv, num_leaves=leaves, max_per_leaf=mx)

    order = np.arange(P)

    node_lo, node_hi, node_meta = [], [], []
    stats = dict(levels=0, leaves=0, max_leaf=0)

    def bbox(beg, end):
        sel = order[beg:end]
        return lo[sel].min(axis=0), hi[sel].max(axis=0)

    def split_standard(beg, end, depth):
        axis = depth % 3
        mid = beg + (end - beg) // 2
        sel = order[beg:end]
        part = np.argpartition(center[sel, axis], mid - beg)
        order[beg:end] = sel[part]
        return mid

    sah_cuts_per_level: list = [] if record_sah_cuts else None

    def split_sah(beg, end, depth):
        skip = max(1, (end - beg) // NUM_OF_BINS)
        best_cost = np.inf
        best_split, best_axis = None, None
        if record_sah_cuts:
            while len(sah_cuts_per_level) <= depth:    # cpp:133-135
                sah_cuts_per_level.append([])
            rec = SAHCuts(cuts=[[], [], []], chosen_dim=0, chosen_ind=0)
            plo, phi = bbox(beg, end)                  # parentBox (cpp:102)
        for axis in range(3):
            sel = order[beg:end]
            srt = sel[np.argsort(center[sel, axis], kind="stable")]
            order[beg:end] = srt
            clo = lo[srt]
            chi = hi[srt]
            # prefix/suffix bounds for O(n) cost evaluation
            pre_lo = np.minimum.accumulate(clo, axis=0)
            pre_hi = np.maximum.accumulate(chi, axis=0)
            suf_lo = np.minimum.accumulate(clo[::-1], axis=0)[::-1]
            suf_hi = np.maximum.accumulate(chi[::-1], axis=0)[::-1]
            for split in range(beg + skip, end, skip):
                k = split - beg
                if record_sah_cuts:
                    # getSplitPlane (cpp:91-96): the parent box flattened at
                    # the midpoint of the two adjacent sorted centers
                    cut = 0.5 * (center[srt[k], axis]
                                 + center[srt[k - 1], axis])
                    cl, ch = plo.copy(), phi.copy()
                    cl[axis] = ch[axis] = cut
                    rec.cuts[axis].append((cl, ch))
                cost = (_surface_area(pre_lo[k - 1], pre_hi[k - 1]) * k
                        + _surface_area(suf_lo[k], suf_hi[k])
                        * (end - split))
                if cost < best_cost:
                    best_cost, best_split, best_axis = cost, split, axis
                    if record_sah_cuts:
                        rec.chosen_dim = axis
                        rec.chosen_ind = len(rec.cuts[axis]) - 1
        if record_sah_cuts:
            sah_cuts_per_level[depth].append(rec)      # cpp:124
        sel = order[beg:end]
        srt = sel[np.argsort(center[sel, best_axis], kind="stable")]
        order[beg:end] = srt
        return best_split

    split = split_sah if sah_binning else split_standard

    import sys
    sys.setrecursionlimit(100000)

    def create(beg, end, depth):
        stats["levels"] = max(stats["levels"], depth + 1)
        blo, bhi = bbox(beg, end)
        if depth + 1 == MAX_DEPTH or beg + 1 == end:   # cpp:136
            node_lo.append(blo)
            node_hi.append(bhi)
            node_meta.append([1, depth, beg, end, -1, -1])
            stats["leaves"] += 1
            stats["max_leaf"] = max(stats["max_leaf"], end - beg)
            return len(node_meta) - 1
        mid = split(beg, end, depth)
        left = create(beg, mid, depth + 1)
        right = create(mid, end, depth + 1)
        node_lo.append(blo)
        node_hi.append(bhi)
        node_meta.append([0, depth, beg, end, left, right])
        return len(node_meta) - 1

    root = create(0, P, 0)
    return ReferenceBVH(
        node_lo=np.asarray(node_lo, np.float32),
        node_hi=np.asarray(node_hi, np.float32),
        node_meta=np.asarray(node_meta, np.int32),
        root=root,
        perm_is_sphere=is_sphere[order],
        perm_index=prim_idx[order],
        num_levels=stats["levels"],
        num_leaves=stats["leaves"],
        max_per_leaf=stats["max_leaf"],
        sah_cuts_per_level=sah_cuts_per_level,
    )


# ---------------------------------------------------------------------------
# 2. TPU cluster accel
# ---------------------------------------------------------------------------

def build_clusters(vertices, tris, tri_mask,
                   cluster_size: int = CLUSTER_SIZE,
                   use_native: bool = True) -> np.ndarray:
    """Partition the scene's triangles into spatially-coherent clusters of
    <= cluster_size via largest-extent median splits.

    Returns perm: [L, cluster_size] int32 — triangle ids per cluster, -1
    padded. Cluster order follows the recursion (children adjacent), which
    keeps neighbouring clusters spatially close for block-level culling.
    Spheres are not clustered (they are swept separately; scenes have few).
    """
    v = np.asarray(vertices)
    t = np.asarray(tris)
    mask = np.asarray(tri_mask)
    ids = np.nonzero(mask)[0].astype(np.int32)
    if len(ids) == 0:
        return np.full((1, cluster_size), -1, np.int32)
    centers = v[t[ids]].mean(axis=1)

    if use_native:
        from cge_tpu import native as cge_native
        perm = cge_native.build_clusters_native(centers, cluster_size)
        if perm is not None:
            return np.where(perm >= 0, ids[np.maximum(perm, 0)], -1)

    clusters: list = []

    def rec_split(positions):
        if len(positions) <= cluster_size:
            clusters.append(positions)
            return
        c = centers[positions]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        # split at the cluster-size multiple nearest the median so every
        # left descendant fills its cluster completely (pure median leaves
        # ~59% occupancy at dragon scale — 41% of dense-tile work on pad
        # rows); mirrors the native builder's rule exactly
        n = len(positions)
        mid = (n // 2 + cluster_size // 2) // cluster_size * cluster_size
        mid = max(cluster_size, min(mid, (n - 1) // cluster_size
                                    * cluster_size))
        part = np.argpartition(c[:, axis], mid)
        rec_split(positions[part[:mid]])
        rec_split(positions[part[mid:]])

    rec_split(np.arange(len(ids)))
    L = len(clusters)
    perm = np.full((L, cluster_size), -1, np.int32)
    for i, cl in enumerate(clusters):
        perm[i, : len(cl)] = ids[cl]
    return perm
