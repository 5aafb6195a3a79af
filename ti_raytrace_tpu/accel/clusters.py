"""Cluster acceleration structure: morton-ordered triangle blocks.

The TPU-native replacement for deep-tree traversal on large scenes.
Primitives are sorted by the morton code of their centroid (the same
spatial ordering the LBVH build uses, accel/lbvh.py) and chopped into
fixed-size clusters of B triangles.  Each cluster stores its AABB and a
planar (12, B) triangle block:

  rows 0:2 v0, 3:5 e1, 6:8 e2, 9 prim_id (float), 10:11 pad

Traversal (ops/cluster_trace.py) is then a two-phase streaming sweep:
per ray-tile, slab-test all cluster AABBs (dense VPU work), and run the
Möller-Trumbore block only for clusters some ray in the tile entered —
the TPU analogue of a 2-level BVH with the tree replaced by a dense,
branch-free broad phase.

Analytic-shape primitives are excluded (handled by a dense tail pass);
padding triangles are degenerate (e1 = e2 = 0 -> zero determinant ->
guaranteed miss).
"""

import numpy as np

from ti_raytrace_tpu.core import constants as C

CLUSTER_B = 128  # triangles per cluster
TRI_ROWS = 12
CHUNK_PAD = 128  # cluster count padded to this multiple: the traversal
                 # kernel slices bounds in CHUNK_PAD chunks, and an
                 # out-of-bounds dynamic slice would clamp + misalign


def _expand_bits_np(x):
    x = x.astype(np.uint32)
    x = (x | (x << 16)) & np.uint32(0x030000FF)
    x = (x | (x << 8)) & np.uint32(0x0300F00F)
    x = (x | (x << 4)) & np.uint32(0x030C30C3)
    x = (x | (x << 2)) & np.uint32(0x09249249)
    return x


def _morton3d_np(q):
    qi = np.clip(q * 1024.0, 0.0, 1023.0).astype(np.uint32)
    return (
        _expand_bits_np(qi[:, 0])
        | (_expand_bits_np(qi[:, 1]) << 1)
        | (_expand_bits_np(qi[:, 2]) << 2)
    )


def _median_split_order(pmin, pmax, block: int) -> np.ndarray:
    """Recursive longest-axis median split into runs of <= block tris.

    Produces tighter cluster boxes than fixed morton-range slicing (the
    split adapts to the geometry), which directly cuts the number of
    clusters a ray tile enters during traversal."""
    n = pmin.shape[0]
    centroid = 0.5 * (pmin + pmax)
    order = np.arange(n)
    out = []
    stack = [order]
    while stack:
        ids = stack.pop()
        if ids.shape[0] <= block:
            out.append(ids)
            continue
        c = centroid[ids]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        half = (ids.shape[0] // (2 * block) + (ids.shape[0] % (2 * block) > 0)) * block
        half = min(half, ids.shape[0] - 1)
        part = np.argpartition(c[:, axis], half)
        stack.append(ids[part[half:]])
        stack.append(ids[part[:half]])
    # left-to-right: internal splits are block multiples, so every leaf
    # except the global tail starts at a block-aligned offset and clusters
    # never straddle leaf boundaries
    return np.concatenate(out)


def build_clusters(host: dict, block: int = CLUSTER_B) -> dict:
    """Build cluster arrays from the host scene dict.

    Returns dict(cluster_bounds (8, C), cluster_tri (TRI_ROWS, C*block),
    cluster_attr (C*block, A) — prim_attr columns in cluster-slot order so
    the traversal kernel extracts the winner's shading pack with a one-hot
    MXU matmul instead of an HBM gather).
    Always at least one cluster (degenerate if the scene has no tris).
    """
    ptype = host["prim_type"]
    A = host["prim_attr"].shape[0]
    tri_ids = np.nonzero(ptype == C.PRIM_TRI)[0]
    T = tri_ids.shape[0]

    if T == 0:
        bounds = _empty_bounds(CHUNK_PAD)
        tri = np.zeros((TRI_ROWS, CHUNK_PAD * block), np.float32)
        tri[9, :] = -1.0
        attr = np.zeros((CHUNK_PAD * block, A), np.float32)
        return dict(cluster_bounds=bounds, cluster_tri=tri, cluster_attr=attr)

    v0 = host["tri_v0"][tri_ids]
    e1 = host["tri_e1"][tri_ids]
    e2 = host["tri_e2"][tri_ids]
    v1 = v0 + e1
    v2 = v0 + e2
    pmin = np.minimum(np.minimum(v0, v1), v2)
    pmax = np.maximum(np.maximum(v0, v1), v2)
    centroid = 0.5 * (pmin + pmax)
    lo = centroid.min(0)
    hi = centroid.max(0)
    # median-split ordering (tighter boxes); morton kept as fallback
    try:
        order = _median_split_order(pmin, pmax, block)
    except Exception:
        codes = None
        try:  # native fast path (native/tiray_native.cpp)
            from ti_raytrace_tpu.io.native import morton3d_native

            codes = morton3d_native(centroid, lo, hi)
        except Exception:
            codes = None
        if codes is None:
            q = (centroid - lo) / np.maximum(hi - lo, 1e-12)
            codes = _morton3d_np(q)
        order = np.argsort(codes, kind="stable")

    sorted_ids = tri_ids[order]
    n_clusters = (T + block - 1) // block
    n_clusters = ((n_clusters + CHUNK_PAD - 1) // CHUNK_PAD) * CHUNK_PAD
    P_pad = n_clusters * block

    tri = np.zeros((TRI_ROWS, P_pad), np.float32)
    tri[0:3, :T] = v0[order].T
    tri[3:6, :T] = e1[order].T
    tri[6:9, :T] = e2[order].T
    tri[9, :T] = sorted_ids.astype(np.float32)
    tri[9, T:] = -1.0

    attr = np.zeros((P_pad, A), np.float32)
    attr[:T] = host["prim_attr"][:, sorted_ids].T

    bounds = _empty_bounds(n_clusters)
    bmin = pmin[order]
    bmax = pmax[order]
    n_real = (T + block - 1) // block
    for c in range(n_real):
        s = slice(c * block, min((c + 1) * block, T))
        bounds[0:3, c] = bmin[s].min(0)
        bounds[3:6, c] = bmax[s].max(0)
    bounds[6, :n_real] = 1.0
    return dict(cluster_bounds=bounds, cluster_tri=tri, cluster_attr=attr)


def _empty_bounds(n: int) -> np.ndarray:
    """Padding-cluster bounds.  IMPORTANT: a branchless slab test cannot
    represent 'never hit' with min > max — the per-axis [min(t1,t2),
    max(t1,t2)] intervals make box [1,-1] behave exactly like [-1,1], a
    unit box at the origin that rays through the scene centre 'hit'.
    Row 6 is an explicit validity flag the traversal masks on; the inf
    extents additionally keep padding out of supercluster boxes."""
    bounds = np.zeros((8, n), np.float32)
    bounds[0:3, :] = 1e30
    bounds[3:6, :] = -1e30
    bounds[6, :] = 0.0  # invalid
    return bounds
