"""Pallas TPU kernel: ray-tile x cluster-stream closest-hit traversal.

For scenes too large for the dense sweep, this kernel implements a
two-phase cluster traversal (accel/clusters.py) entirely in VMEM:

  grid over ray tiles (TILE rays per program);
  phase 1 (broad): slab-test the tile against every cluster AABB in
    dense (TILE, CHUNK) column-layout passes, accumulating per-cluster
    tile hit counts (via an MXU contraction into sublane-indexable
    scratch) and a per-ray any-box flag;
  phase 2 (narrow): walk the clusters FRONT-TO-BACK in a per-tile order
    precomputed outside the kernel (distance from the tile's bounding
    sphere to each cluster box — a conservative lower bound on any tile
    ray's entry distance).  Entered clusters (`pl.when` on the tile
    count) run a (TILE, B) Möller-Trumbore block; the loop EXITS as soon
    as every ray that can still hit anything has a hit closer than the
    next cluster's entry lower bound — typical tiles touch a handful of
    clusters instead of all of them.

No per-lane gathers, no pointer chasing, no stacks.  Ray coherence is
restored per bounce by sorting the wavefront on a morton key of
(origin, direction octant); terminated rays are parked far away, so
all-dead tiles fall through the broad phase and exit immediately.

Layout notes: rays (N, 8) rows [ox oy oz dx dy dz * *] in TILE blocks;
cluster bounds (8, C) planar; triangle blocks (12, C*B) planar; per-tile
order/entry tables (C, n_tiles) sliced (C, 1) per program so scalar
reads index the sublane dim.  Output (TILE, 8): [t, prim, u, v, 0...].
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ti_raytrace_tpu.core import constants as C

TILE = 1024
BROAD_CHUNK = 128  # clusters slab-tested per dense broad-phase pass


def _kernel(rays_ref, cb_ref, tri_ref, order_ref, entry_ref, out_ref,
            best_ref, counts_ref, maxfar_ref, done_ref, visited_ref,
            *, n_clusters, block):
    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    dx = rays_ref[:, 3:4]
    dy = rays_ref[:, 4:5]
    dz = rays_ref[:, 5:6]

    def safe_inv(v):
        return 1.0 / jnp.where(jnp.abs(v) < 1e-12, jnp.where(v >= 0, 1e-12, -1e-12), v)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    best_ref[:, 0:1] = jnp.full_like(ox, C.INF)      # t
    best_ref[:, 1:2] = jnp.full_like(ox, -1.0)       # prim id
    best_ref[:, 2:3] = jnp.zeros_like(ox)            # u
    best_ref[:, 3:4] = jnp.zeros_like(ox)            # v
    maxfar_ref[:, :] = jnp.full_like(ox, -C.INF)
    done_ref[0] = jnp.int32(0)
    visited_ref[0] = jnp.int32(0)

    n_chunks = n_clusters // BROAD_CHUNK
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, BROAD_CHUNK), 1)
    tri_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, block), 1)
    ones_col = jnp.ones((TILE, 1), jnp.float32)

    # ---- broad phase: geometric slab test of every cluster ------------
    def chunk_body(ci, _):
        base = ci * BROAD_CHUNK
        sl = pl.ds(base, BROAD_CHUNK)
        t1x = (cb_ref[0:1, sl] - ox) * ix
        t2x = (cb_ref[3:4, sl] - ox) * ix
        tn = jnp.minimum(t1x, t2x)
        tf = jnp.maximum(t1x, t2x)
        t1y = (cb_ref[1:2, sl] - oy) * iy
        t2y = (cb_ref[4:5, sl] - oy) * iy
        tn = jnp.maximum(tn, jnp.minimum(t1y, t2y))
        tf = jnp.minimum(tf, jnp.maximum(t1y, t2y))
        t1z = (cb_ref[2:3, sl] - oz) * iz
        t2z = (cb_ref[5:6, sl] - oz) * iz
        tn = jnp.maximum(tn, jnp.minimum(t1z, t2z))
        tf = jnp.minimum(tf, jnp.maximum(t1z, t2z))

        valid_cluster = lane_iota < (n_clusters - base)
        hit = (jnp.maximum(tn, 0.0) <= tf) & valid_cluster

        hit_f = hit.astype(jnp.float32)
        counts_col = jax.lax.dot_general(
            hit_f, ones_col, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CHUNK, 1)
        counts_ref[pl.ds(base, BROAD_CHUNK), :] = counts_col
        # farthest box exit per ray: no hit can lie beyond it, so a ray
        # is settled once the front-to-back sweep passes this bound
        far = jnp.where(hit, tf, -C.INF)
        maxfar_ref[:, :] = jnp.maximum(
            maxfar_ref[:, :], jnp.max(far, axis=1, keepdims=True)
        )
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    # ---- narrow phase: front-to-back over the per-tile cluster order --
    def cluster_cond(j):
        return (j < n_clusters) & (done_ref[0] == 0)

    def cluster_body(j, _):
        if True:
            cid = order_ref[0, 0, j]
            cnt = counts_ref[cid, 0]
            visited_ref[0] = visited_ref[0] + jnp.where(cnt > 0.0, 1, 0).astype(jnp.int32)

            @pl.when(cnt > 0.0)
            def _():
                tbase = pl.multiple_of(cid * block, 128)
                tsl = pl.ds(tbase, block)
                v0x = tri_ref[0:1, tsl]
                v0y = tri_ref[1:2, tsl]
                v0z = tri_ref[2:3, tsl]
                e1x = tri_ref[3:4, tsl]
                e1y = tri_ref[4:5, tsl]
                e1z = tri_ref[5:6, tsl]
                e2x = tri_ref[6:7, tsl]
                e2y = tri_ref[7:8, tsl]
                e2z = tri_ref[8:9, tsl]
                pid = tri_ref[9:10, tsl]

                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                sgn = jnp.sign(det)
                adet = jnp.abs(det)
                tx = ox - v0x
                ty = oy - v0y
                tz = oz - v0z
                u = (tx * px + ty * py + tz * pz) * sgn
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (dx * qx + dy * qy + dz * qz) * sgn
                t = (e2x * qx + e2y * qy + e2z * qz) * sgn
                ok = (
                    (adet > 1e-12)
                    & (u >= 0.0)
                    & (u <= adet)
                    & (v >= 0.0)
                    & (u + v <= adet)
                )
                inv = 1.0 / jnp.where(adet > 1e-12, adet, 1.0)
                t = jnp.where(ok, t * inv, C.INF)
                t = jnp.where(t > 0.0, t, C.INF)

                tmin = jnp.min(t, axis=1, keepdims=True)          # (TILE,1)
                closer = tmin < best_ref[:, 0:1]
                arg = jnp.argmin(t, axis=1).astype(jnp.int32)      # (TILE,)
                onehot = (tri_iota == arg[:, None]).astype(jnp.float32)
                pid_win = jnp.sum(onehot * pid, axis=1, keepdims=True)
                u_win = jnp.sum(onehot * (u * inv), axis=1, keepdims=True)
                v_win = jnp.sum(onehot * (v * inv), axis=1, keepdims=True)

                best_ref[:, 0:1] = jnp.where(closer, tmin, best_ref[:, 0:1])
                best_ref[:, 1:2] = jnp.where(closer, pid_win, best_ref[:, 1:2])
                best_ref[:, 2:3] = jnp.where(closer, u_win, best_ref[:, 2:3])
                best_ref[:, 3:4] = jnp.where(closer, v_win, best_ref[:, 3:4])

            # conservative early exit (checked every 4th cluster): a ray
            # is settled once min(best_t, farthest box exit) is closer
            # than the next cluster's entry lower bound — it can neither
            # improve its hit nor touch any remaining box
            @pl.when((j % 4 == 3) | (j + 1 >= n_clusters))
            def _():
                nxt = jnp.minimum(j + 1, n_clusters - 1)
                next_entry = entry_ref[0, 0, nxt]
                bound = jnp.minimum(best_ref[:, 0:1], maxfar_ref[:, 0:1])
                bm = jnp.max(bound)
                done_ref[0] = jnp.where(
                    (bm < next_entry) | (j + 1 >= n_clusters), 1, done_ref[0]
                ).astype(jnp.int32)

        return j + 1, 0

    # while_loop: iterations stop at the exit instead of spinning
    def wl_cond(state):
        j, _ = state
        return cluster_cond(j)

    def wl_body(state):
        j, x = state
        return cluster_body(j, x)

    jax.lax.while_loop(wl_cond, wl_body, (jnp.int32(0), 0))

    out_ref[:, 0:4] = best_ref[:, 0:4]
    # diagnostics: row 4 = clusters visited by this tile's narrow phase
    out_ref[:, 4:8] = jnp.zeros_like(out_ref[:, 4:8])
    out_ref[:, 4:5] = jnp.broadcast_to(
        visited_ref[0].astype(jnp.float32), out_ref[:, 4:5].shape
    )


@functools.partial(jax.jit, static_argnames=("n_clusters", "block", "interpret"))
def _run_kernel(rays, cb, tri, order_t, entry_t, n_clusters: int, block: int,
                interpret: bool):
    n_pad = rays.shape[0]
    grid = n_pad // TILE
    return pl.pallas_call(
        functools.partial(_kernel, n_clusters=n_clusters, block=block),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, n_clusters), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, n_clusters), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec((TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE, 8), jnp.float32),       # best
            pltpu.VMEM((n_clusters, 1), jnp.float32),  # counts
            pltpu.VMEM((TILE, 1), jnp.float32),        # per-ray farthest box
            pltpu.SMEM((1,), jnp.int32),               # done flag
            pltpu.SMEM((1,), jnp.int32),               # visited counter
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rays, cb, tri, order_t, entry_t)


def _coherence_key(scene, o, d):
    """Sort key restoring ray-tile spatial coherence: 21-bit morton of the
    origin within the scene bounds + 3-bit direction octant.  Bounced
    wavefronts are incoherent; sorting them groups rays that will enter
    the same clusters into the same tile (and parks terminated rays —
    origins far outside — into all-dead tiles that cost nothing)."""
    from ti_raytrace_tpu.utils.morton import morton3d

    lo = scene.aabb_min
    span = jnp.maximum(scene.aabb_max - scene.aabb_min, 1e-12)
    q = [(o[k] - lo[k]) / span[k] for k in range(3)]
    code = morton3d(q[0], q[1], q[2]) >> 9  # 21 bits of spatial locality
    key = code
    for k in range(3):
        key = (key << 1) | (d[k] > 0).astype(jnp.uint32)
    return key


def _tile_order(rays, n_tiles, cb, n_clusters):
    """Per-tile front-to-back cluster order + conservative entry bounds.

    For each tile: bound its ray origins with a sphere, order clusters by
    point-to-box distance from the sphere centre, and lower-bound every
    ray's box entry by (distance - radius).  Returns (order (C, n_tiles)
    int32, entry (C, n_tiles) f32 sorted ascending per tile)."""
    org = rays[:, 0:3].reshape(n_tiles, TILE, 3)
    cent = jnp.mean(org, axis=1)                                   # (T,3)
    radius = jnp.sqrt(
        jnp.max(jnp.sum((org - cent[:, None, :]) ** 2, axis=-1), axis=1)
    )                                                              # (T,)
    bmin = cb[0:3, :n_clusters].T                                  # (C,3)
    bmax = cb[3:6, :n_clusters].T
    p = jnp.clip(cent[:, None, :], bmin[None], bmax[None])
    dist = jnp.sqrt(jnp.sum((p - cent[:, None, :]) ** 2, axis=-1))  # (T,C)
    entry = jnp.maximum(dist - radius[:, None], 0.0)
    order = jnp.argsort(entry, axis=1).astype(jnp.int32)
    entry_sorted = jnp.take_along_axis(entry, order, axis=1)
    # (n_tiles, 1, C): per-tile SMEM rows (the extra axis satisfies the
    # TPU block-shape rule: last two block dims equal the array dims)
    return order[:, None, :], entry_sorted[:, None, :]


def trace_clustered(
    scene, o, d, interpret: bool = False, sort_rays: bool = True,
):
    """Closest hit via the cluster kernel + dense analytic-shape tail.

    o, d: planar (3, N).  Returns (t, prim, uv_bary (2,N)).
    """
    N = o.shape[1]
    n_pad = ((N + TILE - 1) // TILE) * TILE
    rays = jnp.zeros((n_pad, 8), jnp.float32)
    rays = rays.at[:N, 0:3].set(jnp.swapaxes(o, 0, 1))
    rays = rays.at[:N, 3:6].set(jnp.swapaxes(d, 0, 1))
    # padding rays: direction 0 -> safe_inv makes them miss everything

    if sort_rays:
        key = _coherence_key(scene, o, d)
        key = jnp.pad(key, (0, n_pad - N), constant_values=jnp.uint32(0xFFFFFFFF))
        idx = jnp.arange(n_pad, dtype=jnp.int32)
        _, order = jax.lax.sort((key, idx), num_keys=1, is_stable=True)
        rays = jnp.take(rays, order, axis=0)

    cb = scene.cluster_bounds
    tri = scene.cluster_tri
    n_clusters = int(cb.shape[1])
    block = int(tri.shape[1]) // n_clusters

    n_tiles = n_pad // TILE
    order_t, entry_t = _tile_order(rays, n_tiles, cb, n_clusters)

    out = _run_kernel(rays, cb, tri, order_t, entry_t, n_clusters, block, interpret)
    if sort_rays:
        inv = jnp.zeros((n_pad,), jnp.int32).at[order].set(
            jnp.arange(n_pad, dtype=jnp.int32)
        )
        out = jnp.take(out, inv, axis=0)
    t = out[:N, 0]
    prim = out[:N, 1].astype(jnp.int32)
    uv = jnp.swapaxes(out[:N, 2:4], 0, 1)

    # analytic shapes: dense tail over the (few) PRIM_SHAPE prims
    P = scene.n_prims
    T_est = scene.vtx_pos.shape[0] // 3
    for pid in range(min(T_est, P), P):
        sid = jnp.clip(scene.prim_vidx[pid], 0, scene.shape_type.shape[0] - 1)
        stype = scene.shape_type[sid]
        centre = scene.shape_pos[sid]
        radius = scene.shape_param[sid, 0]
        ocx = centre[0] - o[0]
        ocy = centre[1] - o[1]
        ocz = centre[2] - o[2]
        oc2 = ocx * ocx + ocy * ocy + ocz * ocz
        dop = d[0] * ocx + d[1] * ocy + d[2] * ocz
        disc2 = oc2 - dop * dop
        a = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        b = -2.0 * dop
        cc = oc2 - radius * radius
        discr = jnp.maximum(b * b - 4.0 * a * cc, 0.0)
        ts = (-b - jnp.sqrt(discr)) / (2.0 * jnp.maximum(a, 1e-12))
        hit = (
            (stype == C.SHAPE_SPHERE) & (disc2 < radius * radius) & (ts > 0.0) & (ts < t)
        )
        t = jnp.where(hit, ts, t)
        prim = jnp.where(hit, pid, prim)
        uv = jnp.where(hit[None, :], 0.0, uv)

    return t, prim, uv
