"""Acceleration structures + tracer dispatch.

Two tracers share one contract; the dispatch is on the *static* scene
size, so each scene jits exactly one of them:

  * dense planar sweep (ops/dense_trace) — VPU-bound, zero gathers,
    one-hot MXU attribute extraction; wins for small/medium scenes,
  * threaded-BVH wavefront traversal (accel/traverse) — O(log n) node
    visits per ray; wins for large scenes despite TPU gather cost.

`trace` returns (t, prim); `trace_shaded` additionally returns
barycentrics and the packed (32, N) shading attributes (scene/packs.py).
Planar convention: rays are (3, N).
"""

import jax.numpy as jnp

DENSE_MAX_PRIMS = 4096


def trace(scene, origin, direction):
    """Planar closest-hit: origin/direction (3, N) -> (t, prim)."""
    if scene.n_prims <= DENSE_MAX_PRIMS:
        from ti_raytrace_tpu.ops.dense_trace import trace_planar

        return trace_planar(scene, origin, direction)
    from ti_raytrace_tpu.accel.traverse import trace_closest

    t, prim = trace_closest(
        scene, jnp.swapaxes(origin, 0, 1), jnp.swapaxes(direction, 0, 1)
    )
    return t, prim


def trace_shaded(scene, origin, direction):
    """Planar closest-hit + shading pack -> (t, prim, uv_bary, attr)."""
    if scene.n_prims <= DENSE_MAX_PRIMS:
        from ti_raytrace_tpu.ops.dense_trace import trace_shaded as _dense

        return _dense(scene, origin, direction)

    # BVH path: gather the attribute columns of the winning prims
    from ti_raytrace_tpu.accel.traverse import trace_closest
    from ti_raytrace_tpu.ops import planar as pv

    t, prim = trace_closest(
        scene, jnp.swapaxes(origin, 0, 1), jnp.swapaxes(direction, 0, 1)
    )
    pid = jnp.clip(prim, 0, scene.n_prims - 1)
    attr = scene.prim_attr[:, pid]  # (32, N) column gather
    attr = jnp.where((prim >= 0)[None, :], attr, 0.0)

    # barycentrics of the winning triangle for attribute interpolation
    v0 = jnp.swapaxes(scene.tri_v0[pid], 0, 1)
    e1 = jnp.swapaxes(scene.tri_e1[pid], 0, 1)
    e2 = jnp.swapaxes(scene.tri_e2[pid], 0, 1)
    p = pv.cross(direction, e2)
    det = pv.dot(e1, p)
    s = jnp.sign(det)
    adet = jnp.abs(det)
    tv = origin - v0
    u = pv.dot(tv, p) * s
    q = pv.cross(tv, e1)
    v = pv.dot(direction, q) * s
    inv = 1.0 / jnp.where(adet > 1e-12, adet, 1.0)
    uv = jnp.stack([u * inv, v * inv])
    return t, prim, uv, attr
