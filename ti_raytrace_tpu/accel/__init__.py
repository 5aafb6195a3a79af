"""Acceleration structures + tracer dispatch.

Three tracers share one contract; dispatch is on the *static* scene
size, so each scene jits exactly one of them:

  * dense planar sweep (ops/dense_trace) — VPU-bound, zero gathers,
    one-hot MXU attribute extraction; wins for small scenes;
  * cluster-stream Pallas kernel (ops/cluster_trace) — ray tiles vs
    morton-ordered triangle clusters, VMEM-resident; the production
    tracer for large scenes;
  * threaded-BVH wavefront traversal (accel/traverse) — the pure-XLA
    reference implementation, kept as the oracle for tests.

`trace` returns (t, prim); `trace_shaded` additionally returns
barycentrics and the packed (32, N) shading attributes (scene/packs.py).
Planar convention: rays are (3, N).
"""

import jax
import jax.numpy as jnp

DENSE_MAX_PRIMS = 4096


def _interpret() -> bool:
    return jax.local_devices()[0].platform != "tpu"


def trace(scene, origin, direction):
    """Planar closest-hit: origin/direction (3, N) -> (t, prim)."""
    if scene.n_prims <= DENSE_MAX_PRIMS:
        from ti_raytrace_tpu.ops.dense_trace import trace_planar

        return trace_planar(scene, origin, direction)
    from ti_raytrace_tpu.ops.cluster_trace import trace_clustered

    t, prim, _ = trace_clustered(scene, origin, direction, interpret=_interpret())
    return t, prim


def trace_shaded(scene, origin, direction):
    """Planar closest-hit + shading pack -> (t, prim, uv_bary, attr)."""
    if scene.n_prims <= DENSE_MAX_PRIMS:
        from ti_raytrace_tpu.ops.dense_trace import trace_shaded as _dense

        return _dense(scene, origin, direction)

    from ti_raytrace_tpu.ops.cluster_trace import trace_clustered

    t, prim, uv = trace_clustered(scene, origin, direction, interpret=_interpret())
    # one column gather for the winning prims' packed attributes
    pid = jnp.clip(prim, 0, scene.n_prims - 1)
    attr = scene.prim_attr[:, pid]
    attr = jnp.where((prim >= 0)[None, :], attr, 0.0)
    return t, prim, uv, attr
