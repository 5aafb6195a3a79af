"""Debug AOV integrator: single-bounce viewer (reference integrator/Debug.py).

The default AOV is the flat material color (Debug.py:65); the commented
normal variants of the reference (Debug.py:62-64) are selectable here,
plus depth and primitive-id false color.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ti_raytrace_tpu.accel import trace_shaded
from ti_raytrace_tpu.camera import CameraSpec, ray_directions, ray_origins
from ti_raytrace_tpu.ops import planar as pv
from ti_raytrace_tpu.ops.shading import decode_hit


@partial(jax.jit, static_argnames=("spec", "aov"))
def render_frame(scene, spec: CameraSpec, cam, frame, key, aov: str = "albedo"):
    """One AOV frame; returns (W, H, 3) radiance (no accumulation,
    like the reference Debug which overwrites hdr every frame)."""
    o = jnp.swapaxes(ray_origins(spec, cam), 0, 1)
    d = jnp.swapaxes(ray_directions(spec, cam, frame, key), 0, 1)
    t, prim, uv_bary, attr = trace_shaded(scene, o, d)
    hit = decode_hit(o, d, t, prim, uv_bary, attr)

    if aov == "albedo":
        img = hit.mat_color
    elif aov == "normal":
        img = (hit.normal + 1.0) * 0.5
    elif aov == "gnormal":
        img = (hit.gnormal + 1.0) * 0.5
    elif aov == "fnormal":
        fn = pv.faceforward(hit.normal, -d, hit.gnormal)
        img = (fn + 1.0) * 0.5
    elif aov == "depth":
        norm = t / jnp.maximum(jnp.max(jnp.where(hit.valid, t, 0.0)), 1e-6)
        img = jnp.broadcast_to(norm[None, :], (3,) + norm.shape)
    elif aov == "prim":
        img = jnp.stack(
            [
                (prim % 7).astype(jnp.float32) / 7.0,
                (prim % 13).astype(jnp.float32) / 13.0,
                (prim % 17).astype(jnp.float32) / 17.0,
            ],
            axis=0,
        )
    else:
        raise ValueError(f"unknown aov {aov!r}")

    img = jnp.where(hit.valid[None, :], img, jnp.zeros_like(img))
    return jnp.swapaxes(img, 0, 1).reshape(spec.width, spec.height, 3)
