"""Debug AOV integrator: single-bounce viewer (reference integrator/Debug.py).

The default AOV is the flat material color (Debug.py:65); the commented
normal variants of the reference (Debug.py:62-64) are selectable here.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ti_raytrace_tpu.accel import trace
from ti_raytrace_tpu.camera import CameraSpec, ray_directions, ray_origins
from ti_raytrace_tpu.core import constants as C
from ti_raytrace_tpu.scene.intersect import hit_attributes
from ti_raytrace_tpu.utils.geometry import faceforward


@partial(jax.jit, static_argnames=("spec", "aov"))
def render_frame(scene, spec: CameraSpec, cam, frame, key, aov: str = "albedo"):
    """One AOV frame; returns (W, H, 3) radiance (no accumulation,
    like the reference Debug which overwrites hdr every frame)."""
    o = ray_origins(spec, cam)
    d = ray_directions(spec, cam, frame, key)
    t, prim = trace(scene, o, d)
    at = hit_attributes(scene, o, d, t, prim)
    hit = at["valid"]

    if aov == "albedo":
        img = scene.mat_color[at["mat_id"]]
    elif aov == "normal":
        img = (at["normal"] + 1.0) * 0.5
    elif aov == "gnormal":
        img = (at["gnormal"] + 1.0) * 0.5
    elif aov == "fnormal":
        fn = faceforward(at["normal"], -d, at["gnormal"])
        img = (fn + 1.0) * 0.5
    elif aov == "depth":
        img = jnp.repeat((t / jnp.maximum(jnp.max(jnp.where(hit, t, 0.0)), 1e-6))[:, None], 3, -1)
    elif aov == "prim":
        img = jnp.stack(
            [
                (prim % 7).astype(jnp.float32) / 7.0,
                (prim % 13).astype(jnp.float32) / 13.0,
                (prim % 17).astype(jnp.float32) / 17.0,
            ],
            axis=-1,
        )
    else:
        raise ValueError(f"unknown aov {aov!r}")

    img = jnp.where(hit[:, None], img, jnp.zeros_like(img))
    return img.reshape(spec.width, spec.height, 3)
