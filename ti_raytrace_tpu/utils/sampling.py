"""Monte-Carlo sampling primitives, vectorized over wavefronts.

Covers the reference's sampling toolbox (UtilsFunc.py:322-387 and
Scene.UniformSampleSphere at Scene.py:316-322).  All functions take uniform
random numbers as explicit arguments — RNG state never hides inside the
sampler, which is what makes frames deterministic and shardable.
"""

import jax.numpy as jnp

from ti_raytrace_tpu.core.constants import PI
from ti_raytrace_tpu.utils import vec


def map_to_disk(u1, u2):
    """Concentric square->disk map (UtilsFunc.py:322-345).
    Returns (r, phi)."""
    a = 2.0 * u1 - 1.0
    b = 2.0 * u2 - 1.0
    abs_a, abs_b = jnp.abs(a), jnp.abs(b)
    # Quadrant-select without data-dependent branches.
    use_a = abs_a > abs_b
    r = jnp.where(use_a, abs_a, abs_b)
    safe_a = jnp.where(a == 0.0, 1.0, a)
    safe_b = jnp.where(b == 0.0, 1.0, b)
    phi = jnp.where(
        use_a,
        (PI / 4.0) * (b / safe_a) + jnp.where(a < 0.0, PI, 0.0),
        (PI / 4.0) * (2.0 - a / safe_b) + jnp.where(b < 0.0, PI, 0.0),
    )
    phi = jnp.where(r == 0.0, 0.0, phi)
    return r, phi


def cosine_hemisphere_pdf(cos_theta):
    """pdf floor of 0.01 kept from the reference (UtilsFunc.py:349-350) —
    it bounds the NEE weight for grazing light samples."""
    return jnp.maximum(0.01, cos_theta / PI)


def cosine_sample_hemisphere(u1, u2):
    """(UtilsFunc.py:353-360): z-up local frame."""
    r = jnp.sqrt(u1)
    phi = 2.0 * PI * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    p = jnp.stack([x, y, z], axis=-1)
    return vec.normalize(p)


def cosine_sample_hemisphere_pdf(u1, u2):
    p = cosine_sample_hemisphere(u1, u2)
    return p, cosine_hemisphere_pdf(p[..., 2])


def uniform_sample_sphere(u1, u2):
    """(Scene.py:316-322)."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    phi = 2.0 * PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def onb(n):
    """Build the reference's tangent frame (UtilsFunc.py:374-387).
    Returns (tangent, binormal) for normal n; n need not be unit."""
    n = vec.normalize(n)
    use_x = jnp.abs(n[..., 0:1]) > jnp.abs(n[..., 2:3])
    b = jnp.where(
        use_x,
        jnp.stack([-n[..., 1], n[..., 0], jnp.zeros_like(n[..., 0])], -1),
        jnp.stack([jnp.zeros_like(n[..., 0]), -n[..., 2], n[..., 1]], -1),
    )
    b = vec.normalize(b)
    t = vec.normalize(vec.cross(b, n))
    return t, b


def to_world(local_dir, n):
    """Transform a z-up local direction into the frame around n
    (UtilsFunc.py:374-387 `inverse_transform`)."""
    n_unit = vec.normalize(n)
    t, b = onb(n)
    return (
        local_dir[..., 0:1] * t
        + local_dir[..., 1:2] * b
        + local_dir[..., 2:3] * n_unit
    )


def power_heuristic(a, b):
    """Veach beta=2 power heuristic (UtilsFunc.py:436-438)."""
    t = a * a
    return t / jnp.maximum(b * b + t, 1e-20)
