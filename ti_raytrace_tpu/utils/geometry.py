"""Ray/geometry helpers: robust AABB slabs test, integer-ulp ray offset,
refraction, Fresnel, dispersion.  Vectorized re-designs of
UtilsFunc.py:390-523 in the reference.
"""

import jax
import jax.numpy as jnp

from ti_raytrace_tpu.core.constants import INF
from ti_raytrace_tpu.utils import vec


def slabs(origin, direction, box_min, box_max, t_max=INF):
    """Ray-AABB slab test (reference UtilsFunc.py:495-523), branch-free.

    Accepts hits with interval overlap in [0, t_max].  Also returns the
    entry distance, enabling near-child-first ordered traversal (an
    optimization the reference does not do).
    Shapes broadcast: origin/direction (..., 3), box_min/box_max (..., 3).
    """
    # IEEE: 1/0 = inf gives correct open-interval behavior; the axis-parallel
    # degenerate case of the reference's epsilon guard is subsumed.
    inv_d = 1.0 / jnp.where(jnp.abs(direction) < 1e-12,
                            jnp.where(direction >= 0, 1e-12, -1e-12),
                            direction)
    t1 = (box_min - origin) * inv_d
    t2 = (box_max - origin) * inv_d
    t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)
    t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
    t_entry = jnp.maximum(t_near, 0.0)
    hit = (t_entry <= t_far) & (t_near <= t_max)
    return hit, t_entry


def offset_ray(p, n):
    """Self-intersection-safe ray origin offset, Ray Tracing Gems ch. 6
    style integer-ulp walk along the normal (reference UtilsFunc.py:441-461).
    """
    int_scale = 256.0
    float_scale = 1.0 / 2048.0
    origin = 1.0 / 256.0

    p = jnp.asarray(p, jnp.float32)
    i_of = (int_scale * n).astype(jnp.int32)
    i_p = jax.lax.bitcast_convert_type(p, jnp.int32)
    i_p = jnp.where(p < 0.0, i_p - i_of, i_p + i_of)
    f_p = jax.lax.bitcast_convert_type(i_p, jnp.float32)
    return jnp.where(jnp.abs(p) < origin, p + float_scale * n, f_p)


def refract(in_dir, n, eta):
    """Snell refraction (reference UtilsFunc.py:418-426).
    in_dir points toward the surface; n opposes in_dir.
    Returns (refracted_dir, success_mask)."""
    n_dot_i = vec.dot3(n, in_dir)
    k = 1.0 - eta * eta * (1.0 - n_dot_i * n_dot_i)
    ok = k[..., 0] > 0.0
    r = eta * in_dir - (eta * n_dot_i + jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return jnp.where(ok[..., None], r, jnp.zeros_like(r)), ok


def schlick(cosine, ior):
    """Schlick Fresnel for a dielectric interface (UtilsFunc.py:429-432)."""
    r0 = (1.0 - ior) / (1.0 + ior)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * jnp.power(jnp.maximum(1.0 - cosine, 0.0), 5.0)


def faceforward(n, i, nref):
    """Flip shading normal n to the hemisphere of i w.r.t. geometric normal
    nref (UtilsFunc.py:465-467)."""
    s = vec.sign_nonzero(vec.dot3(i, nref))
    return s * n


def bk7_ior(lambda_nm):
    """BK7 Sellmeier dispersion curve (UtilsFunc.py:480-484);
    lambda in nanometers."""
    lam = lambda_nm / 1000.0
    l2 = lam * lam
    return jnp.sqrt(
        1.0
        + 1.03961212 * l2 / (l2 - 0.00600069867)
        + 0.231792344 * l2 / (l2 - 0.0200179144)
        + 1.01046945 * l2 / (l2 - 103.560653)
    )
