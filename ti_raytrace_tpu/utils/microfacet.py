"""Microfacet / Fresnel toolbox used by the Disney BRDF.

Vectorized equivalents of reference UtilsFunc.py:390-415.
"""

import jax.numpy as jnp

from ti_raytrace_tpu.core.constants import PI


def sqr(x):
    return x * x


def schlick_fresnel(u):
    """(1-u)^5 with clamp (UtilsFunc.py:393-397)."""
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    m2 = m * m
    return m2 * m2 * m


def gtr1(n_dot_h, a):
    """GTR gamma=1 NDF (UtilsFunc.py:398-405)."""
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * n_dot_h * n_dot_h
    general = (a2 - 1.0) / (PI * jnp.log(jnp.maximum(a2, 1e-8)) * t)
    return jnp.where(a < 1.0, general, 1.0 / PI)


def gtr2(n_dot_h, a):
    """GTR gamma=2 (GGX) NDF (UtilsFunc.py:406-410)."""
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * n_dot_h * n_dot_h
    return a2 / (PI * t * t)


def smith_g_ggx(n_dot_v, alpha_g):
    """Smith masking term, Disney's parameterization
    (UtilsFunc.py:411-415)."""
    a = alpha_g * alpha_g
    b = n_dot_v * n_dot_v
    return 1.0 / jnp.maximum(n_dot_v + jnp.sqrt(jnp.maximum(a + b - a * b, 0.0)), 1e-8)


def sample_gtr2_half(u1, u2, alpha):
    """Importance-sample the GTR2 half-vector in the local z-up frame
    (the inline sampling at reference Disney.py:32-37)."""
    phi = u1 * 2.0 * PI
    cos_theta = jnp.sqrt((1.0 - u2) / (1.0 + (alpha * alpha - 1.0) * u2))
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
