"""Smooth dielectric BSDF (reflect/refract with Schlick fresnel).

Vectorized re-implementation of reference brdf/Glass.py: the lobe choice
is a single uniform against the Schlick reflectance; total internal
reflection forces the mirror branch (the reference encodes this as
R = u + 1, Glass.py:19-31).  `f_or_b` is +1 for reflection, -1 for
transmission — the sign drives Beer-Lambert roulette and the ray-offset
side in the integrators (PT_RGB.py:115-122).

A delta BSDF: evaluate == pdf == 1 (Glass.py:69-78).
"""

import jax.numpy as jnp

from ti_raytrace_tpu.utils import geometry, vec


def sample(u, in_dir, n, ior):
    """u: (...,) uniform; in_dir toward surface; n shading normal
    (may point either side).  ior may be per-lane (dispersion uses the
    per-wavelength BK7 curve, Glass.sample_lambda at Glass.py:40-65).
    Returns (next_dir, f_or_b)."""
    cos_i = vec.dot(in_dir, n)
    exiting = cos_i > 0.0
    n_eff = jnp.where(exiting[..., None], -n, n)
    cos_theta_i = jnp.abs(cos_i)
    eta = jnp.where(exiting, ior, 1.0 / ior)

    refr, ok = geometry.refract(in_dir, n_eff, eta[..., None])
    # TIR -> reflectance above 1 so the reflect branch always wins
    r = jnp.where(ok, geometry.schlick(cos_theta_i, ior), u + 1.0)

    refl = vec.reflect(in_dir, n_eff)
    reflect_mask = u < r
    next_dir = jnp.where(reflect_mask[..., None], refl, refr)
    f_or_b = jnp.where(reflect_mask, 1.0, -1.0)
    return next_dir, f_or_b


def evaluate_pdf(n, v, l, ior):
    one = jnp.ones(jnp.broadcast_shapes(n.shape[:-1], v.shape[:-1]), n.dtype)
    return one, one


def evaluate(n, v, l, ior):
    return evaluate_pdf(n, v, l, ior)[0]


def pdf(n, v, l, ior):
    return evaluate_pdf(n, v, l, ior)[1]
