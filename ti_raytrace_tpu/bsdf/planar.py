"""Planar-layout BSDFs for the wavefront render loop.

Same math as bsdf/disney.py and bsdf/glass.py (which mirror the reference
brdf/ modules and carry the parity tests), but operating on (3, N) planar
vectors with per-lane scalar parameters — the layout the TPU VPU wants.
"""

import jax.numpy as jnp

from ti_raytrace_tpu.core.constants import PI, TWO_PI
from ti_raytrace_tpu.ops import planar as pv
from ti_raytrace_tpu.utils import microfacet as mf
from ti_raytrace_tpu.utils.geometry import schlick


# --------------------------------------------------------------- Disney

def disney_sample(u3, in_dir, n, metallic, roughness):
    """u3: (3, N) uniforms.  Returns next_dir (3, N)."""
    diffuse_ratio = 0.5 * (1.0 - metallic)
    alpha = jnp.maximum(0.001, roughness)
    u_sel, r1, r2 = u3[0], u3[1], u3[2]

    d_diff = pv.to_world(pv.cosine_sample_hemisphere(r1, r2), n)

    phi = r1 * TWO_PI
    cos_t = jnp.sqrt((1.0 - r2) / (1.0 + (alpha * alpha - 1.0) * r2))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    half = pv.to_world(pv.p3(sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t), n)
    d_spec = pv.reflect(in_dir, half)

    return pv.where(u_sel < diffuse_ratio, d_diff, d_spec)


def disney_evaluate_pdf(n, v, l, metallic, roughness, true_pdf: bool = False):
    """Returns (brdf, pdf); (0, -1) outside the upper hemisphere
    (reference Disney.py:66-108).

    true_pdf=False replicates the reference's diffuse-branch pdf of 1/pi
    (Disney.py:13-15 returns 1/pi with the correct abs(NDotL)/pi
    COMMENTED OUT) even though disney_sample draws the diffuse branch
    cosine-weighted.  Dividing by this wrong density biases every
    BRDF-sampled diffuse bounce low by a cosine factor (measured 2/3 on
    the diag box, PARITY.md 'Disney diffuse pdf') — but the published
    goldens embody it, so it stays the default.  true_pdf=True returns
    the actual sampler density cos(theta)/pi (the corrected
    estimators' mode)."""
    n_dot_l = pv.dot(n, l)
    n_dot_v = pv.dot(n, v)
    valid = (n_dot_l > 0.0) & (n_dot_v > 0.0)

    h = pv.normalize(l + v)
    n_dot_h = pv.dot(h, n)
    l_dot_h = pv.dot(h, l)

    cspec0 = 0.04 + 0.96 * metallic
    fl = mf.schlick_fresnel(n_dot_l)
    fv = mf.schlick_fresnel(n_dot_v)
    fd90 = 0.5 + 2.0 * l_dot_h * l_dot_h * roughness
    fd = (1.0 + (fd90 - 1.0) * fl) * (1.0 + (fd90 - 1.0) * fv)
    alpha = jnp.maximum(0.001, roughness)
    ds = mf.gtr2(n_dot_h, alpha)
    fh = mf.schlick_fresnel(l_dot_h)
    fs = cspec0 + (1.0 - cspec0) * fh
    rough_g = mf.sqr(roughness * 0.5 + 0.5)
    gs = mf.smith_g_ggx(n_dot_l, rough_g) * mf.smith_g_ggx(n_dot_v, rough_g)
    brdf = (fh * 0.5 + 1.0 / PI) * fd * (1.0 - metallic) + gs * fs * ds

    diffuse_ratio = 0.5 * (1.0 - metallic)
    pdf_spec = ds * n_dot_h / (4.0 * jnp.maximum(jnp.abs(l_dot_h), 1e-8))
    pdf_diff = n_dot_l / PI if true_pdf else 1.0 / PI
    pdf = diffuse_ratio * pdf_diff + (1.0 - diffuse_ratio) * pdf_spec
    return jnp.where(valid, brdf, 0.0), jnp.where(valid, pdf, -1.0)


# ---------------------------------------------------------------- Glass

def glass_sample(u, in_dir, n, ior):
    """Smooth dielectric sample (reference Glass.py:9-34), planar.
    Returns (next_dir, f_or_b)."""
    cos_i = pv.dot(in_dir, n)
    exiting = cos_i > 0.0
    n_eff = pv.where(exiting, -n, n)
    cos_theta_i = jnp.abs(cos_i)
    eta = jnp.where(exiting, ior, 1.0 / ior)

    refr, ok = pv.refract(in_dir, n_eff, eta)
    r = jnp.where(ok, schlick(cos_theta_i, ior), u + 1.0)

    refl = pv.reflect(in_dir, n_eff)
    reflect_mask = u < r
    next_dir = pv.where(reflect_mask, refl, refr)
    f_or_b = jnp.where(reflect_mask, 1.0, -1.0)
    return next_dir, f_or_b
