"""Simplified Disney principled BRDF (diffuse + GTR2 specular), vectorized.

Re-implements the behavior of reference brdf/Disney.py: metallic/roughness
parameterization with fixed spec=0.5, sheen=0.5; importance sampling picks
the diffuse lobe with probability 0.5*(1-metallic) and the GGX half-vector
lobe otherwise (Disney.py:18-40); evaluation is the combined
(Fsheen + 1/pi)*Fd*(1-metal) + Gs*Fs*Ds with the mixed-lobe pdf
(Disney.py:66-108).

All functions take explicit uniforms `u` and per-lane material parameters
(metallic, roughness) — no RNG state, no buffer handles.
"""

import jax.numpy as jnp

from ti_raytrace_tpu.core.constants import PI
from ti_raytrace_tpu.utils import microfacet as mf
from ti_raytrace_tpu.utils import sampling, vec


def sample(u3, in_dir, n, metallic, roughness):
    """Sample an outgoing direction.

    u3: (..., 3) uniforms; in_dir: incident direction (toward surface);
    n: shading normal.  Returns next_dir (unit-ish, like the reference —
    reflect of a unit vector is unit).
    """
    diffuse_ratio = 0.5 * (1.0 - metallic)
    alpha = jnp.maximum(0.001, roughness)

    u_sel, r1, r2 = u3[..., 0], u3[..., 1], u3[..., 2]

    d_diff = sampling.to_world(sampling.cosine_sample_hemisphere(r1, r2), n)

    half = sampling.to_world(mf.sample_gtr2_half(r1, r2, alpha[...]), n)
    d_spec = vec.reflect(in_dir, half)

    pick_diffuse = (u_sel < diffuse_ratio)[..., None]
    return jnp.where(pick_diffuse, d_diff, d_spec)


def evaluate_pdf(n, v, l, metallic, roughness):
    """BRDF scalar value and pdf for (view v, light l) about normal n.

    Matches reference Disney.evaluate_pdf (Disney.py:66-108): returns
    (0, -1) outside the upper hemisphere.  v points away from the surface
    (toward the viewer), l away from the surface (toward the light).
    """
    n_dot_l = vec.dot(n, l)
    n_dot_v = vec.dot(n, v)
    valid = (n_dot_l > 0.0) & (n_dot_v > 0.0)

    h = vec.normalize(l + v)
    n_dot_h = vec.dot(h, n)
    l_dot_h = vec.dot(h, l)

    cspec0 = 0.04 + 0.96 * metallic  # mix(0.04, 1.0, metal)
    csheen = 0.5
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
    fsheen = fh * csheen
    brdf = (fsheen + 1.0 / PI) * fd * (1.0 - metallic) + gs * fs * ds

    diffuse_ratio = 0.5 * (1.0 - metallic)
    pdf_spec = ds * n_dot_h / (4.0 * jnp.maximum(jnp.abs(l_dot_h), 1e-8))
    pdf_diff = 1.0 / PI  # reference diffuse_pdf (Disney.py:12-15)
    pdf = diffuse_ratio * pdf_diff + (1.0 - diffuse_ratio) * pdf_spec

    return jnp.where(valid, brdf, 0.0), jnp.where(valid, pdf, -1.0)


def pdf(n, v, l, metallic, roughness):
    """pdf only (reference Disney.pdf, Disney.py:43-63); 0 when invalid."""
    _, p = evaluate_pdf(n, v, l, metallic, roughness)
    return jnp.maximum(p, 0.0)


def evaluate(n, v, l, metallic, roughness):
    b, _ = evaluate_pdf(n, v, l, metallic, roughness)
    return b
