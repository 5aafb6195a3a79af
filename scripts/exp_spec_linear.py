"""Linear-radiance region comparison of spectral_box vs the golden.

Display-space ratios (tools/spectral_regions.py) fold the ACES curve and
clipping into every number; this undoes the reference's display pipeline
(sRGB decode -> ACES invert -> /exposure, Example.py:43 tone_map(0.5))
on UNCLIPPED pixels and compares true linear means, for three NEE
variants: light-tint (ours), hit-tint (the reference's verbatim
formula), and NEE off.

ACES inversion of a noisy display mean UNDERESTIMATES the reference's
linear mean (concave curve), so linear ratios computed here are an upper
bound on parity — if we still fall short, the deficit is real.

Run: JAX_PLATFORMS=tpu PYTHONPATH=/root/repo:$PYTHONPATH \
     timeout -k 5 1200 python scripts/exp_spec_linear.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

fix_stale_platform()
wait_for_device()

import numpy as np

from ti_raytrace_tpu.integrators import pt_spec
from ti_raytrace_tpu.tools.golden import load_reference
from ti_raytrace_tpu.tools.spectral_regions import REGIONS

SIZE = 512
FRAMES = 64
EXPOSURE = 0.5


def srgb_to_lrgb(s):
    return np.where(s < 0.04045, s / 12.92, ((s + 0.055) / 1.055) ** 2.4)


def aces_invert(y):
    """Invert Narkowicz ACES y = x(2.51x+0.03)/(x(2.43x+0.59)+0.14)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    A = a - c * y
    B = b - d * y
    C = -e * y
    disc = np.maximum(B * B - 4 * A * C, 0.0)
    return np.where(np.abs(A) > 1e-9, (-B + np.sqrt(disc)) / (2 * A), 0.0)


def ref_linear(img_srgb):
    """(H, W, 3) sRGB -> linear radiance; NaN where clipped."""
    lin = aces_invert(srgb_to_lrgb(img_srgb)) / EXPOSURE
    clipped = img_srgb > 0.98
    return np.where(clipped, np.nan, lin)


def render_linear(frames):
    import jax

    from ti_raytrace_tpu import film as film_mod
    from ti_raytrace_tpu.examples.run import get_integrator
    from ti_raytrace_tpu.examples.scenes import EXAMPLES, make_camera
    from ti_raytrace_tpu.io.image import film_to_image

    scene, cfg = EXAMPLES["spectral_box"]()
    spec, cam = make_camera(scene, cfg, SIZE, SIZE)
    render = get_integrator(cfg.integrator, cfg.sky, None, scene)
    fl = film_mod.new_film(SIZE, SIZE)
    for _ in range(frames):
        rad = render(scene, spec, cam, fl.frame, fl.key)
        rad.block_until_ready()
        fl = film_mod.accumulate(fl, rad)
    return film_to_image(np.asarray(fl.hdr))


def stats(img, mask_nan=False):
    out = {}
    for name, x0, x1, y0, y1 in REGIONS:
        r = img[y0:y1, x0:x1, :3]
        out[name] = np.nanmean(r) if mask_nan else r.mean()
    return out


ref = ref_linear(load_reference("image/spectral-cornellbox.png")[..., :3])
theirs = stats(ref, mask_nan=True)
frac_clipped = {}
for name, x0, x1, y0, y1 in REGIONS:
    r = ref[y0:y1, x0:x1, 0]
    frac_clipped[name] = float(np.isnan(r).mean())

variants = [
    ("light-tint+ph", "light", 1.0, True),
    ("light-tint-full", "light", 1.0, False),
    ("hit-tint-full", "hit", 1.0, False),
]
for label, mode, nee_scale, mis in variants:
    pt_spec.NEE_TINT_MODE = mode
    pt_spec._NEE_SCALE = nee_scale
    pt_spec._NEE_MIS = mis
    t0 = time.time()
    lin = render_linear(FRAMES)
    ours = stats(lin)
    print(f"--- {label} ({time.time()-t0:.0f}s) linear image mean "
          f"{lin.mean():.4f}", flush=True)
    for name, *_ in REGIONS:
        print(f"  {name:<11s} ours {ours[name]:.4f} ref {theirs[name]:.4f} "
              f"ratio {ours[name] / max(theirs[name], 1e-9):.3f} "
              f"(ref clipped {frac_clipped[name]:.0%})", flush=True)
