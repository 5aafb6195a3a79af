"""Measure the NEE term's share of the spectral_box render (TPU).

The reference's PT_Spec NEE line scales by `light_tint =
emission_to_rad(HIT surface mat_color)` (PT_Spec.py:217 computed at
:218-219 from the hit mat), NOT the sampled light's emission — while we
scale by the light's em_scale (17.32 for Ke=(10,10,10)) vs the
reference's ~1.73 for a white wall.  Whether that 10x disagreement
matters depends on NEE's actual share of wall radiance under the
always-full-emitter-hit quirk; this measures it.

Run: JAX_PLATFORMS=tpu PYTHONPATH=/root/repo:$PYTHONPATH \
     timeout -k 5 900 python scripts/exp_spec_nee.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

fix_stale_platform()
wait_for_device()

import numpy as np

from ti_raytrace_tpu.integrators import pt_spec
from ti_raytrace_tpu.io.image import film_to_image
from ti_raytrace_tpu.tools.golden import load_reference, render_scene
from ti_raytrace_tpu.tools.spectral_regions import REGIONS, region_stats

SIZE = 512
FRAMES = 32

ref = load_reference("image/spectral-cornellbox.png")[..., :3]
theirs = region_stats(ref, SIZE)

for scale in (1.0, 0.0):
    pt_spec._NEE_SCALE = scale
    t0 = time.time()
    img = film_to_image(render_scene("spectral_box", FRAMES, SIZE))
    ours = region_stats(img, SIZE)
    print(f"--- _NEE_SCALE={scale} ({time.time()-t0:.0f}s) "
          f"image mean {img.mean():.4f} ref {ref.mean():.4f} "
          f"ratio {img.mean()/ref.mean():.3f}", flush=True)
    for name, *_ in REGIONS:
        o_rgb, o_m = ours[name]
        r_rgb, r_m = theirs[name]
        print(f"  {name:<11s} ours {o_m:.4f} ref {r_m:.4f} "
              f"ratio {o_m / max(r_m, 1e-9):.3f}", flush=True)
