"""Refine the spectral-box emitter-scale quirk: scale sweep at higher
spp, per-channel region ratios (is the colored-wall overshoot hue or
brightness?).

Run: JAX_PLATFORMS=tpu PYTHONPATH=/root/repo:$PYTHONPATH \
     timeout -k 5 1500 python scripts/exp_spec_scale2.py
"""

import math
import sys
import time

sys.path.insert(0, "/root/repo")

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

fix_stale_platform()
wait_for_device()

import numpy as np

from ti_raytrace_tpu.integrators import pt_spec
from ti_raytrace_tpu.io.image import film_to_image
from ti_raytrace_tpu.tools.golden import load_reference, mean_abs_diff, render_scene
from ti_raytrace_tpu.tools.spectral_regions import REGIONS, region_stats

SIZE = 512

ref = load_reference("image/spectral-cornellbox.png")
theirs = region_stats(ref[..., :3], SIZE)

for scale, frames in ((math.sqrt(3.0), 256), (1.55, 128), (1.65, 128)):
    pt_spec._EMITTER_SCALE = scale
    t0 = time.time()
    img = render_scene("spectral_box", frames, SIZE)
    diff = mean_abs_diff(img, ref)
    ours = region_stats(film_to_image(img), SIZE)
    print(f"--- scale {scale:.4f} frames {frames}: golden diff {diff:.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)
    for name, *_ in REGIONS:
        o_rgb, o_m = ours[name]
        r_rgb, r_m = theirs[name]
        per = " ".join(
            f"{o_rgb[c] / max(r_rgb[c], 1e-9):.2f}" for c in range(3)
        )
        print(f"  {name:<11s} ratio {o_m / max(r_m, 1e-9):.3f}  rgb [{per}]",
              flush=True)
