"""A/B the spectral-box emitter scale against the golden (TPU).

tools/spectral_direct_oracle.py measures the golden's directly-lit
back wall at ~1.7-1.8x the physically-correct direct radiance computed
from first principles with lamp scale ||Ke||_2 = 17.32 — while the
reference's emission path (PT_Spec.emission_to_rad:110-116) caps at
||Ke||_2 * tint(<=1, sigmoid) * D65n.  sqrt(3) = ||Ke||_1/||Ke||_2 for
the gray (10,10,10) lamp.  This renders both scales in one process and
prints region ratios + full-image golden diff for each.

Run: JAX_PLATFORMS=tpu PYTHONPATH=/root/repo:$PYTHONPATH \
     timeout -k 5 1500 python scripts/exp_spec_scale.py
"""

import math
import sys
import time

sys.path.insert(0, "/root/repo")

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

fix_stale_platform()
wait_for_device()

from ti_raytrace_tpu.integrators import pt_spec
from ti_raytrace_tpu.tools.golden import load_reference, mean_abs_diff, render_scene
from ti_raytrace_tpu.tools.spectral_regions import REGIONS, region_stats

SIZE = 512
FRAMES = 64

ref = load_reference("image/spectral-cornellbox.png")
theirs = region_stats(ref[..., :3], SIZE)

for scale in (1.0, math.sqrt(3.0), 1.8):
    pt_spec._EMITTER_SCALE = scale
    t0 = time.time()
    img = render_scene("spectral_box", FRAMES, SIZE)
    diff = mean_abs_diff(img, ref)
    ours = region_stats(__import__(
        "ti_raytrace_tpu.io.image", fromlist=["film_to_image"]
    ).film_to_image(img), SIZE)
    print(f"--- scale {scale:.4f}: golden diff {diff:.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)
    for name, *_ in REGIONS:
        o_m = ours[name][1]
        r_m = theirs[name][1]
        print(f"  {name:<11s} ratio {o_m / max(r_m, 1e-9):.3f}", flush=True)
