"""Phase-2 split sweep at the 33.8 ms/frame production point.

The r7a re-profile: phase 2 (bounces 3-7 at 174k lanes) is 6.9 ms/frame
while occupancy inside it falls 2.3% -> 0.65%.  Candidates add one
boundary (pooled headroom 1.3-1.4x, cf. the live (8,128) at 1.2x and
the disqualified (3,28) at 1.11x):

  - s540: ((1,5),(3,24),(5,40),(8,128)) — bounces 5-7 at 104k.
  - s648: ((1,5),(3,24),(6,48),(8,128)) — bounces 6-7 at 87k.

    python scripts/exp_r7i.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

fix_stale_platform()

import jax

wait_for_device()

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join("/root/repo", ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from functools import partial

import numpy as np

from ti_raytrace_tpu import film as film_mod
from ti_raytrace_tpu.camera import CameraSpec, orbit_camera
from ti_raytrace_tpu.examples.scenes import benchmark_100k
from ti_raytrace_tpu.integrators import pt_rgb


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    size = 512
    scene, _ = benchmark_100k()
    lo = np.asarray(scene.aabb_min)
    hi = np.asarray(scene.aabb_max)
    centre = 0.5 * (lo + hi)
    scale = float(np.linalg.norm(hi - lo)) * 0.8
    spec = CameraSpec(size, size)
    cam = orbit_camera(centre, 0.0, 0.0, scale)
    nee = pt_rgb.has_nee_materials(scene)
    raw = pt_rgb.render_film_frames_merged.__wrapped__

    variants = [
        ("base", ((1, 5), (3, 24), (8, 128)), (8, 32)),
        ("s540", ((1, 5), (3, 24), (5, 40), (8, 128)), (8, 32, 64)),
        ("s648", ((1, 5), (3, 24), (6, 48), (8, 128)), (8, 32, 64)),
    ]
    KF, G = 64, 16
    for label, sched, pay in variants:
        jax.clear_caches()
        try:
            step = jax.jit(
                partial(raw, n_frames=KF, group=G,
                        compaction=sched, nee=nee, pay_divisors=pay),
                static_argnums=(1,), donate_argnums=(3,),
            )
            fl = film_mod.new_film(size, size)
            t0 = time.time()
            fl, ov = step(scene, spec, cam, fl)
            fl.hdr.block_until_ready()
            log(f"{label}: compile+first {time.time()-t0:.1f}s")
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                fl, o2 = step(scene, spec, cam, fl)
                fl.hdr.block_until_ready()
                ov = ov + o2
                times.append(time.perf_counter() - t0)
            med = sorted(times)[len(times) // 2]
            log(f"{label}: median {med/KF*1e3:6.1f} ms/frame  best "
                f"{min(times)/KF*1e3:6.1f}  overflow {int(np.asarray(ov))}"
                f"  mean {float(np.asarray(fl.hdr).mean()):.9f}")
        except Exception as e:
            log(f"{label}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
