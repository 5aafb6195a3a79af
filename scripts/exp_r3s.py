"""Schedule sweep at merge G=8: pooled compaction headroom.

Per-frame divisors were sized with 4-8x headroom because ONE frame's
survivor spike must fit (finer (2,8) measured 58k overflow kills).  A
merged group pools capacity across 8 frames, so spikes average out and
the divisors can tighten.  Overflow kills are watched — any nonzero
count disqualifies a schedule regardless of speed.

    python scripts/exp_r3s.py
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

import numpy as np

from ti_raytrace_tpu import film as film_mod
from ti_raytrace_tpu.camera import CameraSpec, orbit_camera
from ti_raytrace_tpu.examples.scenes import benchmark_100k
from ti_raytrace_tpu.integrators import pt_rgb


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    size = 512
    scene, cfg = benchmark_100k()
    lo = np.asarray(scene.aabb_min)
    hi = np.asarray(scene.aabb_max)
    centre = 0.5 * (lo + hi)
    scale = float(np.linalg.norm(hi - lo)) * 0.8
    spec = CameraSpec(size, size)
    cam = orbit_camera(centre, 0.0, 0.0, scale)
    nee = pt_rgb.has_nee_materials(scene)
    KF, G = 16, 8

    scheds = [
        ("base 4/16/64    ", ((1, 4), (4, 16), (8, 64))),
        ("tight 4/32/128  ", ((1, 4), (4, 32), (8, 128))),
        ("tighter 4/48/192", ((1, 4), (4, 48), (8, 192))),
        ("early2 4/8/32/128", ((1, 4), (2, 8), (4, 32), (8, 128))),
    ]

    for label, sched in scheds:
        step = lambda fl, s=sched: pt_rgb.render_film_frames_merged(
            scene, spec, cam, fl, KF, G, s, nee)
        fl = film_mod.new_film(size, size)
        t0 = time.time()
        fl, ov = step(fl)
        fl.hdr.block_until_ready()
        log(f"{label}: compile+first {time.time()-t0:.1f}s")
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            fl, o2 = step(fl)
            fl.hdr.block_until_ready()
            ov = ov + o2
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        log(f"{label}: median {med/KF*1e3:6.1f} ms/frame  best "
            f"{min(times)/KF*1e3:6.1f}  overflow {int(np.asarray(ov))}  "
            f"mean_hdr {float(np.asarray(fl.hdr).mean()):.4f}")


if __name__ == "__main__":
    main()
