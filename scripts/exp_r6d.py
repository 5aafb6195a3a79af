"""One-process A/B at the current production point (38.5 ms/frame,
REFRESH=4): dispatch/group knobs + a TILE re-measure.

  - KF=64 (G=16): halves the residual ~30 ms tunnel floor share.
  - KF=48/G=24, KF=40/G=20: merged-density points between the G=16
    production and the measured G=32 loss (superlinear 2M-lane presort).
  - TILE=128: the r3 loss (92.7 vs 82.7) predates the bitmask narrow
    phase, REFRESH=4 and presorted deep phases — per-visit volume now
    dominates differently, so re-measure.

    python scripts/exp_r6d.py
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
from ti_raytrace_tpu.examples.scenes import BENCH_SCHEDULE_MERGED, benchmark_100k
from ti_raytrace_tpu.integrators import pt_rgb
from ti_raytrace_tpu.ops import cluster_trace as ct


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
        ("kf32_g16", 32, 16, dict()),
        ("kf64_g16", 64, 16, dict()),
        ("kf40_g20", 40, 20, dict()),
        ("kf48_g24", 48, 24, dict()),
        ("tile128", 32, 16, dict(TILE=128)),
        ("kf32_g16_drift", 32, 16, dict()),
    ]
    for label, KF, G, flags in variants:
        saved = {k: getattr(ct, k) for k in flags}
        for k, v in flags.items():
            setattr(ct, k, v)
        jax.clear_caches()
        try:
            step = jax.jit(
                partial(raw, n_frames=KF, group=G,
                        compaction=BENCH_SCHEDULE_MERGED, nee=nee),
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
        finally:
            for k, v in saved.items():
                setattr(ct, k, v)


if __name__ == "__main__":
    main()
