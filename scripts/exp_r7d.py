"""Schedule capacity micro-tune at the s4/KF64 point (37.2 ms/frame).

Measured occupancy (CPU probe, fixed bench camera): b0 18.31%, b2 3.22%,
b7 0.65%.  Current capacities: phase1 25% (fill 73%), phase2 4.17%
(fill 77%), phase3 0.78% (fill 61%).  Candidates shave each phase's
width toward its occupancy; binomial variance at these lane counts is
tiny (b0: 48k +- 0.2k vs 52.4k capacity at divisor 5), and the
overflow counter gates exactness loudly.

    python scripts/exp_r7d.py
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
        ("s4_kf64", BENCH_SCHEDULE_MERGED),            # 37.2 reference
        ("p1_5", ((1, 5), (3, 24), (8, 128))),
        ("p2_28", ((1, 4), (3, 28), (8, 160))),
        ("all", ((1, 5), (3, 28), (8, 160))),
        ("all_p6", ((1, 5), (3, 28), (6, 48), (8, 160))),
    ]
    KF, G = 64, 16
    for label, sched in variants:
        jax.clear_caches()
        try:
            step = jax.jit(
                partial(raw, n_frames=KF, group=G,
                        compaction=sched, nee=nee),
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
