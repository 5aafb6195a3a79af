"""Schedule sweep without DEFER_ATTR (which measured a 3 ms LOSS —
the per-visit attr MXU dot hides under VPU narrow-phase work, while the
deferred variant's per-visit (TILE,1) any-reduction is serial VPU time).

Occupancy collapses after bounce 2 (3.2% vs phase 1's 25% capacity), so
a phase boundary at bounce 3 shrinks the most expensive merged phase:

  - s4: ((1,4),(3,24),(8,128)) — bounces 3-7 at 24x compaction
    (pooled headroom 1.29x over the 3.22% survivors), one phase fewer.
  - s26: ((1,4),(2,6),(4,32),(8,128)) — bounces 2-3 at 6x (1.18x
    pooled headroom over the 14.1% post-b1 survivors).
  - kf64 combos: exp_r6d measured KF=64 at 38.3 vs 38.8.

    python scripts/exp_r7c.py
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


S4 = ((1, 4), (3, 24), (8, 128))
S26 = ((1, 4), (2, 6), (4, 32), (8, 128))


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
        ("base", 32, 16, BENCH_SCHEDULE_MERGED),
        ("s4", 32, 16, S4),
        ("s26", 32, 16, S26),
        ("s4_kf64", 64, 16, S4),
        ("s26_kf64", 64, 16, S26),
        ("base_kf64", 64, 16, BENCH_SCHEDULE_MERGED),
    ]
    for label, KF, G, sched in variants:
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
