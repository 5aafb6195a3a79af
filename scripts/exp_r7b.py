"""One-process A/B at the 38.5 ms/frame production point:

  - DEFER_ATTR: per-winner attr extraction (vs per-visit HIGHEST matmul).
  - KF=64 (exp_r6d measured 38.3 vs 38.8 — re-check combined).
  - schedule S1 ((1,4),(3,16),(4,32),(8,128)): bounce 3 runs at 262k
    merged lanes instead of 1M (occupancy after bounce 2 is 3.2%, probe).
  - schedule S4 ((1,4),(3,24),(8,128)): same boundary, one fewer phase.

Means must MATCH the production value for same-schedule variants
(DEFER_ATTR is bit-exact); schedule variants change the RNG stream
shape, so only overflow=0 gates them.

    python scripts/exp_r7b.py
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


S1 = ((1, 4), (3, 16), (4, 32), (8, 128))
S4 = ((1, 4), (3, 24), (8, 128))


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
        ("base", 32, 16, BENCH_SCHEDULE_MERGED, dict()),
        ("defer", 32, 16, BENCH_SCHEDULE_MERGED, dict(DEFER_ATTR=True)),
        ("defer_s1", 32, 16, S1, dict(DEFER_ATTR=True)),
        ("defer_s4", 32, 16, S4, dict(DEFER_ATTR=True)),
        ("defer_kf64", 64, 16, BENCH_SCHEDULE_MERGED, dict(DEFER_ATTR=True)),
    ]
    for label, KF, G, sched, flags in variants:
        saved = {k: getattr(ct, k) for k in flags}
        for k, v in flags.items():
            setattr(ct, k, v)
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
        finally:
            for k, v in saved.items():
                setattr(ct, k, v)


if __name__ == "__main__":
    main()
