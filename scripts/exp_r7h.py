"""Last-mile levers at the p15_pay point (34.2 ms/frame):

  - PRESORT_HALF: presort the merged carry only on every second bounce
    (odd bounces reuse the stale lane order with a fresh per-tile
    front-to-back ordering — exact pruning, decayed tile density).
  - KF=128: quarters the residual tunnel-floor share.

    python scripts/exp_r7h.py
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


S15 = ((1, 5), (3, 24), (8, 128))
PAY = (8, 32)


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
        ("base", 64, False),               # 34.2 reproduce
        ("half", 64, True),
        ("kf128", 128, False),
        ("half_kf128", 128, True),
    ]
    G = 16
    for label, KF, half in variants:
        saved = pt_rgb.PRESORT_HALF
        pt_rgb.PRESORT_HALF = half
        jax.clear_caches()
        try:
            step = jax.jit(
                partial(raw, n_frames=KF, group=G,
                        compaction=S15, nee=nee, pay_divisors=PAY),
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
            pt_rgb.PRESORT_HALF = saved


if __name__ == "__main__":
    main()
