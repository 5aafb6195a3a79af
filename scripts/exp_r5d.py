"""A/B merge group size at KF=32: G=16 (production) vs G=32.

Doubling the merged group doubles deep-phase survivor density (fewer
narrow-phase visits per tile) and halves the per-group costs (env
gather over the (3, G*N) accum, flush scatters, prologue scan) per
frame — at the price of superlinear 2M-lane sorts and a bigger compile.

    python scripts/exp_r5d.py
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

    for KF, G in [(32, 16), (32, 32), (64, 32)]:
        step = jax.jit(
            partial(raw, n_frames=KF, group=G,
                    compaction=BENCH_SCHEDULE_MERGED, nee=nee),
            static_argnums=(1,), donate_argnums=(3,),
        )
        fl = film_mod.new_film(size, size)
        t0 = time.time()
        fl, ov = step(scene, spec, cam, fl)
        fl.hdr.block_until_ready()
        log(f"KF={KF} G={G}: compile+first {time.time()-t0:.1f}s")
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            fl, o2 = step(scene, spec, cam, fl)
            fl.hdr.block_until_ready()
            ov = ov + o2
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        log(f"KF={KF} G={G}: median {med/KF*1e3:6.1f} ms/frame  best "
            f"{min(times)/KF*1e3:6.1f}  overflow {int(np.asarray(ov))}  "
            f"mean {float(np.asarray(fl.hdr).mean()):.9f}")


if __name__ == "__main__":
    main()
