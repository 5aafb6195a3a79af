"""Fresh frame anatomy at the current production point (38.5 ms/frame,
KF=32/G=16, REFRESH=4): one profiled dispatch of
render_film_frames_merged, attributed per fusion by scripts/xplane.py.

The r3 anatomy (docs/PERF.md) predates the bitmask narrow phase,
REFRESH=4, morton camera, presorted deep phases and the env-fold flush —
the next structural lever needs current numbers, not stale shares.

    python scripts/exp_r7a.py   (prints xplane attribution to stderr)
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

TRACE_DIR = "/tmp/jaxtrace_r7a"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    size = 512
    KF, G = 64, 16
    scene, _ = benchmark_100k()
    lo = np.asarray(scene.aabb_min)
    hi = np.asarray(scene.aabb_max)
    centre = 0.5 * (lo + hi)
    scale = float(np.linalg.norm(hi - lo)) * 0.8
    spec = CameraSpec(size, size)
    cam = orbit_camera(centre, 0.0, 0.0, scale)
    nee = pt_rgb.has_nee_materials(scene)
    raw = pt_rgb.render_film_frames_merged.__wrapped__
    step = jax.jit(
        partial(raw, n_frames=KF, group=G,
                compaction=BENCH_SCHEDULE_MERGED, nee=nee,
                pay_divisors=(8, 32)),
        static_argnums=(1,), donate_argnums=(3,),
    )

    fl = film_mod.new_film(size, size)
    t0 = time.time()
    fl, ov = step(scene, spec, cam, fl)
    fl.hdr.block_until_ready()
    log(f"compile+first {time.time()-t0:.1f}s")
    t0 = time.perf_counter()
    fl, _ = step(scene, spec, cam, fl)
    fl.hdr.block_until_ready()
    log(f"warm dispatch {(time.perf_counter()-t0)/KF*1e3:.1f} ms/frame")

    with jax.profiler.trace(TRACE_DIR):
        fl, _ = step(scene, spec, cam, fl)
        fl.hdr.block_until_ready()
    log(f"trace written to {TRACE_DIR}; per-fusion attribution:")
    os.execv(sys.executable,
             [sys.executable, "/root/repo/scripts/xplane.py", TRACE_DIR, "40"])


if __name__ == "__main__":
    main()
