"""In-process A/B of cluster_trace module toggles on the real frame.

TPU frame times drift BETWEEN processes (CLAUDE.md), so each variant is
measured in the SAME process: set the module global, jax.clear_caches()
to force a retrace (the globals are baked at trace time), recompile,
measure.  Usage:

    python scripts/exp_r3j.py TSKIP=1 TSKIP=0 [TSKIP=1 ...]

Each arg is NAME=VALUE over ops/cluster_trace module globals (ints).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

fix_stale_platform()

import jax
import numpy as np

wait_for_device()

jax.config.update(
    "jax_compilation_cache_dir", os.path.join("/root/repo", ".cache", "jax")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ti_raytrace_tpu import film as film_mod
from ti_raytrace_tpu.camera import CameraSpec, orbit_camera
from ti_raytrace_tpu.examples.scenes import benchmark_100k
from ti_raytrace_tpu.integrators import pt_rgb
from ti_raytrace_tpu.ops import cluster_trace as ct


def log(*a):
    print(*a, file=sys.stderr, flush=True)


scene, cfg = benchmark_100k()
size = 512
lo = np.asarray(scene.aabb_min)
hi = np.asarray(scene.aabb_max)
centre = 0.5 * (lo + hi)
scale = float(np.linalg.norm(hi - lo)) * 0.8
spec = CameraSpec(size, size)
cam = orbit_camera(centre, 0.0, 0.0, scale)
nee = pt_rgb.has_nee_materials(scene)
KF = 4

variants = sys.argv[1:] or ["TSKIP=1", "TSKIP=0"]
results = []
for spec_str in variants:
    name, val = spec_str.split("=")
    setattr(ct, name, bool(int(val)) if val in ("0", "1") else int(val))
    jax.clear_caches()

    def step(f):
        return pt_rgb.render_film_frames(scene, spec, cam, f, KF,
                                         cfg.compaction, nee)

    fl = film_mod.new_film(size, size)
    t0 = time.time()
    fl, ov = step(fl)
    fl.hdr.block_until_ready()
    mean = float(np.asarray(fl.hdr).mean())
    log(f"{spec_str}: compile+first {time.time()-t0:.1f}s "
        f"mean={mean:.6f} overflow={int(np.asarray(ov))}")
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        fl, _ = step(fl)
        fl.hdr.block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    best, med = times[0] / KF * 1e3, times[len(times) // 2] / KF * 1e3
    results.append((spec_str, best, med, mean))
    print(f"{spec_str}: best {best:.1f} ms/frame, median {med:.1f} ms/frame, "
          f"mean={mean:.6f}", flush=True)

print("---", flush=True)
for spec_str, best, med, mean in results:
    print(f"{spec_str:14s} best {best:6.1f}  median {med:6.1f}  mean {mean:.6f}",
          flush=True)
