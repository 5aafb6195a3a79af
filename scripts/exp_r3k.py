"""In-process sweep of cluster kernel shape knobs on the 100k bench frame.

Each variant is measured in the SAME process (TPU frame times drift
between processes — CLAUDE.md): set ops/cluster_trace globals, rebuild
the cluster packs for BLOCK changes, jax.clear_caches(), recompile,
measure.  Usage:

    python scripts/exp_r3k.py "BLOCK=128" "BLOCK=256" "BLOCK=256,GROUP=64"

Each arg is a comma-separated NAME=VALUE list; BLOCK rebuilds packs,
anything else sets ops/cluster_trace module globals.  KF=n sets frames
per dispatch.
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
from ti_raytrace_tpu.accel.clusters import build_clusters
from ti_raytrace_tpu.camera import CameraSpec, orbit_camera
from ti_raytrace_tpu.examples.scenes import BENCH_SCHEDULE, benchmark_100k
from ti_raytrace_tpu.integrators import pt_rgb
from ti_raytrace_tpu.ops import cluster_trace as ct
from ti_raytrace_tpu.scene.build import BUILD_FORMAT_VERSION
from ti_raytrace_tpu.scene.data import device_scene


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# host arrays straight from the bench cache (build once if absent)
cache_path = os.path.join(
    "/root/repo", ".cache", f"bench_scene_100000_v{BUILD_FORMAT_VERSION}.npz"
)
if not os.path.exists(cache_path):
    benchmark_100k()
with np.load(cache_path) as z:
    host = {k: z[k] for k in z.files}

size = 512
spec = CameraSpec(size, size)
results = []
for spec_str in sys.argv[1:] or ["BLOCK=128", "BLOCK=256"]:
    kv = dict(item.split("=") for item in spec_str.split(","))
    block = int(kv.pop("BLOCK", "128"))
    kf = int(kv.pop("KF", "4"))
    for name, val in kv.items():
        setattr(ct, name, int(val))
    h = dict(host)
    if block != 128:
        h.update(build_clusters(h, block=block))
    scene = device_scene(h)
    jax.clear_caches()

    lo = np.asarray(scene.aabb_min)
    hi = np.asarray(scene.aabb_max)
    centre = 0.5 * (lo + hi)
    scale = float(np.linalg.norm(hi - lo)) * 0.8
    cam = orbit_camera(centre, 0.0, 0.0, scale)
    nee = pt_rgb.has_nee_materials(scene)

    def step(f):
        return pt_rgb.render_film_frames(scene, spec, cam, f, kf,
                                         BENCH_SCHEDULE, nee)

    fl = film_mod.new_film(size, size)
    t0 = time.time()
    fl, ov = step(fl)
    fl.hdr.block_until_ready()
    mean = float(np.asarray(fl.hdr).mean())
    log(f"{spec_str}: clusters={scene.cluster_bounds.shape[1]} "
        f"compile+first {time.time()-t0:.1f}s mean={mean:.6f} "
        f"overflow={int(np.asarray(ov))}")
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        fl, _ = step(fl)
        fl.hdr.block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    best, med = times[0] / kf * 1e3, times[len(times) // 2] / kf * 1e3
    results.append((spec_str, best, med, mean))
    print(f"{spec_str}: best {best:.1f} ms/frame, median {med:.1f} ms/frame",
          flush=True)

print("---", flush=True)
for spec_str, best, med, mean in results:
    print(f"{spec_str:26s} best {best:6.1f}  median {med:6.1f}  mean {mean:.6f}",
          flush=True)
