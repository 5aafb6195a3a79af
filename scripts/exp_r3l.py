"""Depth-cost decomposition of the 100k bench frame.

Measures KF-frame dispatches of trace_paths truncated at increasing
max_depth; successive differences give the real in-frame cost of each
compaction phase (standalone stage timings are useless through the axon
tunnel's ~30 ms dispatch floor).  One process, composite timings only.

    python scripts/exp_r3l.py [depths...]   # default 1 2 4 8 15
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

fix_stale_platform()

import jax
import jax.numpy as jnp
import numpy as np

wait_for_device()

jax.config.update(
    "jax_compilation_cache_dir", os.path.join("/root/repo", ".cache", "jax")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ti_raytrace_tpu.camera import CameraSpec, orbit_camera, ray_directions, ray_origins
from ti_raytrace_tpu.examples.scenes import BENCH_SCHEDULE, benchmark_100k
from ti_raytrace_tpu.integrators import pt_rgb


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
KF = 8


@partial(jax.jit, static_argnames=("md",))
def frames(key, md):
    def body(i, acc):
        k_cam, k_path = jax.random.split(jax.random.fold_in(key, i))
        o = jnp.swapaxes(ray_origins(spec, cam), 0, 1)
        d = jnp.swapaxes(ray_directions(spec, cam, jnp.int32(i), k_cam), 0, 1)
        r, ov = pt_rgb.trace_paths(
            scene, o, d, k_path, max_depth=md, compaction=BENCH_SCHEDULE,
            nee=nee, return_overflow=True,
        )
        return acc + jnp.sum(r)

    return jax.lax.fori_loop(0, KF, body, jnp.float32(0.0))


key = jax.random.PRNGKey(7)
depths = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 15]
results = []
for md in depths:
    t0 = time.time()
    v = float(frames(key, md).block_until_ready())
    log(f"md={md}: compile+first {time.time()-t0:.1f}s sum={v:.1f}")
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        frames(key, md).block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    best = times[0] / KF * 1e3
    results.append((md, best))
    print(f"md={md}: best {best:.1f} ms/frame", flush=True)

print("---", flush=True)
prev = 0.0
for md, best in results:
    print(f"md={md:3d}  {best:6.1f} ms/frame  (+{best - prev:6.1f})", flush=True)
    prev = best
