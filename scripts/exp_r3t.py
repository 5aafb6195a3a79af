"""Profile ONE merged group dispatch (G=8) and attribute device time.

    python scripts/exp_r3t.py          # writes /tmp/jaxtrace_merge
    python scripts/xplane.py /tmp/jaxtrace_merge 40
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
    G = 16

    def step(fl):
        fl, ov = pt_rgb.render_film_frames_merged(
            scene, spec, cam, fl, G, G, BENCH_SCHEDULE_MERGED, nee)
        return fl

    fl = film_mod.new_film(size, size)
    t0 = time.time()
    fl = step(fl)
    fl.hdr.block_until_ready()
    log(f"compile+first group: {time.time()-t0:.1f}s")
    t0 = time.perf_counter()
    fl = step(fl)
    fl.hdr.block_until_ready()
    log(f"one group of {G}: {(time.perf_counter()-t0)*1e3:.1f} ms "
        f"({(time.perf_counter()-t0)/G*1e3:.1f} ms/frame)")

    with jax.profiler.trace("/tmp/jaxtrace_merge"):
        fl = step(fl)
        fl.hdr.block_until_ready()
    log("trace written to /tmp/jaxtrace_merge")


if __name__ == "__main__":
    main()
