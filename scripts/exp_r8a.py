"""BDPT frame anatomy: xplane attribution of one sliced veach frame.

veach_bdpt measures 1.00 s/frame at 512^2 (scripts/perf_table.py) vs
the <0.5 s target — this splits it into walk traces, connection
visibility traces, and MIS/shade fusions before choosing the lever.

    python scripts/exp_r8a.py
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

from ti_raytrace_tpu.camera import CameraSpec
from ti_raytrace_tpu.examples.scenes import EXAMPLES, make_camera
from ti_raytrace_tpu.integrators import bdpt_rgb

TRACE_DIR = "/tmp/jaxtrace_r8a"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    size = 512
    scene, cfg = EXAMPLES["veach_bdpt"]()
    spec, cam = make_camera(scene, cfg, size, size)
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    img = bdpt_rgb.render_frame_sliced(scene, spec, cam, 1, key)
    img.block_until_ready()
    log(f"compile+first {time.time()-t0:.1f}s")
    t0 = time.perf_counter()
    img = bdpt_rgb.render_frame_sliced(scene, spec, cam, 2, key)
    img.block_until_ready()
    log(f"warm frame {time.perf_counter()-t0:.3f}s")

    with jax.profiler.trace(TRACE_DIR):
        img = bdpt_rgb.render_frame_sliced(scene, spec, cam, 3, key)
        img.block_until_ready()
    log(f"trace -> {TRACE_DIR}")
    os.execv(sys.executable,
             [sys.executable, "/root/repo/scripts/xplane.py", TRACE_DIR, "40"])


if __name__ == "__main__":
    main()
