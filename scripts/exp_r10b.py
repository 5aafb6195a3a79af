"""BDPT frame anatomy on TPU (VERDICT r5 #3: veach_bdpt at ~1 s/frame).

Times warm render_frame_sliced dispatches for a BDPT scene, then records
one frame under jax.profiler.trace and aggregates device-op durations
with scripts/xplane.py — the same instrument that produced the PT
anatomy in docs/PERF.md.

    JAX_PLATFORMS=tpu PYTHONPATH=/root/repo:$PYTHONPATH \
        python scripts/exp_r10b.py veach_bdpt 512 2
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

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join("/root/repo", ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from ti_raytrace_tpu.examples.scenes import example_cached, make_camera
from ti_raytrace_tpu.integrators import bdpt_rgb
from scripts.exp_r9b import log


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "veach_bdpt"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    n_slices = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    scene, cfg = example_cached(name)
    spec, cam = make_camera(scene, cfg, size, size)
    log(f"{name}: {size}x{size}, n_slices={n_slices}, n_prims={scene.n_prims}")

    def frame(f):
        img = bdpt_rgb.render_frame_sliced(
            scene, spec, cam, jax.numpy.int32(f), jax.random.PRNGKey(f),
            n_slices=n_slices)
        img.block_until_ready()
        return img

    t0 = time.perf_counter()
    frame(1)
    log(f"compile+first {time.perf_counter() - t0:.1f}s")
    times = []
    for f in range(2, 6):
        t0 = time.perf_counter()
        frame(f)
        times.append(time.perf_counter() - t0)
    log(f"warm frame: median {sorted(times)[len(times)//2]*1e3:.1f} ms "
        f"(best {min(times)*1e3:.1f})")

    trace_dir = "/tmp/jaxtrace_r10b"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        frame(6)

    import subprocess
    out = subprocess.run(
        [sys.executable, "scripts/xplane.py", trace_dir, "40"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    print(out.stdout)
    if out.returncode != 0:
        print(out.stderr[-2000:])


if __name__ == "__main__":
    main()
