"""Per-fusion profile of one CLI scene dispatch (VERDICT r5 #6).

Renders warm render_film_frames dispatches under jax.profiler.trace and
aggregates device-op durations with scripts/xplane.py.

    JAX_PLATFORMS=tpu PYTHONPATH=/root/repo:$PYTHONPATH \
        python scripts/exp_r9d.py single_model '((1,8),(3,32),(4,64))'
"""

import ast
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

from ti_raytrace_tpu import film as film_mod
from ti_raytrace_tpu.examples.scenes import example_cached, make_camera
from ti_raytrace_tpu.integrators import pt_rgb
from scripts.exp_r9b import log


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "single_model"
    sched = ast.literal_eval(sys.argv[2]) if len(sys.argv) > 2 else None
    kf = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    scene, cfg = example_cached(name)
    spec, cam = make_camera(scene, cfg, 512, 512)
    nee = pt_rgb.has_nee_materials(scene)
    log(f"{name}: nee={nee} sched={sched} kf={kf} n_prims={scene.n_prims}")

    def step(fl):
        fl, _ = pt_rgb.render_film_frames(scene, spec, cam, fl, kf, sched, nee)
        return fl

    fl = film_mod.new_film(512, 512)
    fl = step(fl)
    fl.hdr.block_until_ready()
    t0 = time.perf_counter()
    fl = step(fl)
    fl.hdr.block_until_ready()
    log(f"warm dispatch: {(time.perf_counter()-t0)/kf*1e3:.1f} ms/frame")

    trace_dir = "/tmp/jaxtrace_r9d"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        fl = step(fl)
        fl.hdr.block_until_ready()

    import subprocess
    out = subprocess.run(
        [sys.executable, "scripts/xplane.py", trace_dir, "30"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    print(out.stdout)
    if out.returncode != 0:
        print(out.stderr[-2000:])


if __name__ == "__main__":
    main()
