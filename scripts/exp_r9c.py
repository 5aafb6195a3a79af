"""Tighter cornell schedules A/B (one process, overflow-gated).

    JAX_PLATFORMS=tpu PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exp_r9c.py cornell_box
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

from ti_raytrace_tpu import film as film_mod
from ti_raytrace_tpu.examples.scenes import example_cached, make_camera
from ti_raytrace_tpu.integrators import pt_rgb
from scripts.exp_r9b import time_frames, log


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "cornell_box"
    scene, cfg = example_cached(name)
    spec, cam = make_camera(scene, cfg, 512, 512)
    nee = pt_rgb.has_nee_materials(scene)

    import ast
    cands = [ast.literal_eval(a) for a in sys.argv[2:]] or [
        ("plain tight3", None, 0,
         ((3, 2), (5, 4), (7, 8), (10, 16), (13, 32))),
    ]
    for tag, group, kf, sched in cands:
        if group:
            def step(fl, g=group, k=kf, s=sched):
                return pt_rgb.render_film_frames_merged(
                    scene, spec, cam, fl, k, g, s, nee)
            time_frames(f"{tag} {sched}", step, kf)
        else:
            k = kf or 8
            def step(fl, s=sched, k=k):
                return pt_rgb.render_film_frames(scene, spec, cam, fl, k, s, nee)
            time_frames(f"{tag} {sched}", step, k)


if __name__ == "__main__":
    main()
