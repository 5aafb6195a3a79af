"""Full-frame occupancy probe + schedule candidates (single process).

The exp_r9b probe sampled the first 65536 lanes in SCANLINE order — the
top band of the image, which under-counts a centered subject (the
single_model sphere sits in the middle of frame: band occupancy 5.45%
vs the true full-frame 22%).  This probe runs the bounce loop on the
FULL wavefront, then times candidate schedules from argv.

    JAX_PLATFORMS=tpu PYTHONPATH=/root/repo:$PYTHONPATH \
        python scripts/exp_r9e.py single_model '("tag", group, kf, sched)' ...
"""

import ast
import os
import sys

sys.path.insert(0, "/root/repo")

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

fix_stale_platform()

import jax
import jax.numpy as jnp
import numpy as np

wait_for_device()

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join("/root/repo", ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from ti_raytrace_tpu.camera import ray_directions, ray_origins
from ti_raytrace_tpu.examples.scenes import example_cached, make_camera
from ti_raytrace_tpu.integrators import pt_rgb
from scripts.exp_r9b import time_frames, log


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "single_model"
    scene, cfg = example_cached(name)
    spec, cam = make_camera(scene, cfg, 512, 512)
    nee = pt_rgb.has_nee_materials(scene)

    k = jax.random.PRNGKey(0)
    o = jnp.swapaxes(ray_origins(spec, cam), 0, 1)
    d = jnp.swapaxes(ray_directions(spec, cam, jnp.int32(1), k), 0, 1)
    presort = pt_rgb.PRESORT_CARRY and pt_rgb.needs_presort(scene)
    bounce = jax.jit(lambda c, kk: pt_rgb._bounce(scene, c, kk, nee, presort))
    carry = pt_rgb._new_carry(o, d)
    occ = []
    for depth in range(12):
        carry = bounce(carry, jax.random.fold_in(k, depth))
        f = float(np.asarray(carry["alive"]).mean())
        occ.append(round(f, 4))
        if f == 0.0:
            break
    log(f"{name}: FULL-frame alive after bounce 0..: {occ}")

    for a in sys.argv[2:]:
        tag, group, kf, sched = ast.literal_eval(a)
        if group:
            def step(fl, g=group, k=kf, s=sched):
                return pt_rgb.render_film_frames_merged(
                    scene, spec, cam, fl, k, g, s, nee)
        else:
            def step(fl, s=sched, k=kf):
                return pt_rgb.render_film_frames(scene, spec, cam, fl, k, s, nee)
        time_frames(f"{tag} {sched}", step, kf)


if __name__ == "__main__":
    main()
