"""sky_dome spectral occupancy probe + schedule candidates (VERDICT r5 #6).

sky_dome is pt_spec (mirror sphere under the Hosek sky): most camera
rays miss at bounce 0 and bank sky radiance via miss_weight, so the
wavefront should collapse like single_model's.  This probes the TRUE
full-frame alive fraction per bounce, then times candidate compaction
schedules through render_film_frames_spec (the CLI's dispatch path).

    JAX_PLATFORMS=tpu PYTHONPATH=/root/repo:$PYTHONPATH \
        python scripts/exp_r10a.py sky_dome '("tag", kf, sched)' ...
"""

import ast
import os
import sys
import time

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

from ti_raytrace_tpu import film as film_mod
from ti_raytrace_tpu.camera import ray_directions, ray_origins
from ti_raytrace_tpu.examples.scenes import example_cached, make_camera
from ti_raytrace_tpu.integrators import pt_spec
from scripts.exp_r9b import log


def time_frames_spec(tag, step, kf, film_size=512, n_reps=5):
    fl = film_mod.new_film(film_size, film_size)
    t0 = time.perf_counter()
    fl, ov = step(fl)
    fl.hdr.block_until_ready()
    log(f"  {tag}: compile+first {time.perf_counter() - t0:.1f}s")
    times, ov_total = [], int(ov)
    for _ in range(n_reps):
        t0 = time.perf_counter()
        fl, ov = step(fl)
        fl.hdr.block_until_ready()
        times.append(time.perf_counter() - t0)
        ov_total += int(ov)
    med = sorted(times)[len(times) // 2]
    log(f"  {tag}: median {med/kf*1e3:6.1f} ms/frame (best "
        f"{min(times)/kf*1e3:6.1f}), overflow={ov_total}")
    return med / kf


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "sky_dome"
    scene, cfg = example_cached(name)
    spec, cam = make_camera(scene, cfg, 512, 512)
    sdata = pt_spec.make_spectral_data(**(cfg.sky or {}))

    k = jax.random.PRNGKey(0)
    o = jnp.swapaxes(ray_origins(spec, cam), 0, 1)
    d = jnp.swapaxes(ray_directions(spec, cam, jnp.int32(1), k), 0, 1)
    k_lam, k_path = jax.random.split(k)
    carry = pt_spec._new_carry_spec(sdata, o, d, k_lam)
    bounce = jax.jit(lambda c, kk: pt_spec._bounce(scene, sdata, c, kk))
    occ = []
    for depth in range(pt_spec.MAX_DEPTH):
        carry = bounce(carry, jax.random.fold_in(k_path, depth))
        f = float(np.asarray(carry["alive"]).mean())
        occ.append(round(f, 4))
        if f == 0.0:
            break
    log(f"{name}: FULL-frame alive after bounce 0..: {occ}")

    for a in sys.argv[2:]:
        tag, kf, sched = ast.literal_eval(a)

        def step(fl, s=sched, n=kf):
            return pt_spec.render_film_frames_spec(
                scene, sdata, spec, cam, fl, n_frames=n, compaction=s)
        time_frames_spec(f"{tag} {sched}", step, kf)


if __name__ == "__main__":
    main()
