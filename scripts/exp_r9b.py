"""CLI-scene production-path measurement (VERDICT r5 #4/#6).

For cornell_box / single_model (pt_rgb): print the calibrated occupancy
schedule, then A/B plain render_film_frames (the r4 CLI path, KF=8)
against render_film_frames_merged at candidate (schedule, group, KF)
configs — overflow-gated.  For sky_dome (pt_spec): probe occupancy with
the RGB bounce machinery (termination semantics match: mirror bounce or
die to the miss shader), then A/B render_film_frames_spec schedules.

One process per scene arg (TPU state drifts between processes; compare
within one run):

    JAX_PLATFORMS=tpu PYTHONPATH=/root/repo:$PYTHONPATH \
        python scripts/exp_r9b.py cornell_box
"""

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
from ti_raytrace_tpu.examples.scenes import example_cached, make_camera
from ti_raytrace_tpu.integrators import pt_rgb


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_frames(tag, step, kf, n_disp=4):
    fl = film_mod.new_film(512, 512)
    t0 = time.time()
    fl, ov = step(fl)
    fl.hdr.block_until_ready()
    log(f"  {tag}: compile+first {time.time()-t0:.1f}s")
    times = []
    ov_total = int(np.asarray(ov))
    for _ in range(n_disp):
        t0 = time.perf_counter()
        fl, ov = step(fl)
        fl.hdr.block_until_ready()
        times.append(time.perf_counter() - t0)
        ov_total += int(np.asarray(ov))
    med = sorted(times)[len(times) // 2]
    log(f"  {tag}: median {med/kf*1e3:6.1f} ms/frame (best "
        f"{min(times)/kf*1e3:6.1f}), overflow={ov_total}")
    return med / kf


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "cornell_box"
    scene, cfg = example_cached(name)
    spec, cam = make_camera(scene, cfg, 512, 512)
    nee = pt_rgb.has_nee_materials(scene)

    # occupancy probe (pt_rgb machinery; for sky_dome the RGB bounce
    # still mirrors the spectral termination: hit-or-die-to-miss)
    sched = pt_rgb.calibrate_compaction(scene, spec, cam)
    log(f"{name}: nee={nee} calibrated schedule: {sched}")
    k = jax.random.PRNGKey(0)
    pspec_frac = []
    from ti_raytrace_tpu.camera import ray_directions, ray_origins
    o = jnp.swapaxes(ray_origins(spec, cam), 0, 1)
    d = jnp.swapaxes(ray_directions(spec, cam, jnp.int32(1), k), 0, 1)
    presort = pt_rgb.PRESORT_CARRY and pt_rgb.needs_presort(scene)
    bounce = jax.jit(lambda c, kk: pt_rgb._bounce(scene, c, kk, nee, presort))
    carry = pt_rgb._new_carry(o[:, :65536], d[:, :65536])
    for depth in range(10):
        carry = bounce(carry, jax.random.fold_in(k, depth))
        f = float(np.asarray(carry["alive"]).mean())
        pspec_frac.append(round(f, 4))
        if f == 0.0:
            break
    log(f"{name}: occupancy after bounce 1..: {pspec_frac}")

    if cfg.integrator == "pt_spec":
        from ti_raytrace_tpu.integrators import pt_spec

        sdata = pt_spec.make_spectral_data(**(cfg.sky or {}))
        for tag, compaction, kf in (
            ("plain kf8  sched=None", None, 8),
            ("spec kf8   " + str(sched), sched, 8),
            ("spec kf32  " + str(sched), sched, 32),
        ):
            def step(fl, compaction=compaction, kf=kf):
                return pt_spec.render_film_frames_spec(
                    scene, sdata, spec, cam, fl, n_frames=kf,
                    compaction=compaction)
            time_frames(tag, step, kf)
        return

    # pt_rgb scenes
    configs = [("plain kf8  " + str(cfg.compaction != None and "auto" or ""),
                lambda fl: pt_rgb.render_film_frames(
                    scene, spec, cam, fl, 8, sched, nee), 8)]
    if sched:
        for group, kf in ((8, 32), (16, 32), (8, 64)):
            configs.append((
                f"merged g{group} kf{kf} {sched}",
                lambda fl, g=group, kf_=kf: pt_rgb.render_film_frames_merged(
                    scene, spec, cam, fl, kf_, g, sched, nee), kf))
    for tag, step, kf in configs:
        time_frames(tag, step, kf)


if __name__ == "__main__":
    main()
