"""Round-3 experiment E: k sequential frames per dispatch (film folded
in-graph) — amortizes the ~30 ms tunnel dispatch floor without the
batched-wavefront sort blowup (exp_r3b measured concatenated frames at
4x the per-frame cost)."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device
    fix_stale_platform()

    import jax

    wait_for_device()
    import jax.numpy as jnp

    from ti_raytrace_tpu import film as film_mod
    from ti_raytrace_tpu.camera import CameraSpec, orbit_camera
    from ti_raytrace_tpu.examples.scenes import benchmark_100k
    from ti_raytrace_tpu.integrators import pt_rgb

    scene, cfg = benchmark_100k()
    size = 512
    lo = np.asarray(scene.aabb_min); hi = np.asarray(scene.aabb_max)
    centre = 0.5 * (lo + hi)
    scale = float(np.linalg.norm(hi - lo)) * 0.8
    spec = CameraSpec(size, size)
    cam = orbit_camera(centre, 0.0, 0.0, scale)
    nee = pt_rgb.has_nee_materials(scene)
    compaction = cfg.compaction

    import functools

    for k_frames in (1, 2, 4, 8):
        @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("kf",))
        def step(fl, kf=k_frames):
            def body(i, f):
                key = jax.random.fold_in(jax.random.PRNGKey(7), f.frame)
                rad = pt_rgb.render_frame(scene, spec, cam, f.frame, key,
                                          compaction, nee)
                return film_mod.accumulate(f, rad)
            return jax.lax.fori_loop(0, kf, body, fl)

        fl = film_mod.new_film(size, size)
        t0 = time.time()
        fl = step(fl); fl.hdr.block_until_ready()
        log(f"kf={k_frames} compile+first: {time.time()-t0:.1f}s")
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            fl = step(fl); fl.hdr.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        log(f"kf={k_frames}: {best*1e3:.1f} ms/dispatch -> "
            f"{k_frames/best:.2f} fps  film_mean={float(np.asarray(fl.hdr).mean()):.6f}")


if __name__ == "__main__":
    main()
