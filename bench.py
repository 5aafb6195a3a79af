"""Driver benchmark: progressive path tracing on the reference's headline
workload (README.md:56-58 — 30 fps at 1 spp on a 100k-triangle mesh,
512x512, RTX 2070 Super).

`model/mc.obj` is a missing blob upstream, so the 100k-triangle scene is
a densified Teapot (>= 100k tris) with the single_model material setup
(glass override + sphere light + env map, example/single_model.py:27-34).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra context lines go to stderr.  Startup is cached: the scene's host
arrays live under .cache/ and the compaction schedule is the measured
constant scenes.BENCH_SCHEDULE, verified at runtime by the overflow
counter (render_frame_stats) instead of re-calibrated per run.
"""

import json
import os
import sys
import time

BASELINE_FPS = 30.0  # reference on RTX 2070 Super (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    try:  # persistent compile cache: cuts repeat-run startup
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), ".cache", "jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        log("compilation cache unavailable:", e)

    import numpy as np

    from ti_raytrace_tpu import film as film_mod
    from ti_raytrace_tpu.camera import CameraSpec, orbit_camera
    from ti_raytrace_tpu.examples.scenes import benchmark_100k
    from ti_raytrace_tpu.integrators import pt_rgb

    size = 512
    t0 = time.time()
    scene, cfg = benchmark_100k()
    log(f"scene build: {time.time() - t0:.1f}s, prims={scene.n_prims}")

    lo = np.asarray(scene.aabb_min)
    hi = np.asarray(scene.aabb_max)
    centre = 0.5 * (lo + hi)
    scale = float(np.linalg.norm(hi - lo)) * 0.8
    spec = CameraSpec(size, size)
    cam = orbit_camera(centre, 0.0, 0.0, scale)

    # all-glass scene: NEE contributes exactly zero -> compile it out
    nee = pt_rgb.has_nee_materials(scene)
    compaction = cfg.compaction
    log(f"nee={nee} compaction={compaction}")

    import functools

    import jax as _jax
    import jax.numpy as jnp

    def jnp_zero():
        return jnp.int32(0)

    @functools.partial(_jax.jit, donate_argnums=(0,))
    def step(fl, ov_total):
        """One dispatch per frame: render + overflow + film accumulate."""
        rad, ov = pt_rgb.render_frame_stats(
            scene, spec, cam, fl.frame, fl.key, compaction, nee
        )
        return film_mod.accumulate(fl, rad), ov_total + ov

    fl = film_mod.new_film(size, size)
    t0 = time.time()
    fl, ov_total = step(fl, jnp_zero())
    fl.hdr.block_until_ready()
    log(f"compile + first frame: {time.time() - t0:.1f}s")

    n = 16
    times = []
    t0 = time.time()
    for _ in range(n):
        tf = time.perf_counter()
        fl, ov_total = step(fl, ov_total)
        fl.hdr.block_until_ready()  # per-frame sync: robust through the tunnel
        times.append(time.perf_counter() - tf)
    dt = time.time() - t0
    fps = n / dt
    overflow_total = int(np.asarray(ov_total))
    log(f"{n} frames in {dt:.2f}s (best {min(times)*1e3:.1f} ms, median "
        f"{sorted(times)[n // 2]*1e3:.1f} ms); compaction overflow kills: "
        f"{overflow_total}"
        + (" (estimator exact)" if overflow_total == 0 else " (DEPTH BIAS!)"))
    try:
        film_mod.save_png(fl, "/tmp/bench_render.png")
    except Exception as e:  # pragma: no cover
        log("snapshot failed:", e)

    print(
        json.dumps(
            dict(
                metric="pt_progressive_fps_100k_tri_512px",
                value=round(fps, 3),
                unit="fps_at_1spp",
                vs_baseline=round(fps / BASELINE_FPS, 3),
            )
        )
    )


if __name__ == "__main__":
    main()
