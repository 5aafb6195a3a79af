"""Driver benchmark: progressive path tracing on the reference's headline
workload (README.md:56-58 — 30 fps at 1 spp on a 100k-triangle mesh,
512x512, RTX 2070 Super).

`model/mc.obj` is a missing blob upstream, so the 100k-triangle scene is
a densified Teapot (>= 100k tris) with the single_model material setup
(glass override + sphere light + env map, example/single_model.py:27-34).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra context lines go to stderr.
"""

import json
import sys
import time

BASELINE_FPS = 30.0  # reference on RTX 2070 Super (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_bench_scene(n_target=100_000):
    from ti_raytrace_tpu.examples.scenes import benchmark_100k

    scene, _ = benchmark_100k(n_target)
    log(f"benchmark scene: {scene.n_prims} prims")
    return scene


def main():
    import jax
    import numpy as np

    from ti_raytrace_tpu import film as film_mod
    from ti_raytrace_tpu.camera import CameraSpec, orbit_camera
    from ti_raytrace_tpu.integrators import pt_rgb

    size = 512
    t0 = time.time()
    scene = build_bench_scene()
    log(f"scene build: {time.time() - t0:.1f}s, prims={scene.n_prims}")

    lo = np.asarray(scene.aabb_min)
    hi = np.asarray(scene.aabb_max)
    centre = 0.5 * (lo + hi)
    scale = float(np.linalg.norm(hi - lo)) * 0.8
    spec = CameraSpec(size, size)
    cam = orbit_camera(centre, 0.0, 0.0, scale)

    # all-glass scene: NEE contributes exactly zero -> compile it out
    nee = pt_rgb.has_nee_materials(scene)
    # calibrate the wavefront compaction schedule from a probe frame
    # (this scene's paths terminate early: glass + Beer roulette)
    t1 = time.time()
    compaction = pt_rgb.calibrate_compaction(scene, spec, cam, margin=1.4)
    log(f"nee={nee} compaction={compaction} (calibrated in {time.time()-t1:.1f}s)")

    fl = film_mod.new_film(size, size)
    t0 = time.time()
    rad = pt_rgb.render_frame(scene, spec, cam, fl.frame, fl.key, compaction, nee)
    rad.block_until_ready()
    log(f"compile + first frame: {time.time() - t0:.1f}s")
    fl = film_mod.accumulate(fl, rad)

    n = 16
    t0 = time.time()
    for _ in range(n):
        rad = pt_rgb.render_frame(scene, spec, cam, fl.frame, fl.key, compaction, nee)
        rad.block_until_ready()  # per-frame sync: robust through the tunnel
        fl = film_mod.accumulate(fl, rad)
    fl.hdr.block_until_ready()
    dt = time.time() - t0
    fps = n / dt
    log(f"{n} frames in {dt:.2f}s")
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
