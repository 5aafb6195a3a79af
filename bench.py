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
    from ti_raytrace_tpu.core import constants as C
    from ti_raytrace_tpu.io.assets import asset_path
    from ti_raytrace_tpu.io.meshgen import densify_to
    from ti_raytrace_tpu.io.obj import load_obj
    from ti_raytrace_tpu.scene.build import MaterialRec, SceneBuilder, sphere_shape

    mesh = load_obj(asset_path("model/Teapot.obj"))
    import numpy as np

    pos = np.concatenate(mesh.tri_pos)
    nrm = np.concatenate(mesh.tri_normal)
    uv = np.concatenate(mesh.tri_uv)
    pos, nrm, uv = densify_to(pos, nrm, uv, n_target)
    log(f"benchmark mesh: {pos.shape[0]} triangles")

    b = SceneBuilder()
    # the single_model material override: glass, ior 1.3, extinction 5
    b.add_triangles(pos, nrm, uv, MaterialRec(C.MAT_GLASS, color=(0.8, 0.8, 0.8), p0=1.3, p1=5.0))
    b.add_shape(
        sphere_shape([0.0, 20.0, 0.0], 5.0),
        MaterialRec(C.MAT_LIGHT, color=[50.0, 50.0, 50.0]),
    )
    try:
        b.add_env(asset_path("image/env.png"), 5.0)
    except FileNotFoundError:
        log("env.png not found; black env")
    return b.build()


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
