"""Sweep kernel parameters against the real frame metric.

Usage: TILE=512 GROUP=32 COMPACTION="2,4;5,16" python scripts/sweep_frame.py
One process per config (the pallas jit cache keys on shapes, not globals).
"""

import os
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

    from ti_raytrace_tpu.ops import cluster_trace as ct

    tile = int(os.environ.get("TILE", ct.TILE))
    group = int(os.environ.get("GROUP", ct.GROUP))
    ct.TILE = tile
    ct.GROUP = group
    comp_env = os.environ.get("COMPACTION", "2,4;5,16")
    compaction = tuple(
        tuple(int(x) for x in p.split(",")) for p in comp_env.split(";")
    ) if comp_env else None

    from ti_raytrace_tpu.camera import CameraSpec, orbit_camera
    from ti_raytrace_tpu.examples.scenes import benchmark_100k
    from ti_raytrace_tpu.integrators import pt_rgb

    scene, _ = benchmark_100k()
    size = 512
    lo = np.asarray(scene.aabb_min); hi = np.asarray(scene.aabb_max)
    centre = 0.5 * (lo + hi)
    scale = float(np.linalg.norm(hi - lo)) * 0.8
    spec = CameraSpec(size, size)
    cam = orbit_camera(centre, 0.0, 0.0, scale)
    key = jax.random.PRNGKey(0)
    nee = pt_rgb.has_nee_materials(scene)

    n_frames = int(os.environ.get("N_FRAMES", "1"))
    if n_frames > 1:
        from ti_raytrace_tpu import film as film_mod

        fl = film_mod.new_film(512, 512)
        step = lambda f: pt_rgb.render_film_frames(  # noqa: E731
            scene, spec, cam, f, n_frames, compaction, nee)
        t0 = time.time()
        fl, _ = step(fl); fl.hdr.block_until_ready()
        log(f"compile+first: {time.time()-t0:.1f}s  mean={float(np.asarray(fl.hdr).mean()):.6f}")
        best = 1e9
        for _ in range(6):
            t0 = time.perf_counter()
            fl, _ = step(fl); fl.hdr.block_until_ready()
            best = min(best, time.perf_counter() - t0)
    else:
        fr = jax.jit(lambda k: pt_rgb.render_frame(scene, spec, cam, jnp.int32(1), k,
                                                   compaction, nee))
        t0 = time.time()
        img = fr(key); img.block_until_ready()
        log(f"compile+first: {time.time()-t0:.1f}s  mean={float(np.asarray(img).mean()):.6f}")
        best = 1e9
        for i in range(6):
            t0 = time.perf_counter()
            fr(jax.random.fold_in(key, i)).block_until_ready()
            best = min(best, time.perf_counter() - t0)
    log(f"TILE={tile} GROUP={group} comp={compaction} nf={n_frames}: "
        f"{best*1e3:.1f} ms -> {n_frames/best:.2f} fps")


if __name__ == "__main__":
    main()
