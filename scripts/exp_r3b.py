"""Round-3 experiment B: end-to-end frame variants (baseline, batched
2/4 frames per dispatch, shared static cluster order), one process.

HISTORICAL RECORD — measured the batched-wavefront variant
(render_frames_batched) 4x slower than sequential frames; that API was
subsequently removed in favour of render_film_frames (the sequential
fori_loop batching bench.py uses), so this script no longer runs."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, n=5):
    fn()
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device
    fix_stale_platform()

    import jax

    wait_for_device()
    import jax.numpy as jnp

    from ti_raytrace_tpu.camera import CameraSpec, orbit_camera
    from ti_raytrace_tpu.examples.scenes import benchmark_100k
    from ti_raytrace_tpu.integrators import pt_rgb
    from ti_raytrace_tpu.ops import cluster_trace as ct

    scene, cfg = benchmark_100k()
    size = 512
    lo = np.asarray(scene.aabb_min); hi = np.asarray(scene.aabb_max)
    centre = 0.5 * (lo + hi)
    scale = float(np.linalg.norm(hi - lo)) * 0.8
    spec = CameraSpec(size, size)
    cam = orbit_camera(centre, 0.0, 0.0, scale)
    key = jax.random.PRNGKey(0)
    nee = pt_rgb.has_nee_materials(scene)
    compaction = cfg.compaction

    fr = jax.jit(lambda k: pt_rgb.render_frame(scene, spec, cam, jnp.int32(1), k,
                                               compaction, nee))
    dt = timeit(lambda: fr(key).block_until_ready(), n=4)
    base_mean = float(np.asarray(fr(key)).mean())
    log(f"frame baseline (per-tile): {dt*1e3:.1f} ms -> {1/dt:.2f} fps "
        f"mean={base_mean:.6f}")

    for nf in (2, 4):
        frb = jax.jit(lambda k, _nf=nf: pt_rgb.render_frames_batched(
            scene, spec, cam, jnp.int32(1), k, _nf, compaction, nee))
        t0 = time.time()
        img = frb(key); img.block_until_ready()
        log(f"  batched nf={nf} compile+first: {time.time()-t0:.1f}s "
            f"mean={float(np.asarray(img).mean()):.6f}")
        dt = timeit(lambda: frb(key).block_until_ready(), n=4)
        log(f"frame batched nf={nf}: {dt*1e3:.1f} ms -> {nf/dt:.2f} fps")

    # shared static order end-to-end (cache must be cleared: the flag is
    # read at trace time, not part of the jit key)
    ct.PER_TILE_ORDER = False
    jax.clear_caches()
    fr2 = jax.jit(lambda k: pt_rgb.render_frame(scene, spec, cam, jnp.int32(1), k,
                                                compaction, nee))
    t0 = time.time()
    img = fr2(key); img.block_until_ready()
    log(f"  shared-order compile+first: {time.time()-t0:.1f}s "
        f"mean={float(np.asarray(img).mean()):.6f} (baseline {base_mean:.6f})")
    dt = timeit(lambda: fr2(key).block_until_ready(), n=4)
    log(f"frame shared static order: {dt*1e3:.1f} ms -> {1/dt:.2f} fps")


if __name__ == "__main__":
    main()


if __name__ == "__main__":
    main()
