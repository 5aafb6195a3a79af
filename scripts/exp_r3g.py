"""Round-3 experiment G: frame-level config variants, one process.
TILE=512, SMALL_WAVEFRONT (sort threshold) low, and min compaction
width — each needs jax.clear_caches() since they're read at trace time.
"""

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

    def frame_time(tag):
        fr = jax.jit(lambda k: pt_rgb.render_frame(
            scene, spec, cam, jnp.int32(1), k, compaction, nee))
        t0 = time.time()
        img = fr(key); img.block_until_ready()
        log(f"{tag}: compile+first {time.time()-t0:.1f}s "
            f"mean={float(np.asarray(img).mean()):.6f}")
        best = 1e9
        for i in range(5):
            t0 = time.perf_counter()
            fr(jax.random.fold_in(key, i)).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        log(f"{tag}: {best*1e3:.1f} ms -> {1/best:.2f} fps")

    frame_time("baseline (TILE=256 SW=32768)")

    ct.TILE = 512
    jax.clear_caches()
    frame_time("TILE=512")

    ct.TILE = 256
    ct.SMALL_WAVEFRONT = 2048
    jax.clear_caches()
    frame_time("TILE=256 SW=2048 (sort every width)")

    ct.TILE = 512
    jax.clear_caches()
    frame_time("TILE=512 SW=2048")


if __name__ == "__main__":
    main()
