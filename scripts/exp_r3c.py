"""Round-3 experiment C: kernel TILE sweep + scalar-overhead floor.

All in one process.  Kernel-only timings sit on the ~30 ms dispatch
floor, so only DIFFERENCES between configs are meaningful; the parked-ray
run bounds the kernel's control-flow overhead (no narrow phase at all).
"""

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

    from ti_raytrace_tpu.camera import CameraSpec, orbit_camera, ray_directions, ray_origins
    from ti_raytrace_tpu.examples.scenes import benchmark_100k
    from ti_raytrace_tpu.ops import cluster_trace as ct

    scene, _ = benchmark_100k()
    size = 512
    lo = np.asarray(scene.aabb_min); hi = np.asarray(scene.aabb_max)
    centre = 0.5 * (lo + hi)
    scale = float(np.linalg.norm(hi - lo)) * 0.8
    spec = CameraSpec(size, size)
    cam = orbit_camera(centre, 0.0, 0.0, scale)
    key = jax.random.PRNGKey(0)

    o = jnp.swapaxes(ray_origins(spec, cam), 0, 1)
    d = jnp.swapaxes(ray_directions(spec, cam, jnp.int32(1), key), 0, 1)
    N = o.shape[1]
    cb = scene.cluster_bounds; tri = scene.cluster_tri
    n_clusters = int(cb.shape[1]); block = int(tri.shape[1]) // n_clusters

    for tile in (256, 512, 1024):
        ct.TILE = tile
        n_pad = ((N + tile - 1) // tile) * tile
        n_tiles = n_pad // tile

        @jax.jit
        def prep(o, d, _tile=tile, _n_pad=n_pad, _n_tiles=n_tiles):
            rays = jnp.zeros((_n_pad, 8), jnp.float32)
            rays = rays.at[:N, 0:3].set(jnp.swapaxes(o, 0, 1))
            rays = rays.at[:N, 3:6].set(jnp.swapaxes(d, 0, 1))
            ko, kd = ct._coherence_key(scene, o, d)
            ko = jnp.pad(ko, (0, _n_pad - N), constant_values=jnp.uint32(0xFFFFFFFF))
            kd = jnp.pad(kd, (0, _n_pad - N), constant_values=jnp.uint32(0xFFFFFFFF))
            idx = jnp.arange(_n_pad, dtype=jnp.int32)
            _, _, order = jax.lax.sort((ko, kd, idx), num_keys=2, is_stable=True)
            rays_s = jnp.take(rays, order, axis=0)
            return rays_s, ct._tile_order(rays_s, _n_tiles, cb, n_clusters)

        def kern(rays_s, ot, cbs, sbs):
            return ct._run_kernel(rays_s, cbs, sbs, ot, tri, scene.cluster_attr,
                                  n_clusters, block, True, False)

        rays_s, (ot, cbs, sbs) = jax.block_until_ready(prep(o, d))
        out = jax.block_until_ready(kern(rays_s, ot, cbs, sbs))
        vis = np.asarray(out[::tile, ct.VISITED_COL])
        dt = timeit(lambda: jax.block_until_ready(kern(rays_s, ot, cbs, sbs)))
        log(f"TILE={tile} per-tile order: {dt*1e3:.2f} ms visited mean={vis.mean():.1f} "
            f"p90={np.percentile(vis,90):.0f} max={vis.max():.0f}")

        ot2, cbs2, sbs2 = ct._static_order(cb, n_clusters)
        out2 = jax.block_until_ready(kern(rays_s, ot2, cbs2, sbs2))
        vis2 = np.asarray(out2[::tile, ct.VISITED_COL])
        dt = timeit(lambda: jax.block_until_ready(kern(rays_s, ot2, cbs2, sbs2)))
        log(f"TILE={tile} shared order:  {dt*1e3:.2f} ms visited mean={vis2.mean():.1f}")

        # parked rays: every tile skips everything -> pure sweep overhead
        parked = jnp.full((n_pad, 8), 1e9, jnp.float32).at[:, 3:6].set(0.0)
        jax.block_until_ready(kern(parked, ot2, cbs2, sbs2))
        dt = timeit(lambda: jax.block_until_ready(kern(parked, ot2, cbs2, sbs2)))
        log(f"TILE={tile} all-parked:    {dt*1e3:.2f} ms (overhead floor)")


if __name__ == "__main__":
    main()
