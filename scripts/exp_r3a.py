"""Round-3 experiment A: decompose the 100k frame cost and A/B the
prep/ordering variants, all within ONE process (TPU state drifts between
processes — CLAUDE.md).

Measures:
  1. prep components: two-key ray sort | tile_order argsort+permute
  2. kernel-only: per-tile front-to-back order vs shared static order
  3. full frame: baseline vs shared-order vs 2/4-frame batching
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
    from ti_raytrace_tpu.integrators import pt_rgb
    from ti_raytrace_tpu.ops import cluster_trace as ct
    from ti_raytrace_tpu.ops.cluster_trace import TILE

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

    o = jnp.swapaxes(ray_origins(spec, cam), 0, 1)
    d = jnp.swapaxes(ray_directions(spec, cam, jnp.int32(1), key), 0, 1)
    N = o.shape[1]
    n_pad = ((N + TILE - 1) // TILE) * TILE
    cb = scene.cluster_bounds; tri = scene.cluster_tri
    n_clusters = int(cb.shape[1]); block = int(tri.shape[1]) // n_clusters
    n_tiles = n_pad // TILE

    # ---- 1. prep components -----------------------------------------
    @jax.jit
    def sort_only(o, d):
        rays = jnp.zeros((n_pad, 8), jnp.float32)
        rays = rays.at[:N, 0:3].set(jnp.swapaxes(o, 0, 1))
        rays = rays.at[:N, 3:6].set(jnp.swapaxes(d, 0, 1))
        ko, kd = ct._coherence_key(scene, o, d)
        ko = jnp.pad(ko, (0, n_pad - N), constant_values=jnp.uint32(0xFFFFFFFF))
        kd = jnp.pad(kd, (0, n_pad - N), constant_values=jnp.uint32(0xFFFFFFFF))
        idx = jnp.arange(n_pad, dtype=jnp.int32)
        _, _, order = jax.lax.sort((ko, kd, idx), num_keys=2, is_stable=True)
        return jnp.take(rays, order, axis=0), order

    @jax.jit
    def sort_onekey(o, d):
        """Single fused 32-bit key: 18 origin bits + 12 direction bits."""
        rays = jnp.zeros((n_pad, 8), jnp.float32)
        rays = rays.at[:N, 0:3].set(jnp.swapaxes(o, 0, 1))
        rays = rays.at[:N, 3:6].set(jnp.swapaxes(d, 0, 1))
        ko, kd = ct._coherence_key(scene, o, d)
        k = ((ko >> 12) << 12) | (kd >> 18)
        k = jnp.pad(k, (0, n_pad - N), constant_values=jnp.uint32(0xFFFFFFFF))
        idx = jnp.arange(n_pad, dtype=jnp.int32)
        _, order = jax.lax.sort((k, idx), num_keys=1, is_stable=True)
        return jnp.take(rays, order, axis=0), order

    @jax.jit
    def tile_order_only(rays_s):
        return ct._tile_order(rays_s, n_tiles, cb, n_clusters)

    rays_s, order = jax.block_until_ready(sort_only(o, d))
    dt = timeit(lambda: jax.block_until_ready(sort_only(o, d)))
    log(f"sort (2-key) + permute: {dt*1e3:.2f} ms")
    dt = timeit(lambda: jax.block_until_ready(sort_onekey(o, d)))
    log(f"sort (1-key) + permute: {dt*1e3:.2f} ms")
    ot, cbs, sbs = jax.block_until_ready(tile_order_only(rays_s))
    dt = timeit(lambda: jax.block_until_ready(tile_order_only(rays_s)))
    log(f"tile_order (argsort + permute bounds): {dt*1e3:.2f} ms")

    # ---- 2. kernel-only: per-tile vs shared static order -------------
    def kern(rays_s, ot, cbs, sbs):
        return ct._run_kernel(rays_s, cbs, sbs, ot, tri, scene.cluster_attr,
                              n_clusters, block, True, False)

    out = jax.block_until_ready(kern(rays_s, ot, cbs, sbs))
    vis = np.asarray(out[::TILE, ct.VISITED_COL])
    dt = timeit(lambda: jax.block_until_ready(kern(rays_s, ot, cbs, sbs)))
    log(f"kernel per-tile order: {dt*1e3:.2f} ms  visited mean={vis.mean():.1f} "
        f"p90={np.percentile(vis, 90):.0f} max={vis.max():.0f}")

    ot2, cbs2, sbs2 = ct._static_order(cb, n_clusters)
    out2 = jax.block_until_ready(kern(rays_s, ot2, cbs2, sbs2))
    vis2 = np.asarray(out2[::TILE, ct.VISITED_COL])
    dt = timeit(lambda: jax.block_until_ready(kern(rays_s, ot2, cbs2, sbs2)))
    log(f"kernel shared static order: {dt*1e3:.2f} ms  visited mean={vis2.mean():.1f} "
        f"p90={np.percentile(vis2, 90):.0f} max={vis2.max():.0f}")
    # results must agree (same winner per ray up to ties)
    t_a = np.asarray(out[:, 0]); t_b = np.asarray(out2[:, 0])
    log(f"  closest-t agreement: {np.mean(np.isclose(t_a, t_b, rtol=1e-5)):.4f}")

    # bounced wavefront (realistic incoherence)
    bounce = jax.jit(lambda c, k: pt_rgb._bounce(scene, c, k, nee, False))
    c1 = jax.block_until_ready(bounce(pt_rgb._new_carry(o, d), key))
    c2 = jax.block_until_ready(bounce(c1, jax.random.fold_in(key, 1)))
    rays_b, _ = jax.block_until_ready(sort_only(c2["origin"], c2["direction"]))
    otb, cbsb, sbsb = jax.block_until_ready(tile_order_only(rays_b))
    jax.block_until_ready(kern(rays_b, otb, cbsb, sbsb))
    dt = timeit(lambda: jax.block_until_ready(kern(rays_b, otb, cbsb, sbsb)))
    log(f"BOUNCED kernel per-tile order: {dt*1e3:.2f} ms")
    dt = timeit(lambda: jax.block_until_ready(kern(rays_b, ot2, cbs2, sbs2)))
    log(f"BOUNCED kernel shared static order: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
