"""Phase-resolved kernel diagnostics on REAL compacted carries.

Reproduces the bench frame's compaction phases (bounce to depth d, then
compact to the schedule width), and for each phase wavefront reports:
  - kernel-only time (best of n, composite-safe within one process),
  - visited clusters/tile (narrow-phase volume),
  - chunks slab-swept/tile (broad-phase volume, CHUNKS_COL).

This splits the deep-phase kernel cost (44 of 57 ms/frame, xplane trace)
into slab-sweep vs narrow-phase vs fixed overhead, which decides whether
the next kernel rewrite targets the Moller-Trumbore block or the sweep.

    python scripts/exp_r3o.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

fix_stale_platform()

import jax
import jax.numpy as jnp

wait_for_device()

from ti_raytrace_tpu.camera import CameraSpec, orbit_camera, ray_directions, ray_origins
from ti_raytrace_tpu.examples.scenes import BENCH_SCHEDULE, benchmark_100k
from ti_raytrace_tpu.integrators import pt_rgb
from ti_raytrace_tpu.ops import cluster_trace as ct


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
    scene, _ = benchmark_100k()
    size = 512
    lo = np.asarray(scene.aabb_min); hi = np.asarray(scene.aabb_max)
    centre = 0.5 * (lo + hi)
    scale = float(np.linalg.norm(hi - lo)) * 0.8
    spec = CameraSpec(size, size)
    cam = orbit_camera(centre, 0.0, 0.0, scale)
    key = jax.random.PRNGKey(0)
    nee = pt_rgb.has_nee_materials(scene)

    o = jnp.swapaxes(ray_origins(spec, cam), 0, 1)
    d = jnp.swapaxes(ray_directions(spec, cam, jnp.int32(1), key), 0, 1)
    N = o.shape[1]

    bounce = jax.jit(lambda c, k: pt_rgb._bounce(scene, c, k, nee, False))
    compact = jax.jit(pt_rgb._compact, static_argnums=(1,))

    # walk the schedule, producing each phase's starting carry
    widths = {0: N}
    for s, dv in BENCH_SCHEDULE:
        widths[s] = max(1024, N // dv)
    carry = pt_rgb._new_carry(o, d)
    phases = []  # (start_depth, carry at that depth, width)
    phases.append((0, carry, N))
    depth = 0
    for s, dv in BENCH_SCHEDULE:
        while depth < s:
            carry = bounce(carry, jax.random.fold_in(key, depth))
            depth += 1
        w = max(1024, N // dv)
        carry, _ = compact(carry, w)
        phases.append((depth, carry, w))

    cb = scene.cluster_bounds
    tri = scene.cluster_tri
    attr = scene.cluster_attr
    n_clusters = int(cb.shape[1])
    block = int(tri.shape[1]) // n_clusters

    for depth, c, w in phases:
        co, cd = c["origin"], c["direction"]
        alive = float(np.asarray(c["alive"]).mean())
        n_pad = ((w + ct.TILE - 1) // ct.TILE) * ct.TILE
        n_tiles = n_pad // ct.TILE

        @jax.jit
        def prep(o_, d_):
            rays = jnp.zeros((n_pad, 8), jnp.float32)
            rays = rays.at[:w, 0:3].set(jnp.swapaxes(o_, 0, 1))
            rays = rays.at[:w, 3:6].set(jnp.swapaxes(d_, 0, 1))
            ko, kd = ct._coherence_key(scene, o_, d_)
            ko = jnp.pad(ko, (0, n_pad - w), constant_values=jnp.uint32(0xFFFFFFFF))
            kd = jnp.pad(kd, (0, n_pad - w), constant_values=jnp.uint32(0xFFFFFFFF))
            idx = jnp.arange(n_pad, dtype=jnp.int32)
            _, _, order = jax.lax.sort((ko, kd, idx), num_keys=2, is_stable=True)
            rays_s = jnp.take(rays, order, axis=0)
            return (rays_s,) + ct._tile_order(rays_s, n_tiles, cb, n_clusters)

        rays_s, order_t, cbs, sbs = jax.block_until_ready(prep(co, cd))
        kern = lambda: ct._run_kernel(  # noqa: E731
            rays_s, cbs, sbs, order_t, tri, attr, n_clusters, block,
            True, False)
        out = jax.block_until_ready(kern())
        vis = np.asarray(out[::ct.TILE, ct.VISITED_COL])
        chk = np.asarray(out[::ct.TILE, ct.CHUNKS_COL])
        dt_p = timeit(lambda: jax.block_until_ready(prep(co, cd)))
        dt_k = timeit(lambda: jax.block_until_ready(kern()))
        log(f"phase depth>={depth} w={w} tiles={n_tiles} alive={alive:.3f}: "
            f"kernel {dt_k*1e3:.2f} ms  prep {dt_p*1e3:.2f} ms  "
            f"visited mean={vis.mean():.1f} p90={np.percentile(vis, 90):.0f} "
            f"max={vis.max():.0f}  chunks mean={chk.mean():.2f}/"
            f"{n_clusters // ct.CHUNK} p90={np.percentile(chk, 90):.0f}")


if __name__ == "__main__":
    main()
