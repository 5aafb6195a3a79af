"""Coherence-key sweep: origin-cell granularity vs deep-phase visits/tile.

The deep compacted phases are narrow-phase bound (exp_r3o: visited/tile
17/32/62 at bounces 1-3/4-7/8+) while individual rays plausibly need far
fewer clusters — the per-tile visit count is the UNION over 256 rays.
The production sort key is origin-major at FULL 30-bit morton precision
with direction as a minor tiebreak; a tile then spans a contiguous run
of tiny origin cells with arbitrary direction spread, and diverging
directions inflate the union.

This sweep coarsens the origin key (mask off the low 3*k bits) so the
direction morton orders rays WITHIN each coarse origin cell, and also
tries direction-major.  Sorting happens after RNG draws, so every mode
renders bit-identically — pure perf.  All modes run in ONE process
(separate jit closures per mode; the kernel itself is identical).

    python scripts/exp_r3p.py
"""

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

    carry = pt_rgb._new_carry(o, d)
    phases = []
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
    mt = scene.cluster_mt[:, :4 * block]

    # (label, origin-low-bits-masked, dir_major)
    modes = [
        ("o30-d", 0, False),    # production: full-precision origin major
        ("o24-d", 6, False),
        ("o18-d", 12, False),
        ("o12-d", 18, False),
        ("o6-d", 24, False),
        ("d-o30", 0, True),     # direction major, origin minor
    ]

    for depth, c, w in phases:
        co, cd = c["origin"], c["direction"]
        alive = float(np.asarray(c["alive"]).mean())
        n_pad = ((w + ct.TILE - 1) // ct.TILE) * ct.TILE
        n_tiles = n_pad // ct.TILE
        log(f"--- phase depth>={depth} w={w} tiles={n_tiles} alive={alive:.3f}")

        for label, mask_bits, dir_major in modes:
            @jax.jit
            def prep(o_, d_, mask_bits=mask_bits, dir_major=dir_major):
                rays = jnp.zeros((n_pad, 8), jnp.float32)
                rays = rays.at[:w, 0:3].set(jnp.swapaxes(o_, 0, 1))
                rays = rays.at[:w, 3:6].set(jnp.swapaxes(d_, 0, 1))
                ko, kd = ct._coherence_key(scene, o_, d_)
                if mask_bits:
                    ko = ko & jnp.uint32((0xFFFFFFFF << mask_bits) & 0xFFFFFFFF)
                if dir_major:
                    ko, kd = kd, ko
                ko = jnp.pad(ko, (0, n_pad - w),
                             constant_values=jnp.uint32(0xFFFFFFFF))
                kd = jnp.pad(kd, (0, n_pad - w),
                             constant_values=jnp.uint32(0xFFFFFFFF))
                idx = jnp.arange(n_pad, dtype=jnp.int32)
                _, _, order = jax.lax.sort((ko, kd, idx), num_keys=2,
                                           is_stable=True)
                rays_s = jnp.take(rays, order, axis=0)
                return (rays_s,) + ct._tile_order(rays_s, n_tiles, cb,
                                                  n_clusters)

            rays_s, order_t, cbs, sbs = jax.block_until_ready(prep(co, cd))
            kern = lambda: ct._run_kernel(  # noqa: E731
                rays_s, cbs, sbs, order_t, tri, attr, mt,
                n_clusters, block, True, False)
            out = jax.block_until_ready(kern())
            vis = np.asarray(out[::ct.TILE, ct.VISITED_COL])
            chk = np.asarray(out[::ct.TILE, ct.CHUNKS_COL])
            dt_k = timeit(lambda: jax.block_until_ready(kern()))
            log(f"  {label:7s} kernel {dt_k*1e3:6.2f} ms  "
                f"visited mean={vis.mean():5.1f} p90={np.percentile(vis, 90):4.0f} "
                f"max={vis.max():4.0f}  chunks mean={chk.mean():.2f}")


if __name__ == "__main__":
    main()
