"""Cross-frame deep-phase merge: does packing G frames' survivors into
one wavefront cut visited/tile enough to pay?

exp_r3p showed the sort key is already optimal: the per-tile cluster
union is intrinsic at a given survivor DENSITY.  But density is a free
variable — merging G frames' compacted carries at the same total lane
count packs G-times more live rays per origin cell, so each 256-ray
tile spans a smaller cell and its cluster union should shrink.

For each deep phase (depth>=1 @65k, >=4 @16k, >=8 @4k) this measures:
  baseline: G separate kernels at width w   (production behavior)
  merged:   ONE kernel at width G*w on the concatenated carries
comparing total kernel ms and visited/tile.  RNG per frame differs, so
the merged carries are exactly what a merged render loop would see.

    python scripts/exp_r3q.py
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

G = 4


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
    nee = pt_rgb.has_nee_materials(scene)

    bounce = jax.jit(lambda c, k: pt_rgb._bounce(scene, c, k, nee, False))
    compact = jax.jit(pt_rgb._compact, static_argnums=(1,))

    # per-frame phase carries, G frames with distinct keys
    N = size * size
    frames = []
    for g in range(G):
        key = jax.random.PRNGKey(100 + g)
        k_cam, k_path = jax.random.split(key)
        o = jnp.swapaxes(ray_origins(spec, cam), 0, 1)
        d = jnp.swapaxes(ray_directions(spec, cam, jnp.int32(g), k_cam), 0, 1)
        carry = pt_rgb._new_carry(o, d)
        phases = {}
        depth = 0
        for s, dv in BENCH_SCHEDULE:
            while depth < s:
                carry = bounce(carry, jax.random.fold_in(k_path, depth))
                depth += 1
            w = max(1024, N // dv)
            carry, _ = compact(carry, w)
            phases[depth] = (carry, w)
        frames.append(phases)
        log(f"frame {g} carries built")

    cb = scene.cluster_bounds
    tri = scene.cluster_tri
    attr = scene.cluster_attr
    n_clusters = int(cb.shape[1])
    block = int(tri.shape[1]) // n_clusters
    mt = scene.cluster_mt[:, :4 * block]

    def run_once(o_, d_, w):
        """sort + tile-order + kernel at width w (production pipeline)."""
        n_pad = ((w + ct.TILE - 1) // ct.TILE) * ct.TILE
        n_tiles = n_pad // ct.TILE

        @jax.jit
        def prep(o__, d__):
            rays = jnp.zeros((n_pad, 8), jnp.float32)
            rays = rays.at[:w, 0:3].set(jnp.swapaxes(o__, 0, 1))
            rays = rays.at[:w, 3:6].set(jnp.swapaxes(d__, 0, 1))
            ko, kd = ct._coherence_key(scene, o__, d__)
            ko = jnp.pad(ko, (0, n_pad - w),
                         constant_values=jnp.uint32(0xFFFFFFFF))
            kd = jnp.pad(kd, (0, n_pad - w),
                         constant_values=jnp.uint32(0xFFFFFFFF))
            idx = jnp.arange(n_pad, dtype=jnp.int32)
            _, _, order = jax.lax.sort((ko, kd, idx), num_keys=2,
                                       is_stable=True)
            rays_s = jnp.take(rays, order, axis=0)
            return (rays_s,) + ct._tile_order(rays_s, n_tiles, cb, n_clusters)

        rays_s, order_t, cbs, sbs = jax.block_until_ready(prep(o_, d_))
        kern = lambda: ct._run_kernel(  # noqa: E731
            rays_s, cbs, sbs, order_t, tri, attr, mt,
            n_clusters, block, True, False)
        out = jax.block_until_ready(kern())
        vis = np.asarray(out[::ct.TILE, ct.VISITED_COL])
        dt = timeit(lambda: jax.block_until_ready(kern()))
        return dt, vis

    for s, _dv in BENCH_SCHEDULE:
        carries = [f[s] for f in frames]
        w = carries[0][1]
        alive = float(np.mean([np.asarray(c["alive"]).mean()
                               for c, _ in carries]))
        log(f"--- phase depth>={s} w={w} alive={alive:.3f}")

        # baseline: G separate kernels
        tot, vis_all = 0.0, []
        for c, _ in carries:
            dt, vis = run_once(c["origin"], c["direction"], w)
            tot += dt
            vis_all.append(vis)
        vis_all = np.concatenate(vis_all)
        log(f"  separate x{G}: total {tot*1e3:6.2f} ms  "
            f"visited mean={vis_all.mean():5.1f} "
            f"p90={np.percentile(vis_all, 90):4.0f}")

        # merged: one kernel at G*w
        om = jnp.concatenate([c["origin"] for c, _ in carries], axis=1)
        dm = jnp.concatenate([c["direction"] for c, _ in carries], axis=1)
        dt, vis = run_once(om, dm, G * w)
        log(f"  merged  x1 : total {dt*1e3:6.2f} ms  "
            f"visited mean={vis.mean():5.1f} "
            f"p90={np.percentile(vis, 90):4.0f}")


if __name__ == "__main__":
    main()
