"""Empirical kernel cost decomposition per production phase.

ORIGIN_MT cut only 0.5 ms/frame where an op-count model predicted ~3 ms
— the model is wrong somewhere.  This measures, on REAL carries at the
production merged config (G=16):

  - kernel-only ms per phase (REPS kernel calls inside ONE jit; each
    iteration rewrites the unused ray row 6 so the axon tunnel cannot
    serve a cached dispatch and XLA cannot CSE),
  - the same with DIAG_NO_NARROW=1 (broad phase + fixed overhead only;
    jax.clear_caches() between flag variants — inner-jit jaxpr caches
    ignore module globals),
  - visited/tile + chunks/tile diagnostics.

    python scripts/exp_r5f.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

fix_stale_platform()

import jax

wait_for_device()

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join("/root/repo", ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from functools import partial

import jax.numpy as jnp
import numpy as np

from ti_raytrace_tpu.camera import CameraSpec, orbit_camera
from ti_raytrace_tpu.examples.scenes import BENCH_SCHEDULE_MERGED, benchmark_100k
from ti_raytrace_tpu.integrators import pt_rgb
from ti_raytrace_tpu.ops import cluster_trace as ct

GROUPF = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_phase_carries(scene, spec, cam, nee):
    """Mirror _render_group's phase structure; return [(depth0, carry)]
    with carry presorted (as the kernel sees it) for deep phases."""
    N = spec.width * spec.height
    key0 = jax.random.PRNGKey(0)
    compaction = BENCH_SCHEDULE_MERGED
    b_merge, dv0 = compaction[0]
    w1 = max(1024, N // dv0)

    bounce0 = jax.jit(lambda c, k, o0: pt_rgb._bounce(
        scene, c, k, nee, False, False, shared_origin=o0, coherent=True))
    compact = jax.jit(pt_rgb._compact, static_argnums=(1,))

    packs = []
    key_f = key0
    for g in range(GROUPF):
        k_cam, k_path = jax.random.split(key_f)
        o, d, inv = pt_rgb._camera_rays(spec, cam, jnp.int32(g), k_cam)
        c = pt_rgb._new_carry(o, d)
        c = bounce0(c, jax.random.fold_in(k_path, 0), o[:, 0])
        c, _ = compact(c, w1)
        c["pixel"] = c["pixel"] + g * N
        packs.append(pt_rgb._pack_carry(c))
        key_f, _ = jax.random.split(key_f)
    carry = pt_rgb._unpack_carry(jnp.concatenate(packs, axis=1))

    _, k_merge = jax.random.split(key0)
    phases = []  # (first_depth, presorted planar carry)
    starts = [s for s, _ in compaction]
    ends = starts[1:] + [pt_rgb.MAX_DEPTH]
    depth = b_merge
    for i, ((b0, dv), b1) in enumerate(zip(compaction, ends)):
        if i > 0:
            carry, _ = compact(carry, GROUPF * max(1024, N // dv))
        sorted_c = jax.jit(pt_rgb._sort_carry)(scene, carry)
        phases.append((b0, sorted_c))
        # advance to the next phase start with real merged bounces
        bounce = jax.jit(lambda c, k: pt_rgb._bounce(
            scene, c, k, nee, True, False))
        for dd in range(b0, min(b1, pt_rgb.MAX_DEPTH)):
            carry = bounce(carry, jax.random.fold_in(k_merge, dd))
    return phases


def kernel_inputs(scene, carry):
    o, d = carry["origin"], carry["direction"]
    N = o.shape[1]
    tile = ct.TILE
    n_pad = ((N + tile - 1) // tile) * tile
    pad = ((0, 0), (0, n_pad - N))
    rays = jnp.concatenate(
        [jnp.pad(o, pad), jnp.pad(d, pad), jnp.zeros((2, n_pad), jnp.float32)],
        axis=0)
    n_tiles = n_pad // tile
    cb = scene.cluster_bounds
    n_clusters = int(cb.shape[1])
    cent = jnp.swapaxes(rays[0:3].reshape(3, n_tiles, tile).mean(axis=2), 0, 1)
    order_t, cbs, sbs = ct._tile_order_from_cent(cent, cb, n_clusters)
    return rays, cbs, sbs, order_t, n_clusters


def time_kernel(scene, rays, cbs, sbs, order_t, n_clusters, reps):
    tri = scene.cluster_tri
    attr = scene.cluster_attr
    block = int(tri.shape[1]) // n_clusters
    mt = scene.cluster_mt[:, :4 * block]

    def many(rays):
        def body(i, acc):
            r = rays.at[6, :].set(jnp.float32(i))  # unused row: defeats
            out = ct._run_kernel(                  # tunnel cache + CSE
                r, cbs, sbs, order_t, tri, attr, mt, n_clusters, block,
                True, False, ct.TILE, True, True)
            return acc + out[0, 0]
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    f = jax.jit(many)
    f(rays).block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        f(rays).block_until_ready()
        times.append(time.perf_counter() - t0)
    med = sorted(times)[1]
    return med / reps * 1e3


def diag_counts(scene, rays, cbs, sbs, order_t, n_clusters):
    tri = scene.cluster_tri
    attr = scene.cluster_attr
    block = int(tri.shape[1]) // n_clusters
    mt = scene.cluster_mt[:, :4 * block]
    out = np.asarray(ct._run_kernel(
        rays, cbs, sbs, order_t, tri, attr, mt, n_clusters, block,
        True, False, ct.TILE, True, True))
    vis = out[ct.VISITED_COL, ::ct.TILE]
    chk = out[ct.CHUNKS_COL, ::ct.TILE]
    return vis, chk


def main():
    size = 512
    scene, _ = benchmark_100k()
    lo = np.asarray(scene.aabb_min)
    hi = np.asarray(scene.aabb_max)
    centre = 0.5 * (lo + hi)
    scale = float(np.linalg.norm(hi - lo)) * 0.8
    spec = CameraSpec(size, size)
    cam = orbit_camera(centre, 0.0, 0.0, scale)
    nee = pt_rgb.has_nee_materials(scene)

    t0 = time.time()
    phases = build_phase_carries(scene, spec, cam, nee)
    log(f"phase carries built in {time.time()-t0:.0f}s")

    inputs = []
    # bounce-0 camera phase: static morton order, shared origin
    o, d, _ = pt_rgb._camera_rays(spec, cam, jnp.int32(0),
                                  jax.random.PRNGKey(7))
    rays0 = jnp.concatenate([o, d, jnp.zeros((2, o.shape[1]), jnp.float32)], 0)
    cb = scene.cluster_bounds
    n_cl = int(cb.shape[1])
    ot0, cbs0, sbs0 = ct._point_order(cb, n_cl, o[:, 0])
    inputs.append((0, rays0, cbs0, sbs0, ot0, n_cl))
    vis, chk = diag_counts(scene, rays0, cbs0, sbs0, ot0, n_cl)
    log(f"phase depth>=0: lanes={rays0.shape[1]} "
        f"tiles={rays0.shape[1]//ct.TILE} visited/tile {vis.mean():.1f} "
        f"(p90 {np.percentile(vis, 90):.0f}) chunks {chk.mean():.2f}")
    for b0, c in phases:
        rays, cbs, sbs, order_t, n_clusters = kernel_inputs(scene, c)
        inputs.append((b0, rays, cbs, sbs, order_t, n_clusters))
        vis, chk = diag_counts(scene, rays, cbs, sbs, order_t, n_clusters)
        log(f"phase depth>={b0}: lanes={rays.shape[1]} "
            f"tiles={rays.shape[1]//ct.TILE} visited/tile {vis.mean():.1f} "
            f"(p90 {np.percentile(vis, 90):.0f}) chunks {chk.mean():.2f}")

    for label, flags in [("full", {}), ("no_narrow", {"DIAG_NO_NARROW": True})]:
        saved = {k: getattr(ct, k) for k in flags}
        for k, v in flags.items():
            setattr(ct, k, v)
        jax.clear_caches()
        try:
            for b0, rays, cbs, sbs, order_t, n_clusters in inputs:
                reps = max(4, (2 * 1024 * 1024) // rays.shape[1])
                ms = time_kernel(scene, rays, cbs, sbs, order_t,
                                 n_clusters, reps)
                us_tile = ms * 1e3 / (rays.shape[1] // ct.TILE)
                log(f"{label:10s} depth>={b0} lanes={rays.shape[1]:8d}: "
                    f"{ms:7.2f} ms/call  {us_tile:6.2f} us/tile")
        finally:
            for k, v in saved.items():
                setattr(ct, k, v)


if __name__ == "__main__":
    main()
