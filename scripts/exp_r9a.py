"""Where does the veach BDPT second go?  Phase timing in ONE process.

Times, at 512^2 with the production n_slices=2 (131072-lane slices):
  A. build_subpaths alone        (eye+light walks: 7 fused trace depths)
  B. subpaths + shadow trace     (adds the 28-strategy batched trace)
  C. full _render_slice          (adds per-strategy math + MIS)
so B-A ~ shadow trace, C-B ~ connection/MIS vector math.  All variants
share one process (TPU state drifts BETWEEN processes, CLAUDE.md) and
sync per dispatch.

    JAX_PLATFORMS=tpu PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exp_r9a.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

fix_stale_platform()

import jax
import jax.numpy as jnp
import numpy as np

wait_for_device()

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join("/root/repo", ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from ti_raytrace_tpu.camera import ray_directions, ray_origins
from ti_raytrace_tpu.examples.scenes import example_cached, make_camera
from ti_raytrace_tpu.integrators import bdpt_rgb
from ti_raytrace_tpu.integrators.bdpt_rgb import (
    MAX_DEPTH,
    _connections,
    _render_slice,
    _shadow_requests,
    build_subpaths,
)
from ti_raytrace_tpu.scene.intersect import trace


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    size = 512
    n_slices = 2
    scene, cfg = example_cached("veach_bdpt")
    spec, cam = make_camera(scene, cfg, size, size)
    N = size * size
    ns = N // n_slices
    max_depth = MAX_DEPTH

    def slice_rays(frame, key, slice_i):
        k_cam, k_eye, k_light, k_conn = jax.random.split(key, 4)
        o_full = jnp.swapaxes(ray_origins(spec, cam), 0, 1)
        d_full = jnp.swapaxes(ray_directions(spec, cam, frame, k_cam), 0, 1)
        start = slice_i * ns
        o = jax.lax.dynamic_slice_in_dim(o_full, start, ns, axis=1)
        d = jax.lax.dynamic_slice_in_dim(d_full, start, ns, axis=1)
        return (o, d, jax.random.fold_in(k_eye, slice_i),
                jax.random.fold_in(k_light, slice_i),
                jax.random.fold_in(k_conn, slice_i))

    @jax.jit
    def phase_a(frame, key, slice_i):
        o, d, ke, kl, kc = slice_rays(frame, key, slice_i)
        eye, ec, light, lc = build_subpaths(
            scene, o, d, ke, kl,
            eye_depth=max_depth + 2, light_depth=max_depth + 1)
        # reduce to a scalar so nothing is DCE'd
        s = ec.sum() + lc.sum()
        for v in eye + light:
            s = s + v["pos"].sum() + v["beta"].sum()
        return s

    @jax.jit
    def phase_b(frame, key, slice_i):
        o, d, ke, kl, kc = slice_rays(frame, key, slice_i)
        eye, ec, light, lc = build_subpaths(
            scene, o, d, ke, kl,
            eye_depth=max_depth + 2, light_depth=max_depth + 1)
        pairs = [
            (e, l)
            for e in range(1, len(eye) + 1)
            for l in range(0, len(light) + 1)
            if not ((l == 1 and e == 1) or l + e - 2 < 0
                    or l + e - 2 > max_depth)
        ]
        req_o, req_d, req_tmax, req_sel, _tags = _shadow_requests(
            scene, spec, cam, eye, ec, light, lc, kc, pairs)
        t_all, prim_all = trace(
            scene, jnp.concatenate(req_o, 1), jnp.concatenate(req_d, 1),
            tmax=jnp.concatenate(req_tmax))
        s = ec.sum() + lc.sum() + t_all.sum() + prim_all.sum()
        for v in eye + light:
            s = s + v["pos"].sum() + v["beta"].sum()
        return s

    def run(tag, fn, n_frames=6):
        key0 = jax.random.PRNGKey(0)
        # warm
        fn(jnp.int32(0), key0, jnp.int32(0)).block_until_ready()
        ts = []
        for f in range(1, n_frames + 1):
            k = jax.random.fold_in(key0, f)
            t0 = time.perf_counter()
            for i in range(n_slices):
                fn(jnp.int32(f), k, jnp.int32(i)).block_until_ready()
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        log(f"{tag}: median {med*1e3:7.1f} ms/frame  "
            f"(best {min(ts)*1e3:7.1f})")
        return med

    t0 = time.time()
    a = run("A subpaths              ", phase_a)
    b = run("B subpaths+shadow trace ", phase_b)

    @jax.jit
    def phase_c(frame, key, slice_i):
        rad, splat = _render_slice(scene, spec, cam, frame, key, n_slices,
                                   slice_i, max_depth=max_depth)
        return rad.sum() + splat.sum()

    c = run("C full slice            ", phase_c)
    log(f"shadow trace ~ {1e3*(b-a):.1f} ms, connection math ~ "
        f"{1e3*(c-b):.1f} ms, walks ~ {1e3*a:.1f} ms "
        f"(total wall {time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
