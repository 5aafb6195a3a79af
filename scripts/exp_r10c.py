"""BDPT perf decomposition (VERDICT r5 #3): same-process timing of the
veach frame with strategy subsets compiled in/out via the `strategies`
hook — separates subpath-walk cost, shadow-batch trace cost, and
per-family connection arithmetic.

    JAX_PLATFORMS=tpu PYTHONPATH=/root/repo:$PYTHONPATH \
        python scripts/exp_r10c.py veach_bdpt 512 2
"""

import os
import sys
import time
from functools import partial

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
from scripts.exp_r9b import log


def make_slice_fn(scene, spec, cam, n_slices, strategies, max_depth=5):
    @partial(jax.jit, static_argnames=())
    def run(frame, key, slice_i):
        N = spec.width * spec.height
        ns = N // n_slices
        k_cam, k_eye, k_light, k_conn = jax.random.split(key, 4)
        o_full = jnp.swapaxes(ray_origins(spec, cam), 0, 1)
        d_full = jnp.swapaxes(ray_directions(spec, cam, frame, k_cam), 0, 1)
        start = slice_i * ns
        o = jax.lax.dynamic_slice_in_dim(o_full, start, ns, axis=1)
        d = jax.lax.dynamic_slice_in_dim(d_full, start, ns, axis=1)
        eye, eye_count, light, light_count = bdpt_rgb.build_subpaths(
            scene, o, d,
            jax.random.fold_in(k_eye, slice_i),
            jax.random.fold_in(k_light, slice_i),
            eye_depth=max_depth + 2, light_depth=max_depth + 1)
        radiance, splat = bdpt_rgb._connections(
            scene, spec, cam, eye, eye_count, light, light_count,
            jax.random.fold_in(k_conn, slice_i), max_depth=max_depth,
            strategies=strategies)
        return jnp.sum(radiance) + jnp.sum(splat)

    return run


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "veach_bdpt"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    n_slices = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    scene, cfg = example_cached(name)
    spec, cam = make_camera(scene, cfg, size, size)
    log(f"{name}: {size}x{size}, n_slices={n_slices}, n_prims={scene.n_prims}")

    variants = [
        ("walks_only", lambda e, l: False),
        ("walks+l0", lambda e, l: l == 0),
        ("walks+l1", lambda e, l: l == 1),
        ("walks+e1", lambda e, l: e == 1),
        ("no_splat", lambda e, l: e != 1),
        ("full", None),
    ]
    for tag, strat in variants:
        fn = make_slice_fn(scene, spec, cam, n_slices, strat)

        def frame(f):
            tot = 0.0
            for i in range(n_slices):
                tot += fn(jnp.int32(f), jax.random.PRNGKey(f),
                          jnp.int32(i)).block_until_ready()
            return tot

        t0 = time.perf_counter()
        frame(1)
        compile_s = time.perf_counter() - t0
        times = []
        for f in range(2, 6):
            t0 = time.perf_counter()
            frame(f)
            times.append(time.perf_counter() - t0)
        log(f"{tag:12s} median {sorted(times)[len(times)//2]*1e3:7.1f} ms  "
            f"best {min(times)*1e3:7.1f}  (compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
