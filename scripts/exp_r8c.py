"""Shadow-trace anatomy: build the real veach BDPT shadow wavefront
(one 512^2/2 slice) via bdpt_rgb._shadow_requests, then run
trace_clustered on it directly — parked fraction, tmax on/off timing
in-process, and trace-level exactness of the tmax contract
((prim == target) equality + t equality where it matches).

    python scripts/exp_r8c.py
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
from functools import partial

wait_for_device()

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join("/root/repo", ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from ti_raytrace_tpu.camera import ray_directions, ray_origins
from ti_raytrace_tpu.examples.scenes import EXAMPLES, make_camera
from ti_raytrace_tpu.integrators import bdpt_rgb as B
from ti_raytrace_tpu.ops import cluster_trace as ct


def log(*a):
    print(*a, file=sys.stderr, flush=True)


@partial(jax.jit, static_argnames=("spec",))
def shadow_wavefront(scene, spec, cam, key):
    N = spec.width * spec.height // 2
    md = B.MAX_DEPTH
    k_cam, k_eye, k_light, k_conn = jax.random.split(key, 4)
    o = jnp.swapaxes(ray_origins(spec, cam), 0, 1)[:, :N]
    d = jnp.swapaxes(ray_directions(spec, cam, 1, k_cam), 0, 1)[:, :N]
    eye, eye_count, light, light_count = B.build_subpaths(
        scene, o, d, k_eye, k_light, eye_depth=md + 2, light_depth=md + 1)
    pairs = [
        (e, l)
        for e in range(1, len(eye) + 1)
        for l in range(0, len(light) + 1)
        if not ((l == 1 and e == 1) or l + e - 2 < 0 or l + e - 2 > md)
    ]
    ro, rd, rt, rs, tags = B._shadow_requests(
        scene, spec, cam, eye, eye_count, light, light_count, k_conn, pairs)
    return (jnp.concatenate(ro, 1), jnp.concatenate(rd, 1),
            jnp.concatenate(rt), jnp.concatenate(rs))


def main():
    size = 512
    scene, cfg = EXAMPLES["veach_bdpt"]()
    spec, cam = make_camera(scene, cfg, size, size)
    o, d, tmax, sel = shadow_wavefront(scene, spec, cam, jax.random.PRNGKey(0))
    o, d, tmax, sel = map(jax.device_get, (o, d, tmax, sel))
    o, d, tmax, sel = map(jnp.asarray, (o, d, tmax, sel))
    N = o.shape[1]
    parked = np.asarray(o[0]) >= 1e8
    log(f"shadow wavefront {N} lanes; parked fraction {parked.mean():.3f}")

    def run(tag, oo, tm):
        tup = ct.trace_clustered(scene, oo, d, tmax=tm)
        tup[0].block_until_ready()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            tup = ct.trace_clustered(scene, oo, d, tmax=tm)
            tup[0].block_until_ready()
            best = min(best, time.perf_counter() - t0)
        log(f"{tag}: best {best*1e3:.1f} ms")
        return np.asarray(tup[0]), np.asarray(tup[1])

    t_b, p_b = run("tmax-seeded", o, tmax)
    t_u, p_u = run("unbounded ", o, None)
    # all-parked floor: what a lane costs when it does nothing
    run("all-parked ", jnp.full_like(o, 1e9), None)

    tm = np.asarray(tmax)
    hit_b = p_b >= 0
    exact = hit_b & (p_u == p_b) & (t_u == t_b)
    log(f"bounded hits {hit_b.sum()}  exact-match {exact.sum()}  "
        f"mismatch {(hit_b & ~exact).sum()}")
    miss_b = ~hit_b
    consistent = miss_b & ((p_u < 0) | (t_u >= tm * 0.999))
    log(f"bounded misses {miss_b.sum()}  inconsistent "
        f"{miss_b.sum() - consistent.sum()}")


if __name__ == "__main__":
    main()
