"""Shadow-trace floor attack: TILE width x sort mode sweep on the real
captured veach shadow wavefront (one process; floor = all-parked run).

    python scripts/exp_r8d.py
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

from ti_raytrace_tpu.examples.scenes import EXAMPLES, make_camera
from ti_raytrace_tpu.ops import cluster_trace as ct
from scripts.exp_r8c import shadow_wavefront


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    size = 512
    scene, cfg = EXAMPLES["veach_bdpt"]()
    spec, cam = make_camera(scene, cfg, size, size)
    o, d, tmax, sel = shadow_wavefront(scene, spec, cam, jax.random.PRNGKey(0))
    o, d, tmax, sel = map(jax.device_get, (o, d, tmax, sel))
    o, d, tmax, sel = map(jnp.asarray, (o, d, tmax, sel))
    o_park = jnp.full_like(o, 1e9)

    ref = None

    def run(tag, oo, tile, sort_rays, tile_order=False):
        nonlocal ref
        kw = dict(tmax=tmax, sort_rays=sort_rays, tile_order=tile_order)
        ct.TILE = tile
        tup = ct.trace_clustered(scene, oo, d, **kw)
        tup[0].block_until_ready()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            tup = ct.trace_clustered(scene, oo, d, **kw)
            tup[0].block_until_ready()
            best = min(best, time.perf_counter() - t0)
        t, p = np.asarray(tup[0]), np.asarray(tup[1])
        note = ""
        if oo is o:
            if ref is None:
                ref = (t, p)
            else:
                note = (" EXACT" if (ref[1] == p).all() and
                        np.array_equal(ref[0], ref[0]) and
                        np.array_equal(np.where(p >= 0, t, 0),
                                       np.where(ref[1] >= 0, ref[0], 0))
                        else " DIFFERS")
        log(f"{tag}: best {best*1e3:.1f} ms{note}")

    t0 = ct.TILE
    run("t256 sorted      ", o, 256, True)
    run("t256 floor       ", o_park, 256, True)
    run("t512 sorted      ", o, 512, True)
    run("t512 floor       ", o_park, 512, True)
    run("t1024 sorted     ", o, 1024, True)
    run("t1024 floor      ", o_park, 1024, True)
    run("t256 unsorted+ord", o, 256, False, True)
    run("t512 unsorted+ord", o, 512, False, True)
    run("t1024 unsorted   ", o, 1024, False, True)
    ct.TILE = t0


if __name__ == "__main__":
    main()
