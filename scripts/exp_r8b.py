"""Shadow-ray tmax seeding A/B on veach BDPT (one process, one chip).

The occlusion consumers only test `sh_prim == target` and read t where
the prim matches, so seeding best_t at the target distance must be
BIT-EXACT.  This renders one veach_bdpt frame with the tmax wire (the
checked-in code) and once with tmax stripped at the accel.trace seam
(jax.clear_caches() between, same process, same key), compares images
bitwise, and times warm frames for both.

    python scripts/exp_r8b.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

fix_stale_platform()

import jax
import numpy as np

wait_for_device()

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join("/root/repo", ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from ti_raytrace_tpu.examples.scenes import EXAMPLES, make_camera
from ti_raytrace_tpu.integrators import bdpt_rgb


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(tag, frames=4):
    size = 512
    scene, cfg = EXAMPLES["veach_bdpt"]()
    spec, cam = make_camera(scene, cfg, size, size)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    img = bdpt_rgb.render_frame_sliced(scene, spec, cam, 1, key)
    img.block_until_ready()
    log(f"{tag}: compile+first {time.time()-t0:.1f}s")
    ts = []
    for f in range(2, 2 + frames):
        t0 = time.perf_counter()
        img = bdpt_rgb.render_frame_sliced(scene, spec, cam, 1, key)
        img.block_until_ready()
        ts.append(time.perf_counter() - t0)
    log(f"{tag}: warm frames {['%.3f' % t for t in ts]} best {min(ts):.3f}s")
    return np.asarray(img)


def main():
    img_tmax = run("tmax")

    jax.clear_caches()
    orig = bdpt_rgb.trace

    def no_tmax(scene, o, d, **kw):
        kw.pop("tmax", None)
        return orig(scene, o, d, **kw)

    bdpt_rgb.trace = no_tmax
    img_base = run("no-tmax")

    same = np.array_equal(img_tmax, img_base)
    mad = float(np.abs(img_tmax - img_base).mean())
    log(f"bit-identical: {same}  mad {mad:.3e}")


if __name__ == "__main__":
    main()
