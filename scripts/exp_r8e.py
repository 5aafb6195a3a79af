"""SHADOW_CAP A/B on veach BDPT (one process, one chip).

Renders warm veach_bdpt frames via render_frame_sliced with the shadow
occupancy cap off (shadow_cap=0) and at several capacities, in ONE
process (shadow_cap is a static jit arg).  Reports per-config frame
times, image max-abs-diff / mean ratio vs the uncapped render, and the
kill count implied by the captured shadow wavefront's active fraction.

    python scripts/exp_r8e.py
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
from ti_raytrace_tpu.integrators import bdpt_rgb
from ti_raytrace_tpu.ops import cluster_trace as ct
from scripts.exp_r8c import shadow_wavefront


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    size = 512
    scene, cfg = EXAMPLES["veach_bdpt"]()
    spec, cam = make_camera(scene, cfg, size, size)

    # active fraction + implied kills per cap, from the real slice-0
    # shadow wavefront over several frames' keys
    for f in range(3):
        key = jax.random.fold_in(jax.random.PRNGKey(0), f)
        _, _, _, sel = shadow_wavefront(scene, spec, cam, key)
        sel = np.asarray(jax.device_get(sel))
        n, na = sel.size, int(sel.sum())
        row = [f"frame {f}: active {na}/{n} = {na/n:.4f}"]
        for cap in (0.5, 0.5625, 0.625):
            c = ct.capacity_lanes(n, cap)
            row.append(f"cap{cap}: kills {max(0, na - c)}")
        log("  ".join(row))

    imgs = {}

    def run(tag, shadow_cap, frames=4):
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        img = bdpt_rgb.render_frame_sliced(scene, spec, cam, 1, key,
                                           shadow_cap=shadow_cap)
        img.block_until_ready()
        log(f"{tag}: compile+first {time.time()-t0:.1f}s")
        ts = []
        for _ in range(frames):
            t0 = time.perf_counter()
            img = bdpt_rgb.render_frame_sliced(scene, spec, cam, 1, key,
                                               shadow_cap=shadow_cap)
            img.block_until_ready()
            ts.append(time.perf_counter() - t0)
        log(f"{tag}: warm {['%.3f' % t for t in ts]} best {min(ts):.3f}s")
        imgs[tag] = np.asarray(img)

    run("cap-off ", 0.0)
    run("cap.625 ", 0.625)
    run("cap.5625", 0.5625)
    run("cap.50  ", 0.5)

    base = imgs["cap-off "]
    for tag, im in imgs.items():
        if tag == "cap-off ":
            continue
        d = np.abs(im - base)
        log(f"{tag}: maxdiff {d.max():.3e}  meandiff {d.mean():.3e}  "
            f"ratio {im.mean()/max(base.mean(), 1e-12):.6f}  "
            f"ndiff {(d > 0).sum()}")


if __name__ == "__main__":
    main()
