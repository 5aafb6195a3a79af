"""In-process A/B of cheap BDPT levers: shadow_cap and n_slices.

    JAX_PLATFORMS=tpu PYTHONPATH=/root/repo:$PYTHONPATH \
        python scripts/exp_r10e.py veach_bdpt 512
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

fix_stale_platform()

import jax
import jax.numpy as jnp

wait_for_device()

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join("/root/repo", ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from ti_raytrace_tpu.examples.scenes import example_cached, make_camera
from ti_raytrace_tpu.integrators import bdpt_rgb
from scripts.exp_r9b import log


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "veach_bdpt"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    scene, cfg = example_cached(name)
    spec, cam = make_camera(scene, cfg, size, size)

    variants = [
        ("ns2 cap=None", dict(n_slices=2)),
        ("ns2 cap=0.5", dict(n_slices=2, shadow_cap=0.5)),
        ("ns1 cap=None", dict(n_slices=1)),
        ("ns1 cap=0.5", dict(n_slices=1, shadow_cap=0.5)),
    ]
    for tag, kw in variants:
        def frame(f):
            img = bdpt_rgb.render_frame_sliced(
                scene, spec, cam, jnp.int32(f), jax.random.PRNGKey(f), **kw)
            img.block_until_ready()
            return img

        t0 = time.perf_counter()
        img = frame(1)
        compile_s = time.perf_counter() - t0
        times = []
        for f in range(2, 6):
            t0 = time.perf_counter()
            frame(f)
            times.append(time.perf_counter() - t0)
        log(f"{tag:14s} median {sorted(times)[len(times)//2]*1e3:7.1f} ms  "
            f"best {min(times)*1e3:7.1f}  sum={float(jnp.sum(img)):.3f}  "
            f"(compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
