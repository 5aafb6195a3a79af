"""Walk-compaction A/B for the spectral BDPT (prism_rainbow, dense
tracer — dead lanes pay the full N x P sweep there, unlike the cluster
kernel's dead-tile early exit that made compaction a wash on veach).

    JAX_PLATFORMS=tpu PYTHONPATH=/root/repo:$PYTHONPATH \
        python scripts/exp_r10g.py prism_rainbow 512
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
from ti_raytrace_tpu.integrators import bdpt_spec
from scripts.exp_r9b import log

# prism walk alive (CPU probe): eye .532 .144 .073 .023 .008;
# light .561 .371 .223 .203
S3 = (((2, 1.7), (3, 5.5), (4, 10.0)), ((2, 1.6), (3, 2.4), (4, 3.9)))
SCHEDS = [
    ("none", None, None),
    ("s2", (((2, 1.7), (3, 5.5)), ((2, 1.6), (4, 3.9))), None),
    ("s3", S3, None),
    ("s3+cap.125", S3, 0.125),
    ("s3+cap.09", S3, 0.09),
]


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "prism_rainbow"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    scene, cfg = example_cached(name)
    spec, cam = make_camera(scene, cfg, size, size)
    sky = cfg.sky or {}
    for tag, wc, sc in SCHEDS:
        render = bdpt_spec.make_render_frame(**sky, walk_compaction=wc,
                                             shadow_cap=sc)

        def frame(f):
            img = render(scene, spec, cam, jnp.int32(f), jax.random.PRNGKey(f))
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
        log(f"{tag:5s} median {sorted(times)[len(times)//2]*1e3:7.1f} ms  "
            f"best {min(times)*1e3:7.1f}  sum={float(jnp.sum(img)):.1f}  "
            f"(compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
