"""Walk-compaction schedule A/B for BDPT scenes (r5 #3).

    JAX_PLATFORMS=tpu PYTHONPATH=/root/repo:$PYTHONPATH \
        python scripts/exp_r10f.py veach_bdpt 512 2
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

# alive fractions measured by /tmp/walk_occ.py (veach):
#   eye   .849 .649 .473 .343 .246 .180   (after depths 1-6)
#   light .644 .510 .389 .296 .223        (after depths 1-5)
SCHEDS = {
    "veach_bdpt": [
        ("none", None),
        ("s2", (((3, 1.45), (5, 2.6)), ((2, 1.45), (4, 2.4)))),
        ("s3", (((2, 1.1), (3, 1.45), (4, 1.95), (5, 2.6), (6, 3.6)),
                ((2, 1.45), (3, 1.8), (4, 2.4), (5, 3.1)))),
    ],
    # prism eye .532 .144 .073 .023 .008; light .561 .371 .223 .203
    "prism_rainbow": [
        ("none", None),
        ("s2", (((2, 1.7), (3, 5.5)), ((2, 1.6), (4, 3.9)))),
        ("s3", (((2, 1.7), (3, 5.5), (4, 10.0)),
                ((2, 1.6), (3, 2.4), (4, 3.9)))),
    ],
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "veach_bdpt"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    n_slices = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    scene, cfg = example_cached(name)
    spec, cam = make_camera(scene, cfg, size, size)
    for tag, wc in SCHEDS[name]:
        def frame(f):
            img, ov = bdpt_rgb.render_frame_sliced(
                scene, spec, cam, jnp.int32(f), jax.random.PRNGKey(f),
                n_slices=n_slices, walk_compaction=wc, return_overflow=True)
            img.block_until_ready()
            return img, ov

        t0 = time.perf_counter()
        img, ov = frame(1)
        compile_s = time.perf_counter() - t0
        times, ov_t = [], int(ov)
        for f in range(2, 6):
            t0 = time.perf_counter()
            _, ov = frame(f)
            times.append(time.perf_counter() - t0)
            ov_t += int(ov)
        log(f"{tag:5s} median {sorted(times)[len(times)//2]*1e3:7.1f} ms  "
            f"best {min(times)*1e3:7.1f}  overflow={ov_t}  "
            f"sum={float(jnp.sum(img)):.1f}  (compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
