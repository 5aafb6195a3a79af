"""Profile ONE strategy-subset BDPT variant (follow-up to exp_r10c:
l==0 alone costs ~355 ms/frame of pure arithmetic — find out where).

    JAX_PLATFORMS=tpu PYTHONPATH=/root/repo:$PYTHONPATH \
        python scripts/exp_r10d.py veach_bdpt 512 2 l0
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
from scripts.exp_r9b import log
from scripts.exp_r10c import make_slice_fn

VARIANTS = {
    "none": lambda e, l: False,
    "l0": lambda e, l: l == 0,
    "l0e7": lambda e, l: l == 0 and e == 7,
    "l0e2": lambda e, l: l == 0 and e == 2,
    "gen": lambda e, l: e >= 2 and l >= 2,
    "full": None,
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "veach_bdpt"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    n_slices = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    tag = sys.argv[4] if len(sys.argv) > 4 else "l0"
    scene, cfg = example_cached(name)
    spec, cam = make_camera(scene, cfg, size, size)
    fn = make_slice_fn(scene, spec, cam, n_slices, VARIANTS[tag])

    def frame(f):
        for i in range(n_slices):
            fn(jnp.int32(f), jax.random.PRNGKey(f),
               jnp.int32(i)).block_until_ready()

    t0 = time.perf_counter()
    frame(1)
    log(f"{tag}: compile+first {time.perf_counter() - t0:.1f}s")
    times = []
    for f in range(2, 6):
        t0 = time.perf_counter()
        frame(f)
        times.append(time.perf_counter() - t0)
    log(f"{tag}: warm median {sorted(times)[len(times)//2]*1e3:.1f} ms")

    trace_dir = f"/tmp/jaxtrace_r10d_{tag}"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        frame(6)

    import subprocess
    out = subprocess.run(
        [sys.executable, "scripts/xplane.py", trace_dir, "30"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    print(out.stdout)
    if out.returncode != 0:
        print(out.stderr[-2000:])


if __name__ == "__main__":
    main()
