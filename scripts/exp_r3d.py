"""Round-3 experiment D: device-side trace of one benchmark frame.

jax.profiler trace of render_frame; if the tunneled runtime supports
device tracing, the perfetto .pb.gz under /tmp/jaxtrace names the
fusions/custom-calls with device durations — the only way to split a
single dispatch below the ~30 ms tunnel floor.
"""

import glob
import gzip
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device
    fix_stale_platform()

    import jax

    wait_for_device()
    import jax.numpy as jnp
    import numpy as np

    from ti_raytrace_tpu.camera import CameraSpec, orbit_camera
    from ti_raytrace_tpu.examples.scenes import benchmark_100k
    from ti_raytrace_tpu.integrators import pt_rgb

    scene, cfg = benchmark_100k()
    size = 512
    lo = np.asarray(scene.aabb_min); hi = np.asarray(scene.aabb_max)
    centre = 0.5 * (lo + hi)
    scale = float(np.linalg.norm(hi - lo)) * 0.8
    spec = CameraSpec(size, size)
    cam = orbit_camera(centre, 0.0, 0.0, scale)
    key = jax.random.PRNGKey(0)
    nee = pt_rgb.has_nee_materials(scene)

    fr = jax.jit(lambda k: pt_rgb.render_frame(scene, spec, cam, jnp.int32(1), k,
                                               cfg.compaction, nee))
    fr(key).block_until_ready()  # compile
    t0 = time.perf_counter()
    fr(key).block_until_ready()
    log(f"frame: {(time.perf_counter()-t0)*1e3:.1f} ms")

    import shutil
    shutil.rmtree("/tmp/jaxtrace", ignore_errors=True)
    with jax.profiler.trace("/tmp/jaxtrace"):
        for i in range(3):
            fr(jax.random.fold_in(key, i)).block_until_ready()
    files = glob.glob("/tmp/jaxtrace/**/*.xplane.pb", recursive=True) + \
        glob.glob("/tmp/jaxtrace/**/*.pb.gz", recursive=True) + \
        glob.glob("/tmp/jaxtrace/**/*trace*", recursive=True)
    log("trace files:", files[:8])


if __name__ == "__main__":
    main()
