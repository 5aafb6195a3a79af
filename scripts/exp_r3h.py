"""Round-3 experiment H: deep-phase coherence + compaction depth.

The r3 device trace (exp_r3d) shows per-lane kernel cost ballooning on
the compacted deep phases (49 ns/lane at 262k -> 440 ns/lane at 4k):
wavefronts <= SMALL_WAVEFRONT trace UNSORTED with the static cluster
order (a BDPT compile-time tradeoff), so the incoherent deep bounces
lose both the coherence sort and the per-tile front-to-back pruning
order.  Variants (one process; each needs clear_caches):

  1. baseline                 (SW=32768, compaction (1,4),(4,16),(8,64))
  2. SW=2048: sort + per-tile order on the 16k/4k phases too
  3. deeper compaction        + (11, 256)
  4. SW=2048 + deeper compaction
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device
    fix_stale_platform()

    import jax

    wait_for_device()
    import jax.numpy as jnp

    from ti_raytrace_tpu.camera import CameraSpec, orbit_camera
    from ti_raytrace_tpu.examples.scenes import benchmark_100k
    from ti_raytrace_tpu.integrators import pt_rgb
    from ti_raytrace_tpu.ops import cluster_trace as ct

    scene, cfg = benchmark_100k()
    size = 512
    lo = np.asarray(scene.aabb_min); hi = np.asarray(scene.aabb_max)
    centre = 0.5 * (lo + hi)
    scale = float(np.linalg.norm(hi - lo)) * 0.8
    spec = CameraSpec(size, size)
    cam = orbit_camera(centre, 0.0, 0.0, scale)
    key = jax.random.PRNGKey(0)
    nee = pt_rgb.has_nee_materials(scene)
    base_comp = cfg.compaction
    deep_comp = tuple(list(base_comp) + [(11, 256)])

    def frame_time(tag, compaction):
        fr = jax.jit(lambda k: pt_rgb.render_frame_stats(
            scene, spec, cam, jnp.int32(1), k, compaction, nee))
        t0 = time.time()
        img, ov = fr(key); img.block_until_ready()
        log(f"{tag}: compile+first {time.time()-t0:.1f}s "
            f"mean={float(np.asarray(img).mean()):.6f} ov={int(ov)}")
        best = 1e9
        ov_tot = 0
        for i in range(5):
            t0 = time.perf_counter()
            img, ov = fr(jax.random.fold_in(key, i))
            img.block_until_ready()
            best = min(best, time.perf_counter() - t0)
            ov_tot += int(ov)
        log(f"{tag}: {best*1e3:.1f} ms -> {1/best:.2f} fps  overflow={ov_tot}")

    frame_time("baseline SW=32768", base_comp)

    ct.SMALL_WAVEFRONT = 2048
    jax.clear_caches()
    frame_time("SW=2048 (sorted deep phases)", base_comp)

    jax.clear_caches()
    frame_time("SW=2048 + (11,256)", deep_comp)

    ct.SMALL_WAVEFRONT = 32768
    jax.clear_caches()
    frame_time("SW=32768 + (11,256)", deep_comp)


if __name__ == "__main__":
    main()
