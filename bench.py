"""Driver benchmark: progressive path tracing on the reference's headline
workload (README.md:56-58 — 30 fps at 1 spp on a 100k-triangle mesh,
512x512, RTX 2070 Super).

`model/mc.obj` is a missing blob upstream, so the 100k-triangle scene is
a densified Teapot (>= 100k tris) with the single_model material setup
(glass override + sphere light + env map, example/single_model.py:27-34).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra context lines go to stderr.  Startup is cached: the scene's host
arrays live under .cache/ and the compaction schedule is the measured
constant scenes.BENCH_SCHEDULE, verified at runtime by the overflow
counter (render_frame_stats) instead of re-calibrated per run.
"""

import json
import os
import sys
import time

BASELINE_FPS = 30.0  # reference on RTX 2070 Super (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

    fix_stale_platform()  # env may pin the stale 'axon' platform name

    import jax

    wait_for_device()  # ride out a lingering grant from a killed process

    try:  # persistent compile cache: cuts repeat-run startup
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), ".cache", "jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        log("compilation cache unavailable:", e)

    import numpy as np

    from ti_raytrace_tpu import film as film_mod
    from ti_raytrace_tpu.camera import CameraSpec, orbit_camera
    from ti_raytrace_tpu.examples.scenes import benchmark_100k
    from ti_raytrace_tpu.integrators import pt_rgb

    size = 512
    t0 = time.time()
    scene, cfg = benchmark_100k()
    log(f"scene build: {time.time() - t0:.1f}s, prims={scene.n_prims}")

    lo = np.asarray(scene.aabb_min)
    hi = np.asarray(scene.aabb_max)
    centre = 0.5 * (lo + hi)
    scale = float(np.linalg.norm(hi - lo)) * 0.8
    spec = CameraSpec(size, size)
    cam = orbit_camera(centre, 0.0, 0.0, scale)

    # all-glass scene: NEE contributes exactly zero -> compile it out
    nee = pt_rgb.has_nee_materials(scene)

    import jax.numpy as jnp

    from ti_raytrace_tpu.examples.scenes import BENCH_SCHEDULE_MERGED

    # 32 frames per dispatch (amortizes the ~30 ms tunnel dispatch
    # floor), traced in merged groups of 16: the deep compacted phases
    # of 16 frames share one wavefront, which packs 16x more live rays
    # per sorted tile (scripts/exp_r3q.py) and amortizes the per-op
    # sort/gather costs.  G=16 used to regress on 1M-lane sorts; after
    # the carry-presort rework (one packed gather per bounce,
    # scripts/exp_r4c.py) it wins: 56.8 (G8/KF16) -> 52.8 ms/frame
    # (scripts/exp_r4f.py, overflow 0; G=32 regresses, and tighter
    # schedules 4/48/192+ kill 100k+ paths — disqualified).
    # KF=128: quarters the residual tunnel-floor share (34.0 -> 33.9
    # ms/frame, scripts/exp_r7h.py; KF=64 measured 38.8 -> 38.3 at the
    # r3 schedule, exp_r6d).  Pay divisors: fused flush+compact at the
    # merged phase boundaries (scenes.BENCH_PAY_DIVISORS).
    KF = 128
    GROUP = 16
    compaction = BENCH_SCHEDULE_MERGED
    from ti_raytrace_tpu.examples.scenes import BENCH_PAY_DIVISORS
    log(f"nee={nee} group={GROUP} compaction={compaction} "
        f"pay={BENCH_PAY_DIVISORS}")

    def step(fl):
        fl, ov = pt_rgb.render_film_frames_merged(
            scene, spec, cam, fl, KF, GROUP, compaction, nee,
            pay_divisors=BENCH_PAY_DIVISORS,
        )
        return fl, ov

    fl = film_mod.new_film(size, size)
    t0 = time.time()
    fl, ov_total = step(fl)
    fl.hdr.block_until_ready()
    log(f"compile + first {KF} frames: {time.time() - t0:.1f}s")

    n_disp = 5
    times = []
    t0 = time.time()
    for _ in range(n_disp):
        tf = time.perf_counter()
        fl, ov = step(fl)
        ov_total = ov_total + ov
        fl.hdr.block_until_ready()  # per-dispatch sync: robust through the tunnel
        times.append(time.perf_counter() - tf)
    dt = time.time() - t0
    n = n_disp * KF
    # sustained fps from the MEDIAN dispatch: the axon tunnel occasionally
    # stalls a single dispatch for seconds (measured: 10.5 s out of an
    # 11.8 s total), which is transport noise, not render throughput
    med = sorted(times)[n_disp // 2]
    fps = KF / med
    overflow_total = int(np.asarray(ov_total))
    log(f"{n} frames in {dt:.2f}s ({n_disp} dispatches, best "
        f"{min(times)/KF*1e3:.1f} ms/frame, median "
        f"{med/KF*1e3:.1f} ms/frame); "
        f"compaction overflow kills: {overflow_total}"
        + (" (estimator exact)" if overflow_total == 0 else " (DEPTH BIAS!)"))
    try:
        film_mod.save_png(fl, "/tmp/bench_render.png")
    except Exception as e:  # pragma: no cover
        log("snapshot failed:", e)

    print(
        json.dumps(
            dict(
                metric="pt_progressive_fps_100k_tri_512px",
                value=round(fps, 3),
                unit="fps_at_1spp",
                vs_baseline=round(fps / BASELINE_FPS, 3),
            )
        )
    )


if __name__ == "__main__":
    main()
