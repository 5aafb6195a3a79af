"""Valid one-process A/B of the pending kernel knobs at the production
merged config (KF=32, G=16):

  - REFRESH in {1, 2, 4}: groups per candidate refresh in the bitmask
    narrow phase.  Fewer broad-phase counts matmuls per chunk, coarser
    front-to-back pruning (a candidate SUPERSET — renders bit-identical
    at any value).
  - ATTR_HIGH: attr one-hot extraction at Precision.HIGH (3 MXU passes)
    instead of HIGHEST (6).  bf16x3 spans a full f32 mantissa, so a
    0/1-one-hot x f32 product should stay exact — the film mean is the
    bit-identity gate.

Unlike exp_r5e's first attempt, this CLEARS JAX CACHES between variants:
REFRESH/ATTR_HIGH are read inside the pallas kernel body, which the
inner `_run_kernel` jit cache cannot see — without clear_caches() every
variant silently reuses the baseline kernel.

    python scripts/exp_r6a.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

fix_stale_platform()

import jax

wait_for_device()

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join("/root/repo", ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from functools import partial

import numpy as np

from ti_raytrace_tpu import film as film_mod
from ti_raytrace_tpu.camera import CameraSpec, orbit_camera
from ti_raytrace_tpu.examples.scenes import BENCH_SCHEDULE_MERGED, benchmark_100k
from ti_raytrace_tpu.integrators import pt_rgb
from ti_raytrace_tpu.ops import cluster_trace as ct


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    size = 512
    scene, _ = benchmark_100k()
    lo = np.asarray(scene.aabb_min)
    hi = np.asarray(scene.aabb_max)
    centre = 0.5 * (lo + hi)
    scale = float(np.linalg.norm(hi - lo)) * 0.8
    spec = CameraSpec(size, size)
    cam = orbit_camera(centre, 0.0, 0.0, scale)
    nee = pt_rgb.has_nee_materials(scene)
    KF, G = 32, 16
    raw = pt_rgb.render_film_frames_merged.__wrapped__

    variants = [
        ("baseline", dict()),
        ("refresh=2", dict(REFRESH=2)),
        ("refresh=4", dict(REFRESH=4)),
        # attr_high REMOVED: Mosaic's dot lowering rejects Precision.HIGH
        # (only DEFAULT/HIGHEST lower) — the 3-pass variant needs an
        # explicit bf16 split of the attr table instead (ATTR_SPLIT3)
        ("baseline2", dict()),  # drift control: re-measure the baseline
    ]
    ref_mean = None
    for label, flags in variants:
        saved = {k: getattr(ct, k) for k in flags}
        for k, v in flags.items():
            setattr(ct, k, v)
        jax.clear_caches()  # kernel-body globals are invisible to jit caches
        try:
            step = jax.jit(
                partial(raw, n_frames=KF, group=G,
                        compaction=BENCH_SCHEDULE_MERGED, nee=nee),
                static_argnums=(1,), donate_argnums=(3,),
            )
            fl = film_mod.new_film(size, size)
            t0 = time.time()
            fl, ov = step(scene, spec, cam, fl)
            fl.hdr.block_until_ready()
            log(f"{label}: compile+first {time.time()-t0:.1f}s")
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                fl, o2 = step(scene, spec, cam, fl)
                fl.hdr.block_until_ready()
                ov = ov + o2
                times.append(time.perf_counter() - t0)
            med = sorted(times)[len(times) // 2]
            m = float(np.asarray(fl.hdr).mean())
            bitnote = ""
            if ref_mean is None:
                ref_mean = m
            else:
                bitnote = ("  BIT-IDENTICAL" if m == ref_mean
                           else f"  MEAN DIFFERS ({m!r} vs {ref_mean!r})")
            log(f"{label}: median {med/KF*1e3:6.1f} ms/frame  best "
                f"{min(times)/KF*1e3:6.1f}  overflow {int(np.asarray(ov))}"
                f"  mean {m:.9f}{bitnote}")
        finally:
            for k, v in saved.items():
                setattr(ct, k, v)


if __name__ == "__main__":
    main()
