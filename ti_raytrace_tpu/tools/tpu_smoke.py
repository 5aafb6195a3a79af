"""TPU-executed kernel smoke: Mosaic lowering + MXU numerics check.

tests/test_cluster.py validates the cluster kernel only in pallas
interpret mode (CPU backend), which by construction cannot catch
TPU-only numeric classes — round 1's worst bug was bf16 rounding inside
an MXU one-hot extraction that every CPU test passed (commit 3a71ba0).
This script runs the REAL kernel (non-interpret) on the chip against the
threaded-BVH oracle and the interpret-mode kernel:

  * hit distance / winning primitive must match the oracle;
  * the fused one-hot attribute extraction must be BIT-exact against
    scene.prim_attr columns (any MXU precision regression shows here);
  * both wavefront regimes run (small static-order + sorted per-tile).

Run (takes ~1 min):  JAX_PLATFORMS=tpu python -m ti_raytrace_tpu.tools.tpu_smoke
Exit 0 on pass, 1 on any mismatch.  Wired into the verify recipe.
"""

import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _rays(scene, n, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    lo = np.asarray(scene.aabb_min)
    hi = np.asarray(scene.aabb_max)
    c = 0.5 * (lo + hi)
    r = float(np.linalg.norm(hi - lo))
    o = np.concatenate([
        c + rng.normal(size=(n // 2, 3)) * r * 0.8,
        c + rng.normal(size=(n - n // 2, 3)) * r * 0.05,
    ]).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o.T), jnp.asarray(d.T)


def main():
    from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

    fix_stale_platform()

    import jax

    wait_for_device()
    if jax.local_devices()[0].platform != "tpu":
        log("SKIP: no TPU device (this smoke only means something on-chip)")
        return 0

    import jax.numpy as jnp

    from ti_raytrace_tpu.accel.traverse import trace_closest
    from ti_raytrace_tpu.core import constants as C
    from ti_raytrace_tpu.io.assets import asset_path
    from ti_raytrace_tpu.ops.cluster_trace import SMALL_WAVEFRONT, trace_clustered
    from ti_raytrace_tpu.scene.build import MaterialRec, SceneBuilder, sphere_shape

    b = SceneBuilder()
    b.add_obj(asset_path("model/Teapot.obj"))
    b.add_shape(sphere_shape([0.0, 20.0, 0.0], 5.0),
                MaterialRec(C.MAT_LIGHT, color=[50.0] * 3))
    scene = b.build()
    failures = 0

    for regime, n in (("small/static-order", 4096),
                      ("sorted/per-tile-order", SMALL_WAVEFRONT + 4096)):
        o, d = _rays(scene, n)
        t, prim, uv, attr = trace_clustered(scene, o, d, interpret=False,
                                            want_attr=True)
        t = np.asarray(t); prim = np.asarray(prim); attr = np.asarray(attr)
        t_ref, p_ref = trace_closest(scene, jnp.swapaxes(o, 0, 1),
                                     jnp.swapaxes(d, 0, 1))
        t_ref = np.asarray(t_ref); p_ref = np.asarray(p_ref)

        hit = p_ref >= 0
        # ties (coincident duplicate faces) may pick either prim, so the
        # contract is: distances agree everywhere, misses agree
        t_ok = np.isclose(t[hit], t_ref[hit], rtol=1e-4, atol=1e-5)
        miss_ok = (prim[~hit] < 0)
        # MXU one-hot attr extraction must be bit-exact against the packed
        # table column of whichever prim the kernel selected
        pa = np.asarray(scene.prim_attr)
        sel = prim >= 0
        attr_exact = np.array_equal(attr[:, sel], pa[:, prim[sel]])

        ok = t_ok.all() and miss_ok.all() and attr_exact
        log(f"{regime}: rays={n} hits={int(hit.sum())} "
            f"t_match={t_ok.mean():.4f} miss_match={miss_ok.mean():.4f} "
            f"attr_bit_exact={attr_exact} -> {'OK' if ok else 'FAIL'}")
        if not ok:
            failures += 1
            bad = np.flatnonzero(hit)[~t_ok][:5]
            for i in bad:
                log(f"  ray {i}: t={t[i]:.6f} ref={t_ref[i]:.6f} "
                    f"prim={prim[i]} ref={p_ref[i]}")

    print("tpu_smoke:", "PASS" if failures == 0 else "FAIL")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
