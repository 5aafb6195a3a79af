"""SAH BVH builder tests: same invariants as the LBVH, plus
traversal-equivalence when swapped into a scene."""

import numpy as np
import jax.numpy as jnp

from ti_raytrace_tpu.accel.lbvh import check_containment, check_coverage
from ti_raytrace_tpu.accel.sah import build_bvh_sah
from ti_raytrace_tpu.accel.traverse import trace_brute_force, trace_closest
from ti_raytrace_tpu.io.assets import asset_path
from ti_raytrace_tpu.scene.build import SceneBuilder


def test_sah_invariants_random():
    rng = np.random.default_rng(21)
    n = 187
    c = rng.uniform(-4, 4, (n, 3))
    h = rng.uniform(0.05, 0.4, (n, 1))
    compact = build_bvh_sah(c - h, c + h)
    assert compact["bvh_prim"].shape[0] == 2 * n - 1
    assert check_containment(compact)
    assert check_coverage(compact, n)
    esc = compact["bvh_escape"]
    assert np.all(esc > np.arange(len(esc))) and np.all(esc <= len(esc))


def test_sah_traversal_equivalence():
    b = SceneBuilder()
    b.add_obj(asset_path("model/cornell_box.obj"))
    sc = b.build()
    # swap the LBVH for the SAH tree
    pmin = np.minimum(
        np.minimum(np.asarray(sc.tri_v0), np.asarray(sc.tri_v0 + sc.tri_e1)),
        np.asarray(sc.tri_v0 + sc.tri_e2),
    )
    pmax = np.maximum(
        np.maximum(np.asarray(sc.tri_v0), np.asarray(sc.tri_v0 + sc.tri_e1)),
        np.asarray(sc.tri_v0 + sc.tri_e2),
    )
    sah = build_bvh_sah(pmin, pmax)
    sc2 = sc._replace(
        bvh_min=jnp.asarray(sah["bvh_min"]),
        bvh_max=jnp.asarray(sah["bvh_max"]),
        bvh_prim=jnp.asarray(sah["bvh_prim"]),
        bvh_escape=jnp.asarray(sah["bvh_escape"]),
    )
    rng = np.random.default_rng(3)
    N = 256
    lo, hi = np.asarray(sc.aabb_min), np.asarray(sc.aabb_max)
    o = (0.5 * (lo + hi) + rng.uniform(-1.2, 1.2, (N, 3)) * (hi - lo)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_sah, _ = trace_closest(sc2, jnp.asarray(o), jnp.asarray(d))
    t_ref, _ = trace_brute_force(sc, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(t_sah), np.asarray(t_ref), rtol=1e-4, atol=1e-4)
