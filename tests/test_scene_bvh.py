"""Scene ingest + LBVH structural tests.

Turns the reference's printf instruments (SURVEY.md §4) into real
assertions: OBJ counts, material classification, BVH invariants
(containment, coverage), and traversal == brute force on random rays.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ti_raytrace_tpu.accel.lbvh import build_bvh, check_containment, check_coverage
from ti_raytrace_tpu.accel.traverse import trace_brute_force, trace_closest
from ti_raytrace_tpu.core import constants as C
from ti_raytrace_tpu.io.assets import asset_path
from ti_raytrace_tpu.io.obj import load_obj
from ti_raytrace_tpu.scene.build import MaterialRec, SceneBuilder, sphere_shape


@pytest.fixture(scope="module")
def cornell():
    b = SceneBuilder()
    b.add_obj(asset_path("model/cornell_box.obj"))
    return b.build()


def test_cornell_obj_counts():
    mesh = load_obj(asset_path("model/cornell_box.obj"))
    # 18 quads -> 36 triangles, 4 materials (SURVEY.md §2.1 #31)
    assert len(mesh.materials) == 4
    assert mesh.triangle_count() == 36
    names = [m.name for m in mesh.materials]
    assert names == ["white", "red", "green", "light"]


def test_cornell_material_classification(cornell):
    # all cornell materials are opaque (d=1) -> disney, except the light
    mt = np.asarray(cornell.mat_type)
    assert mt.shape[0] == 4
    assert mt[3] == C.MAT_LIGHT
    assert np.all(mt[:3] == C.MAT_DISNEY)
    # light emission kept as raw Ke (10,10,10)
    np.testing.assert_allclose(np.asarray(cornell.mat_color)[3], [10, 10, 10])


def test_cornell_lights(cornell):
    # the area light quad = 2 triangles
    assert cornell.n_lights == 2
    lp = np.asarray(cornell.light_prim)
    assert np.all(np.asarray(cornell.prim_mat)[lp] == 3)


def test_bvh_invariants(cornell):
    compact = dict(
        bvh_min=np.asarray(cornell.bvh_min),
        bvh_max=np.asarray(cornell.bvh_max),
        bvh_prim=np.asarray(cornell.bvh_prim),
        bvh_escape=np.asarray(cornell.bvh_escape),
    )
    assert compact["bvh_prim"].shape[0] == 2 * 36 - 1
    assert check_containment(compact)
    assert check_coverage(compact, cornell.n_prims)
    # escape indices are strictly forward and bounded
    esc = compact["bvh_escape"]
    K = esc.shape[0]
    assert np.all(esc > np.arange(K))
    assert np.all(esc <= K)


def test_bvh_random_soup_invariants():
    rng = np.random.default_rng(7)
    n = 257  # odd, not a power of two
    centers = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    half = rng.uniform(0.01, 0.3, (n, 1)).astype(np.float32)
    pmin = centers - half
    pmax = centers + half
    compact = build_bvh(pmin, pmax, pmin.min(0), pmax.max(0))
    assert compact["bvh_prim"].shape[0] == 2 * n - 1
    assert check_containment(compact)
    assert check_coverage(compact, n)


def test_bvh_duplicate_positions():
    # all prims at the same point: degenerate morton codes must still
    # produce a valid tree (the reference needs an explicit equal-code
    # fallback, LBvh.py:240-251)
    n = 64
    pmin = np.zeros((n, 3), np.float32)
    pmax = np.ones((n, 3), np.float32) * 0.001
    compact = build_bvh(pmin, pmax, pmin.min(0) - 1, pmax.max(0) + 1)
    assert check_coverage(compact, n)
    assert check_containment(compact)


def test_traversal_matches_brute_force(cornell):
    rng = np.random.default_rng(11)
    N = 512
    lo = np.asarray(cornell.aabb_min)
    hi = np.asarray(cornell.aabb_max)
    centre = 0.5 * (lo + hi)
    span = hi - lo
    origins = (centre + (rng.uniform(-1.2, 1.2, (N, 3))) * span).astype(np.float32)
    dirs = rng.normal(size=(N, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    o = jnp.asarray(origins)
    d = jnp.asarray(dirs)
    t_b, p_b = trace_brute_force(cornell, o, d)
    t_t, p_t = trace_closest(cornell, o, d)
    np.testing.assert_allclose(np.asarray(t_t), np.asarray(t_b), rtol=1e-4, atol=1e-4)
    # prim ids may differ only where two prims are equidistant
    diff = np.asarray(p_t) != np.asarray(p_b)
    assert diff.mean() < 0.01


def test_traversal_with_sphere_shape():
    b = SceneBuilder()
    b.add_obj(asset_path("model/cornell_box.obj"))
    b.add_shape(
        sphere_shape([278.0, 300.0, -280.0], 50.0),
        MaterialRec(C.MAT_LIGHT, color=[50.0, 50.0, 50.0]),
    )
    sc = b.build()
    assert sc.n_prims == 37
    # a ray straight at the sphere centre hits it
    o = jnp.asarray([[278.0, 300.0, 500.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, p = trace_closest(sc, o, d)
    assert int(p[0]) == 36
    np.testing.assert_allclose(float(t[0]), 500.0 - (-280.0) - 50.0, rtol=1e-4)


def test_teapot_traversal_matches_brute_force():
    b = SceneBuilder()
    b.add_obj(asset_path("model/Teapot.obj"))
    sc = b.build()
    assert sc.n_prims > 1000
    rng = np.random.default_rng(13)
    N = 256
    lo = np.asarray(sc.aabb_min)
    hi = np.asarray(sc.aabb_max)
    centre = 0.5 * (lo + hi)
    span = hi - lo
    origins = (centre + rng.uniform(-1.5, 1.5, (N, 3)) * span).astype(np.float32)
    dirs = rng.normal(size=(N, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    t_b, _ = trace_brute_force(sc, jnp.asarray(origins), jnp.asarray(dirs))
    t_t, _ = trace_closest(sc, jnp.asarray(origins), jnp.asarray(dirs))
    np.testing.assert_allclose(np.asarray(t_t), np.asarray(t_b), rtol=1e-3, atol=1e-3)
