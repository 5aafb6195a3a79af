"""Unit tests for the math substrate (morton codes, sampling, color,
geometry helpers) — the pure-function layer of the test pyramid
(SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ti_raytrace_tpu.utils import colorsp, geometry, morton, sampling, vec


def ref_expand_bits(x: int) -> int:
    x &= 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def test_expand_bits_matches_scalar():
    xs = np.arange(1024, dtype=np.uint32)
    got = np.asarray(morton.expand_bits(jnp.asarray(xs)))
    want = np.asarray([ref_expand_bits(int(x)) for x in xs], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_morton_ordering_locality():
    # points along x should have increasing codes when y=z=0
    x = jnp.linspace(0, 0.999, 64)
    z = jnp.zeros_like(x)
    codes = np.asarray(morton.morton3d(x, z, z))
    assert np.all(np.diff(codes.astype(np.int64)) >= 0)


def test_clz32():
    vals = np.array([0, 1, 2, 3, 255, 256, 0x7FFFFFFF, 0x80000000, 0xFFFFFFFF],
                    dtype=np.uint32)
    got = np.asarray(morton.clz32(jnp.asarray(vals)))
    want = np.asarray([32 - int(v).bit_length() for v in vals], np.int32)
    np.testing.assert_array_equal(got, want)


def test_common_upper_bits():
    a = jnp.asarray(np.array([0b1010, 0b1010], np.uint32))
    b = jnp.asarray(np.array([0b1011, 0b1010], np.uint32))
    got = np.asarray(morton.common_upper_bits(a, b))
    assert got[0] == 31  # differ in lowest bit
    assert got[1] == 32  # identical


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 256)
    y = colorsp.lrgb_to_srgb(colorsp.srgb_to_lrgb(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_xyz_yxy_roundtrip():
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(0.1, 1.0, (32, 3)).astype(np.float32))
    back = colorsp.Yxy_to_xyz(colorsp.xyz_to_Yxy(xyz))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xyz), rtol=1e-4)


def test_tone_aces_range():
    x = jnp.linspace(0.0, 100.0, 1000)
    y = np.asarray(colorsp.tone_aces(x))
    assert y.min() >= 0.0 and y.max() <= 1.0
    assert np.all(np.diff(y) >= -1e-6)  # monotone


def test_cosine_hemisphere_distribution():
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, (2, 200_000))
    d = sampling.cosine_sample_hemisphere(u[0], u[1])
    cz = np.asarray(d[..., 2])
    assert np.all(cz >= 0)
    # E[cos theta] = 2/3 for pdf cos/pi
    np.testing.assert_allclose(cz.mean(), 2.0 / 3.0, atol=5e-3)


def test_map_to_disk_uniform():
    key = jax.random.PRNGKey(2)
    u = jax.random.uniform(key, (2, 100_000))
    r, phi = sampling.map_to_disk(u[0], u[1])
    r = np.asarray(r)
    phi = np.asarray(phi)
    assert r.max() <= 1.0 + 1e-6 and r.min() >= 0.0
    # uniform disk => E[r^2] = 1/2
    np.testing.assert_allclose((r ** 2).mean(), 0.5, atol=5e-3)
    # the concentric map's angle spans [-pi/4, 7pi/4]
    assert phi.min() >= -np.pi / 4 - 1e-5 and phi.max() <= 7 * np.pi / 4 + 1e-5
    # angles should cover the circle uniformly: mean of unit vectors ~ 0
    np.testing.assert_allclose(np.cos(phi).mean(), 0.0, atol=2e-2)
    np.testing.assert_allclose(np.sin(phi).mean(), 0.0, atol=2e-2)


def test_onb_orthonormal():
    rng = np.random.default_rng(3)
    n = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    t, b = sampling.onb(n)
    nn = vec.normalize(n)
    for a_, b_ in [(t, b), (t, nn), (b, nn)]:
        np.testing.assert_allclose(np.asarray(vec.dot(a_, b_)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vec.length(t)), 1.0, atol=1e-5)


def test_to_world_preserves_z_as_normal():
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    local = jnp.asarray([[0.0, 0.0, 1.0]])
    w = sampling.to_world(local, n)
    np.testing.assert_allclose(np.asarray(w), [[0.0, 1.0, 0.0]], atol=1e-6)


def test_power_heuristic():
    got = float(sampling.power_heuristic(jnp.float32(2.0), jnp.float32(1.0)))
    np.testing.assert_allclose(got, 4.0 / 5.0, rtol=1e-6)


def test_slabs_hit_miss():
    o = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 5.0, 0.0], [0.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    bmin = jnp.asarray([2.0, -1.0, -1.0])
    bmax = jnp.asarray([3.0, 1.0, 1.0])
    hit, t = geometry.slabs(o, d, bmin, bmax)
    assert bool(hit[0]) and not bool(hit[1]) and not bool(hit[2])
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-6)


def test_slabs_origin_inside():
    o = jnp.asarray([[2.5, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    hit, t = geometry.slabs(o, d, jnp.asarray([2.0, -1.0, -1.0]), jnp.asarray([3.0, 1.0, 1.0]))
    assert bool(hit[0]) and float(t[0]) == 0.0


def test_offset_ray_moves_off_surface():
    p = jnp.asarray([[1.0, -2.0, 0.0001]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    q = np.asarray(geometry.offset_ray(p, n))
    assert q[0, 1] > -2.0  # moved along +y
    assert q[0, 0] == 1.0  # n.x == 0 -> unchanged... (int offset 0)


def test_refract_matches_snell():
    # entering eta=1/1.5 medium straight-on tilted 45deg
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    i = vec.normalize(jnp.asarray([[1.0, -1.0, 0.0]]))
    r, ok = geometry.refract(i, n, 1.0 / 1.5)
    assert bool(ok[0])
    sin_out = float(jnp.abs(r[0, 0]) / vec.length(r)[0])
    np.testing.assert_allclose(sin_out, np.sin(np.pi / 4) / 1.5, rtol=1e-5)


def test_refract_tir():
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    i = vec.normalize(jnp.asarray([[1.0, -0.1, 0.0]]))  # grazing
    _, ok = geometry.refract(i, n, 1.5)  # dense -> sparse
    assert not bool(ok[0])


def test_bk7_dispersion():
    n_blue = float(geometry.bk7_ior(jnp.float32(400.0)))
    n_red = float(geometry.bk7_ior(jnp.float32(700.0)))
    assert n_blue > n_red > 1.5  # normal dispersion, BK7 ~1.51-1.53


def test_faceforward():
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    nref = jnp.asarray([[0.0, 1.0, 0.0]])
    i_along = jnp.asarray([[0.0, 0.5, 0.0]])
    i_against = jnp.asarray([[0.0, -0.5, 0.0]])
    np.testing.assert_allclose(
        np.asarray(geometry.faceforward(n, i_along, nref)), [[0, 1, 0]], atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(geometry.faceforward(n, i_against, nref)), [[0, -1, 0]], atol=1e-7
    )
