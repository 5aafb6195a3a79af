"""Procedural mesh utilities: subdivision + benchmark mesh.

The reference's 100k-triangle benchmark mesh (`model/mc.obj`,
README.md:56-58 / single_model.py:20) is a missing blob upstream, so the
benchmark substitutes a subdivided Teapot at >= 100k triangles
(BASELINE.md note).  Subdivision happens on triangle soup (T, 3, 3) with
attribute interpolation, so any loaded OBJ can be densified.
"""

import numpy as np


def subdivide4(pos, nrm, uv):
    """1:4 midpoint subdivision of a triangle soup.
    pos/nrm: (T,3,3); uv: (T,3,2) -> 4x the triangles."""
    p0, p1, p2 = pos[:, 0], pos[:, 1], pos[:, 2]
    m01 = 0.5 * (p0 + p1)
    m12 = 0.5 * (p1 + p2)
    m20 = 0.5 * (p2 + p0)

    def mids(a):
        a0, a1, a2 = a[:, 0], a[:, 1], a[:, 2]
        return 0.5 * (a0 + a1), 0.5 * (a1 + a2), 0.5 * (a2 + a0)

    n01, n12, n20 = mids(nrm)
    t01, t12, t20 = mids(uv)

    def quad(c0, c1, c2):
        return np.stack([c0, c1, c2], axis=1)

    new_pos = np.concatenate(
        [quad(p0, m01, m20), quad(m01, p1, m12), quad(m20, m12, p2), quad(m01, m12, m20)]
    )
    n0, n1, n2 = nrm[:, 0], nrm[:, 1], nrm[:, 2]
    new_nrm = np.concatenate(
        [quad(n0, n01, n20), quad(n01, n1, n12), quad(n20, n12, n2), quad(n01, n12, n20)]
    )
    u0, u1, u2 = uv[:, 0], uv[:, 1], uv[:, 2]
    new_uv = np.concatenate(
        [quad(u0, t01, t20), quad(t01, u1, t12), quad(t20, t12, u2), quad(t01, t12, t20)]
    )
    return new_pos.astype(np.float32), new_nrm.astype(np.float32), new_uv.astype(np.float32)


def split2(pos, nrm, uv):
    """1:2 split along edge v0-v1 (uniform; doubles the count)."""
    p0, p1, p2 = pos[:, 0], pos[:, 1], pos[:, 2]
    m = 0.5 * (p0 + p1)
    nm = 0.5 * (nrm[:, 0] + nrm[:, 1])
    tm = 0.5 * (uv[:, 0] + uv[:, 1])

    def tri(a, b, c):
        return np.stack([a, b, c], axis=1)

    new_pos = np.concatenate([tri(p0, m, p2), tri(m, p1, p2)])
    new_nrm = np.concatenate(
        [tri(nrm[:, 0], nm, nrm[:, 2]), tri(nm, nrm[:, 1], nrm[:, 2])]
    )
    new_uv = np.concatenate([tri(uv[:, 0], tm, uv[:, 2]), tri(tm, uv[:, 1], uv[:, 2])])
    return new_pos.astype(np.float32), new_nrm.astype(np.float32), new_uv.astype(np.float32)


def densify_to(pos, nrm, uv, target: int):
    """Subdivide until at least `target` triangles (1:4 steps, then one
    1:2 step if that overshoots less)."""
    while pos.shape[0] < target:
        if pos.shape[0] * 2 >= target:
            pos, nrm, uv = split2(pos, nrm, uv)
        else:
            pos, nrm, uv = subdivide4(pos, nrm, uv)
    return pos, nrm, uv
