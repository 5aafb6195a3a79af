"""Decode a packed hit record (see scene/packs.py) into shading geometry.

Planar throughout: positions/normals are (3, N), scalars (N,).
"""

from typing import NamedTuple

import jax.numpy as jnp

from ti_raytrace_tpu.core import constants as C
from ti_raytrace_tpu.ops import planar as pv


class Hit(NamedTuple):
    valid: jnp.ndarray      # (N,) bool
    t: jnp.ndarray          # (N,)
    prim: jnp.ndarray       # (N,) int32
    pos: jnp.ndarray        # (3, N)
    gnormal: jnp.ndarray    # (3, N) unit
    normal: jnp.ndarray     # (3, N) unit interpolated shading normal
    uv: jnp.ndarray         # (2, N) texture coords
    mat_type: jnp.ndarray   # (N,) int32
    mat_color: jnp.ndarray  # (3, N) authored (sRGB) color / emission
    mat_p0: jnp.ndarray     # (N,) metallic | ior
    mat_p1: jnp.ndarray     # (N,) roughness | extinction
    area: jnp.ndarray       # (N,) primitive area
    mat_tex: jnp.ndarray    # (N,) int32 albedo texture id


def decode_hit(o, d, t, prim, uv_bary, attr) -> Hit:
    """Build the hit record from the (32, N) attribute columns."""
    valid = (t < C.INF) & (prim >= 0)
    pos = o + d * t[None]

    u, v = uv_bary[0], uv_bary[1]
    a = 1.0 - u - v
    n_tri = attr[3:6] * a[None] + attr[6:9] * u[None] + attr[9:12] * v[None]
    uv1 = attr[12:14]
    uv2 = attr[14:16]
    uv3 = attr[16:18]
    uv_tex = uv1 * a[None] + uv2 * u[None] + uv3 * v[None]

    is_shape = attr[25] > 0.5
    centre = attr[26:29]
    n_sph = pos - centre

    gnormal = pv.normalize(pv.where(is_shape, n_sph, attr[0:3]))
    normal = pv.normalize(pv.where(is_shape, n_sph, n_tri))

    return Hit(
        valid=valid,
        t=t,
        prim=prim,
        pos=pos,
        gnormal=gnormal,
        normal=normal,
        uv=jnp.where(is_shape[None], 0.0, uv_tex),
        mat_type=attr[18].astype(jnp.int32),
        mat_color=attr[19:22],
        mat_p0=attr[22],
        mat_p1=attr[23],
        area=attr[24],
        mat_tex=attr[31].astype(jnp.int32),
    )
