"""Emitter sampling, vectorized over wavefronts.

Re-implements the reference's light-sampling device functions:
  sample_point_on_prim    <- Scene.get_prim_random_point_normal (:382-420)
  sample_li               <- Scene.sample_li (:478-518)  receiver-side NEE
  sample_light            <- Scene.sample_light (:431-474) emitter-side
                             sampling for BDPT light subpaths

Quirk preserved: the reference interpolates the sample position with
barycentrics (a,b) on edges (v3-v1),(v2-v1) but the normal with swapped
weights (Scene.py:401-402) — harmless for flat emitters; kept for parity.
"""

from typing import NamedTuple

import jax.numpy as jnp

from ti_raytrace_tpu.core import constants as C
from ti_raytrace_tpu.utils import sampling, vec


class LightSample(NamedTuple):
    pos: jnp.ndarray        # (...,3) point on the emitter
    normal: jnp.ndarray     # (...,3) emitter normal at the point
    direction: jnp.ndarray  # (...,3) from the emitter point (context-dep.)
    emission: jnp.ndarray   # (...,3) radiance (visibility-scaled for NEE)
    dist: jnp.ndarray       # (...,) emitter->receiver distance (sample_li)
    prim: jnp.ndarray       # (...,) primitive id of the emitter
    choice_pdf: jnp.ndarray  # (...,) light-pick * area pdf
    dir_pdf: jnp.ndarray    # (...,) direction pdf at the emitter


def _gather_light_prim(scene, u_pick):
    """Uniform light selection (Scene.get_random_light_prim_index:423-428).
    """
    L = scene.n_lights
    idx = jnp.minimum((u_pick * L).astype(jnp.int32), L - 1)
    return scene.light_prim[idx]


def _point_on_prim(scene, prim, a, b):
    """Uniform point + normal on an emitter primitive."""
    pid = jnp.clip(prim, 0, scene.n_prims - 1)
    ptype = scene.prim_type[pid]
    vi = jnp.clip(scene.prim_vidx[pid], 0, max(scene.vtx_pos.shape[0] - 3, 0))

    # triangle: fold the unit square onto the triangle
    flip = (a + b) > 1.0
    ta = jnp.where(flip, 1.0 - a, a)
    tb = jnp.where(flip, 1.0 - b, b)
    v1 = scene.vtx_pos[vi + 0]
    v2 = scene.vtx_pos[vi + 1]
    v3 = scene.vtx_pos[vi + 2]
    n1 = scene.vtx_normal[vi + 0]
    n2 = scene.vtx_normal[vi + 1]
    n3 = scene.vtx_normal[vi + 2]
    aa, bb = ta[..., None], tb[..., None]
    tri_pos = v1 + (v3 - v1) * aa + (v2 - v1) * bb
    tri_n = vec.normalize((1.0 - aa - bb) * n1 + n2 * aa + n3 * bb)

    # shapes
    sid = jnp.clip(scene.prim_vidx[pid], 0, max(scene.shape_type.shape[0] - 1, 0))
    stype = scene.shape_type[sid]
    centre = scene.shape_pos[sid]
    radius = scene.shape_param[sid, 0:1]
    sph_n = sampling.uniform_sample_sphere(a, b)
    sph_pos = centre + sph_n * radius
    fixed_n = scene.shape_param[sid, 3:6]  # spot/laser stored normal

    is_tri = (ptype == C.PRIM_TRI)[..., None]
    is_sphere = (stype == C.SHAPE_SPHERE)[..., None]
    pos = jnp.where(is_tri, tri_pos, jnp.where(is_sphere, sph_pos, centre))
    nrm = jnp.where(is_tri, tri_n, jnp.where(is_sphere, sph_n, fixed_n))
    return pos, vec.normalize(nrm), ptype, stype, sid


def sample_li(scene, shade_pos, u3) -> LightSample:
    """Receiver-side next-event estimation from `shade_pos`.

    u3: (..., 3) uniforms (light pick, area a, area b).
    direction points from the light TOWARD the receiver (the reference's
    shadow rays start at the light, Scene.py:487-489 / PT_RGB.py:104).
    """
    prim = _gather_light_prim(scene, u3[..., 0])
    pos, nrm, ptype, stype, sid = _point_on_prim(scene, prim, u3[..., 1], u3[..., 2])

    pid = jnp.clip(prim, 0, scene.n_prims - 1)
    mat = scene.prim_mat[pid]
    emission = scene.mat_color[mat]
    area = scene.prim_area[pid]
    L = jnp.float32(scene.n_lights)
    choice_pdf = 1.0 / (L * jnp.maximum(area, 1e-12))

    d = shade_pos - pos
    dist = jnp.maximum(vec.length(d), 1e-12)
    direction = d / dist[..., None]
    n_dot_l = jnp.abs(vec.dot(direction, nrm))
    dir_pdf = sampling.cosine_hemisphere_pdf(n_dot_l)
    vis = jnp.ones_like(dist)

    # spot falloff cone (Scene.py:499-507)
    is_spot = (ptype == C.PRIM_SHAPE) & (stype == C.SHAPE_SPOT)
    x1 = scene.shape_param[sid, 0]
    x2 = scene.shape_param[sid, 1]
    x = jnp.arccos(jnp.clip(n_dot_l, -1.0, 1.0))
    spot_vis = jnp.where(
        x > x2,
        0.0,
        jnp.where(x > x1, 1.0 - (x - x1) / jnp.maximum(x2 - x1, 1e-12), 1.0),
    )
    vis = jnp.where(is_spot, vis * spot_vis, vis)
    dir_pdf = jnp.where(is_spot, 1.0, dir_pdf)

    # laser beam visibility cylinder (Scene.py:508-516)
    is_laser = (ptype == C.PRIM_SHAPE) & (stype == C.SHAPE_LASER)
    proj = vec.dot(direction, nrm) * dist
    r_off = jnp.sqrt(jnp.maximum(dist * dist - proj * proj, 0.0))
    limit_r = scene.shape_param[sid, 0]
    vis = jnp.where(is_laser & (r_off > limit_r), 0.0, vis)
    dir_pdf = jnp.where(is_laser, 1.0, dir_pdf)
    choice_pdf = jnp.where(is_laser, 1.0 / L, choice_pdf)

    return LightSample(
        pos=pos,
        normal=nrm,
        direction=direction,
        emission=emission * vis[..., None],
        dist=dist,
        prim=prim,
        choice_pdf=choice_pdf,
        dir_pdf=dir_pdf,
    )


def sample_light(scene, u6) -> LightSample:
    """Emitter-side sampling for light subpaths (BDPT).

    u6: (..., 6) uniforms (pick, a, b, dir1, dir2, extra for spot disk /
    laser phase).  direction is the emitted ray direction.
    """
    prim = _gather_light_prim(scene, u6[..., 0])
    pos, nrm, ptype, stype, sid = _point_on_prim(scene, prim, u6[..., 1], u6[..., 2])

    pid = jnp.clip(prim, 0, scene.n_prims - 1)
    mat = scene.prim_mat[pid]
    emission = scene.mat_color[mat]
    area = scene.prim_area[pid]
    L = jnp.float32(scene.n_lights)
    choice_pdf = 1.0 / (L * jnp.maximum(area, 1e-12))

    local, dir_pdf = sampling.cosine_sample_hemisphere_pdf(u6[..., 3], u6[..., 4])
    direction = sampling.to_world(local, nrm)

    # spot: sample the falloff disk (Scene.py:449-461)
    is_spot = (ptype == C.PRIM_SHAPE) & (stype == C.SHAPE_SPOT)
    x1 = scene.shape_param[sid, 0]
    x2 = scene.shape_param[sid, 1]
    scale = scene.shape_param[sid, 2]
    r_u, phi = sampling.map_to_disk(u6[..., 3], u6[..., 4])
    r1 = scale * jnp.tan(x1)
    r2 = scale * jnp.tan(x2)
    r = r_u * r2
    spot_fade = jnp.where(
        r > r1, 1.0 - (r - r1) / jnp.maximum(r2 - r1, 1e-12), 1.0
    )
    spot_pt = jnp.stack(
        [
            r * jnp.cos(phi),
            r * jnp.sin(phi),
            jnp.sqrt(jnp.maximum(0.0, scale * scale - r * r)),
        ],
        axis=-1,
    )
    spot_dir = sampling.to_world(spot_pt, nrm)
    emission = jnp.where(is_spot[..., None], emission * spot_fade[..., None], emission)
    direction = jnp.where(is_spot[..., None], spot_dir, direction)
    dir_pdf = jnp.where(is_spot, 1.0, dir_pdf)

    # laser: parallel beam from a disk origin (Scene.py:463-472)
    is_laser = (ptype == C.PRIM_SHAPE) & (stype == C.SHAPE_LASER)
    radius = scene.shape_param[sid, 0]
    phi_l = u6[..., 5] * C.TWO_PI
    disk_pt = jnp.stack(
        [radius * jnp.cos(phi_l), radius * jnp.sin(phi_l), jnp.zeros_like(phi_l)],
        axis=-1,
    )
    disk_off = sampling.to_world(disk_pt, nrm)
    pos = jnp.where(is_laser[..., None], pos + disk_off, pos)
    direction = jnp.where(is_laser[..., None], nrm, direction)
    dir_pdf = jnp.where(is_laser, 1.0, dir_pdf)
    choice_pdf = jnp.where(is_laser, 1.0 / L, choice_pdf)

    return LightSample(
        pos=pos,
        normal=nrm,
        direction=direction,
        emission=emission,
        dist=jnp.zeros_like(dir_pdf),
        prim=prim,
        choice_pdf=choice_pdf,
        dir_pdf=dir_pdf,
    )
