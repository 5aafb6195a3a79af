"""Multi-chip rendering: pixel-tile sharding over a device mesh.

Path tracing is embarrassingly parallel per pixel (SURVEY.md §5.8), so the
sharding story is simple and rides ICI exclusively:

  * the scene pytree (geometry, BVH, packs, env map, spectral tables) is
    REPLICATED on every device;
  * the ray wavefront and film are SHARDED along the pixel axis (the lane
    axis of every planar (…, N) tensor);
  * PT needs no cross-device communication at all
    (render_frame_sharded); BDPT's light-tracing splats land on
    arbitrary pixels, so each device accumulates a local
    full-resolution splat film which is `jax.lax.psum`-reduced once per
    frame (render_bdpt_frame_sharded) — the only collective in the
    renderer.

`make_mesh()` builds a 1-D mesh over all local devices; the render
wrappers put the integrators' planar path kernels under `shard_map`.
The key discipline matches bdpt_rgb.render_frame_sliced (shard i ==
lane slice i), so an 8-device frame equals the 8-slice single-device
frame up to splat summation order.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

AXIS = "pix"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (AXIS,))


def replicate_scene(scene, mesh: Mesh):
    """Place every scene leaf replicated on the mesh."""
    spec = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, spec), scene)


def render_frame_sharded(render_paths_fn, scene, spec, cam, frame, key, mesh: Mesh):
    """One progressive frame over the mesh.

    render_paths_fn(scene, o, d, key) -> (3, N_local) radiance (an
    integrator's planar path kernel, e.g. pt_rgb.trace_paths).

    Rays are generated globally (deterministic per frame) and sharded
    along the wavefront axis; each device traces its pixel shard against
    the replicated scene.  The returned radiance is the full (W, H, 3)
    frame (sharded; converges to host layout on use).
    """
    from ti_raytrace_tpu.camera import ray_directions, ray_origins

    k_cam, k_path = jax.random.split(key)
    o = jnp.swapaxes(ray_origins(spec, cam), 0, 1)
    d = jnp.swapaxes(ray_directions(spec, cam, frame, k_cam), 0, 1)

    scene_specs = jax.tree.map(lambda _: P(), scene)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(scene_specs, P(None, AXIS), P(None, AXIS), P()),
        out_specs=P(None, AXIS),
        check_vma=False,
    )
    def _run(scene_, o_, d_, key_):
        # decorrelate RNG across shards by the device's mesh position
        my = jax.lax.axis_index(AXIS)
        return render_paths_fn(scene_, o_, d_, jax.random.fold_in(key_, my))

    radiance = _run(scene, o, d, k_path)
    return jnp.swapaxes(radiance, 0, 1).reshape(spec.width, spec.height, 3)


def render_bdpt_frame_sharded(scene, spec, cam, frame, key, mesh: Mesh,
                              strategies=None, max_depth=None):
    """One progressive BDPT frame over the mesh.

    Eye pixels are sharded along the wavefront axis; every device walks
    its own eye+light subpaths and connects all (e, l) strategies
    locally.  The e=1 light-tracing strategy splats through the camera
    onto ARBITRARY pixels (reference BDPT_RGB.py:630-633), so each
    device scatters into a local full-resolution splat film and the
    films are `jax.lax.psum`-reduced across the mesh — the one
    collective this renderer needs.  Key discipline matches
    bdpt_rgb.render_frame_sliced with n_slices == mesh size.

    strategies: optional host predicate f(e, l) -> bool restricting the
    compiled strategy families (tests/dryruns: the full ~30-strategy
    graph under shard_map is expensive to partition/compile on the
    8-virtual-device CPU backend).
    """
    from ti_raytrace_tpu.camera import ray_directions, ray_origins
    from ti_raytrace_tpu.integrators import bdpt_rgb

    if max_depth is None:
        max_depth = bdpt_rgb.MAX_DEPTH

    k_cam, k_eye, k_light, k_conn = jax.random.split(key, 4)
    o = jnp.swapaxes(ray_origins(spec, cam), 0, 1)
    d = jnp.swapaxes(ray_directions(spec, cam, frame, k_cam), 0, 1)

    scene_specs = jax.tree.map(lambda _: P(), scene)
    cam_specs = jax.tree.map(lambda _: P(), cam)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(scene_specs, P(None, AXIS), P(None, AXIS), cam_specs,
                  P(), P(), P()),
        out_specs=(P(None, AXIS), P()),
        check_vma=False,
    )
    def _run(scene_, o_, d_, cam_, ke, kl, kc):
        my = jax.lax.axis_index(AXIS)
        ns = o_.shape[1]
        eye, eye_count = bdpt_rgb.build_eye_path_rays(
            scene_, o_, d_, jax.random.fold_in(ke, my),
            eye_depth=max_depth + 2,
        )
        light, light_count = bdpt_rgb.build_light_path(
            scene_, ns, jax.random.fold_in(kl, my),
            light_depth=max_depth + 1,
        )
        radiance, splat = bdpt_rgb._connections(
            scene_, spec, cam_, eye, eye_count, light, light_count,
            jax.random.fold_in(kc, my), strategies=strategies,
            max_depth=max_depth,
        )
        # cross-pixel splats: the only cross-device reduction
        splat = jax.lax.psum(splat, AXIS)
        return radiance, splat

    radiance, splat = _run(scene, o, d, cam, k_eye, k_light, k_conn)
    img = jnp.swapaxes(radiance, 0, 1).reshape(spec.width, spec.height, 3)
    return img + splat
