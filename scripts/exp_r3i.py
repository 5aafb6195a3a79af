"""Sweep cluster block size (tris/cluster) against the real frame metric.

The kernel's sweep overhead scales with cluster count (chunk loops,
group candidate refreshes, per-tile order tables) while the narrow
phase scales with block width x visits; with only ~3 clusters visited
per tile (profile_bench), bigger clusters should trade cheap MT width
for half the sweep overhead.

Usage: BLOCK=256 [TILE=256 GROUP=32 KF=4] python scripts/exp_r3i.py
One process per config (pallas jit caches key on shapes + globals).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

fix_stale_platform()

import jax

wait_for_device()

from ti_raytrace_tpu.ops import cluster_trace as ct

BLOCK = int(os.environ.get("BLOCK", "128"))
METHOD = os.environ.get("CLUSTERS", "")
ct.TILE = int(os.environ.get("TILE", ct.TILE))
ct.TILE_WIDE = int(os.environ.get("TILE_WIDE", ct.TILE_WIDE))
ct.TILE_WIDE_CUTOFF = int(os.environ.get("CUTOFF", ct.TILE_WIDE_CUTOFF))
ct.GROUP = int(os.environ.get("GROUP", ct.GROUP))
ct.TSKIP = bool(int(os.environ.get("TSKIP", "1" if ct.TSKIP else "0")))
ct.MT_MXU = bool(int(os.environ.get("MT_MXU", "1" if ct.MT_MXU else "0")))
ct.NSUB = int(os.environ.get("NSUB", ct.NSUB))
ct.DIAG_NO_NARROW = bool(int(os.environ.get("NO_NARROW", "0")))
ct.BF16_SLAB = bool(int(os.environ.get("BF16_SLAB", "1" if ct.BF16_SLAB else "0")))
KF = int(os.environ.get("KF", "4"))

from ti_raytrace_tpu import film as film_mod
from ti_raytrace_tpu.accel.clusters import build_clusters
from ti_raytrace_tpu.camera import CameraSpec, orbit_camera
from ti_raytrace_tpu.examples.scenes import BENCH_SCHEDULE
from ti_raytrace_tpu.integrators import pt_rgb
from ti_raytrace_tpu.scene.build import BUILD_FORMAT_VERSION
from ti_raytrace_tpu.scene.data import device_scene


def log(*a):
    print(*a, file=sys.stderr, flush=True)


cache_path = os.path.join(
    "/root/repo", ".cache", f"bench_scene_100000_v{BUILD_FORMAT_VERSION}.npz"
)
with np.load(cache_path) as z:
    host = {k: z[k] for k in z.files}
if BLOCK != 128 or METHOD:
    host.update(build_clusters(host, block=BLOCK, method=METHOD or None))
scene = device_scene(host)
log(f"block={BLOCK} method={METHOD or 'median'} "
    f"clusters={scene.cluster_bounds.shape[1]} "
    f"tile={ct.TILE} group={ct.GROUP}")

size = 512
lo = np.asarray(scene.aabb_min); hi = np.asarray(scene.aabb_max)
centre = 0.5 * (lo + hi)
scale = float(np.linalg.norm(hi - lo)) * 0.8
spec = CameraSpec(size, size)
cam = orbit_camera(centre, 0.0, 0.0, scale)
nee = pt_rgb.has_nee_materials(scene)
# SCHED="1:4,3:8,5:16,8:64" overrides the bench compaction schedule
_s = os.environ.get("SCHED", "")
compaction = (
    tuple(tuple(int(x) for x in p.split(":")) for p in _s.split(","))
    if _s else BENCH_SCHEDULE
)

fl = film_mod.new_film(size, size)
step = lambda f: pt_rgb.render_film_frames(  # noqa: E731
    scene, spec, cam, f, KF, compaction, nee)
t0 = time.time()
fl, ov = step(fl); fl.hdr.block_until_ready()
log(f"compile+first: {time.time()-t0:.1f}s mean={float(np.asarray(fl.hdr).mean()):.6f} "
    f"overflow={int(np.asarray(ov))}")
best = 1e9
for _ in range(6):
    t0 = time.perf_counter()
    fl, _ = step(fl); fl.hdr.block_until_ready()
    best = min(best, time.perf_counter() - t0)
print(f"BLOCK={BLOCK} TILE={ct.TILE} WIDE={ct.TILE_WIDE}@{ct.TILE_WIDE_CUTOFF} "
      f"GROUP={ct.GROUP} TSKIP={ct.TSKIP} MXU={ct.MT_MXU} NSUB={ct.NSUB} "
      f"KF={KF}: {best/KF*1e3:.1f} ms/frame -> {KF/best:.2f} fps", flush=True)
