"""Region-resolved veach PT vs reference-golden comparison.

The veach_pt golden sits at brightness ratio ~0.966 with the residual
attributed to 'left-wall NEE spill' (CLAUDE.md r2 note) but never
localized.  This renders veach with PT at 512^2, tone-maps exactly as
tools/golden.py does, and prints a 16x16 block-ratio map (ours/golden)
plus the worst blocks, to localize where the energy differs.

    JAX_PLATFORMS=tpu python scripts/veach_diag.py [--frames 64]
"""

import argparse
import os
import sys

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

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", default="/tmp/veach_diag.png")
    args = ap.parse_args()

    from ti_raytrace_tpu.io.assets import asset_path
    from ti_raytrace_tpu.io.image import film_to_image, read_image
    from ti_raytrace_tpu.tools.golden import render_scene

    img = film_to_image(
        render_scene("veach_bdpt", args.frames, args.size,
                     integrator="pt_rgb")
    )
    ref = read_image(asset_path("image/veach-pt512.png"))
    assert ref.shape[:2] == (args.size, args.size), ref.shape

    ours = np.asarray(img, np.float64)
    theirs = np.asarray(ref, np.float64)
    log(f"global mean ours={ours.mean():.4f} ref={theirs.mean():.4f} "
        f"ratio={ours.mean()/theirs.mean():.4f} "
        f"mad={np.abs(ours-theirs).mean():.4f}")

    B = args.size // 16
    om = ours.reshape(16, B, 16, B, 3).mean(axis=(1, 3, 4))
    rm = theirs.reshape(16, B, 16, B, 3).mean(axis=(1, 3, 4))
    ratio = om / np.maximum(rm, 1e-4)
    np.set_printoptions(precision=2, linewidth=200, suppress=True)
    log("block ratio map (rows = image y top->bottom, cols = x):")
    log(str(ratio))
    diff = om - rm
    worst = np.dstack(np.unravel_index(
        np.argsort(np.abs(diff).ravel())[::-1][:10], diff.shape))[0]
    for y, x in worst:
        log(f"block y={y} x={x}: ours {om[y, x]:.4f} ref {rm[y, x]:.4f} "
            f"ratio {ratio[y, x]:.3f} absdiff {abs(diff[y, x]):.4f}")

    # side-by-side + amplified signed diff panel for eyeballing
    from ti_raytrace_tpu.io.image import write_png

    d = np.clip(0.5 + 4.0 * (ours - theirs), 0.0, 1.0)
    panel = np.concatenate([ours, theirs, d], axis=1)
    write_png(args.out, panel)
    log(f"panel (ours | golden | 4x signed diff) -> {args.out}")


if __name__ == "__main__":
    main()
