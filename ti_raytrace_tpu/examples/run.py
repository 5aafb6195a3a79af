"""CLI render harness: the headless replacement for the reference's
Main.py + ti.GUI loop (Example.py:38-59).

    python -m ti_raytrace_tpu.examples.run cornell_box \
        --size 512 --frames 512 --out out.png

Progressive rendering: 1 spp per frame, running-mean accumulation,
periodic PNG snapshots and resumable checkpoints.
"""

import argparse
import json
import time

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform

fix_stale_platform()  # must run before the first `import jax`

from ti_raytrace_tpu import film as film_mod
from ti_raytrace_tpu.examples.scenes import EXAMPLES, make_camera
from ti_raytrace_tpu.metrics import RenderMeter


def get_integrator(name: str, cfg_sky=None, compaction=None, scene=None,
                   cfg=None):
    if name == "pt_rgb":
        import functools

        from ti_raytrace_tpu.integrators import pt_rgb

        nee = pt_rgb.has_nee_materials(scene) if scene is not None else True
        return functools.partial(pt_rgb.render_frame, compaction=compaction, nee=nee)
    if name == "debug":
        from ti_raytrace_tpu.integrators import debug

        return debug.render_frame
    if name == "pt_spec":
        from ti_raytrace_tpu.integrators import pt_spec

        sky = cfg_sky or {}
        return pt_spec.make_render_frame(**sky, compaction=compaction)
    if name == "bdpt_rgb":
        import functools

        from ti_raytrace_tpu.integrators import bdpt_rgb

        # 512^2 runs unsliced since the r2 tracer rework; 2 slices measured
        # slightly faster (0.92 vs 1.06 s/frame) and halve peak HBM
        return functools.partial(
            bdpt_rgb.render_frame_sliced, n_slices=2,
            walk_compaction=(cfg.bdpt_walk_compaction if cfg else None),
            shadow_cap=(cfg.bdpt_shadow_cap if cfg else None))
    if name == "bdpt_spec":
        from ti_raytrace_tpu.integrators import bdpt_spec

        return bdpt_spec.make_render_frame(
            **(cfg_sky or {}),
            walk_compaction=(cfg.bdpt_walk_compaction if cfg else None),
            shadow_cap=(cfg.bdpt_shadow_cap if cfg else None))
    raise ValueError(f"unknown integrator {name!r}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("example", choices=sorted(EXAMPLES))
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--out", default="out.png")
    ap.add_argument("--integrator", default=None, help="override integrator")
    ap.add_argument("--snapshot-every", type=int, default=64)
    ap.add_argument("--checkpoint", default=None, help="save/resume .npz path")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--preview", action="store_true",
                    help="live window + orbit keys (arrows/+-/q); moving "
                         "the camera restarts progressive accumulation")
    args = ap.parse_args(argv)

    from ti_raytrace_tpu.examples.scenes import example_cached

    scene, cfg = example_cached(args.example)
    spec, cam = make_camera(scene, cfg, args.size, args.size)
    compaction = cfg.compaction
    if compaction == "auto":
        from ti_raytrace_tpu.integrators import pt_rgb as _pt

        compaction = _pt.calibrate_compaction(scene, spec, cam)
        print(f"calibrated compaction schedule: {compaction}")
    integ_name = args.integrator or cfg.integrator
    render = get_integrator(integ_name, cfg.sky, compaction, scene, cfg)

    # Multi-frame dispatch for the wavefront PT integrators: the axon
    # tunnel has a ~30 ms per-dispatch floor, so batching 8 progressive
    # frames per dispatch nearly triples cornell's CLI frame rate
    # (90.9 -> ~35 ms/frame measured).  Preview mode keeps single-frame
    # dispatches (per-frame window updates + orbit response).
    render_batch = None
    batch_cap = cfg.batch or 8
    if integ_name == "pt_rgb":
        from ti_raytrace_tpu.integrators import pt_rgb

        _nee = pt_rgb.has_nee_materials(scene)
        # PRODUCTION path (VERDICT r4 #5): scenes with a measured merged
        # group ride render_film_frames_merged — the bench's merged
        # multi-frame dispatch with group-pooled compaction — instead of
        # plain batched frames.  Larger dispatches amortize the ~30 ms
        # tunnel floor further; odd tails fall back to the plain path.
        _group = cfg.group or 0
        _merged = bool(compaction) and _group > 1
        if _merged and not cfg.batch:
            batch_cap = 64

        def render_batch(fl, n):
            if _merged and n % _group == 0:
                fl, _ = pt_rgb.render_film_frames_merged(
                    scene, spec, cam, fl, n_frames=n, group=_group,
                    compaction=compaction, nee=_nee,
                )
            else:
                fl, _ = pt_rgb.render_film_frames(
                    scene, spec, cam, fl, n_frames=n, compaction=compaction,
                    nee=_nee,
                )
            return fl
    elif integ_name == "pt_spec":
        from ti_raytrace_tpu.integrators import pt_spec

        _sdata = pt_spec.make_spectral_data(**(cfg.sky or {}))

        def render_batch(fl, n):
            fl, _ = pt_spec.render_film_frames_spec(
                scene, _sdata, spec, cam, fl, n_frames=n,
                compaction=compaction,
            )
            return fl
    elif integ_name in ("bdpt_rgb", "bdpt_spec"):
        import functools

        import jax
        import jax.numpy as jnp

        # BDPT frames are 0.4-1 s, so the ~30 ms tunnel floor is small —
        # but n frames per dispatch still saves the per-frame host
        # round-trip.  Key/frame discipline matches the sequential loop
        # (render(fl.frame, fl.key) then accumulate) bit for bit.
        batch_cap = cfg.batch or 4

        @functools.partial(jax.jit, static_argnames=("n",))
        def _batch(fl, n):
            def body(_, fl):
                rad = render(scene, spec, cam, fl.frame, fl.key)
                return film_mod.accumulate(fl, rad)

            return jax.lax.fori_loop(0, n, body, fl)

        def render_batch(fl, n):
            return _batch(fl, n=n)

    fl = film_mod.new_film(args.size, args.size, seed=args.seed)
    if args.checkpoint:
        try:
            fl = film_mod.load_checkpoint(args.checkpoint)
            print(f"resumed at frame {int(fl.frame)}")
        except FileNotFoundError:
            pass

    preview = None
    if args.preview:
        import numpy as np

        from ti_raytrace_tpu.examples.preview import OrbitRig, PygamePreview
        from ti_raytrace_tpu.examples.scenes import framing_params

        rig = OrbitRig(*framing_params(scene, cfg))
        cam = rig.camera()
        preview = PygamePreview(rig, args.size, args.size, cfg.name)

    meter = RenderMeter(spec.width * spec.height)
    while int(fl.frame) < args.frames:
        t0 = time.perf_counter()
        if render_batch is not None and preview is None:
            f0 = int(fl.frame)
            until_snap = args.snapshot_every - (f0 % args.snapshot_every)
            n = max(1, min(batch_cap, args.frames - f0, until_snap))
            fl = render_batch(fl, n)
            fl.hdr.block_until_ready()
            meter.tick(time.perf_counter() - t0, n)
        else:
            radiance = render(scene, spec, cam, fl.frame, fl.key)
            fl = film_mod.accumulate(fl, radiance)
            fl.hdr.block_until_ready()
            meter.tick(time.perf_counter() - t0)
        f = int(fl.frame)
        if preview is not None:
            srgb = film_mod.to_srgb(fl, exposure=cfg.exposure)
            preview.show(np.asarray(srgb * 255.0, dtype=np.uint8))
            preview.set_hud(f, args.frames, meter.fps)
            action = preview.poll()
            if action == "quit":
                break
            if action == "camera":
                # same semantics as the reference's cam_is_dirty reset
                # (Camera.py:70-79): orbit moves restart accumulation
                cam = rig.camera()
                fl = film_mod.new_film(args.size, args.size, seed=args.seed)
                continue
        if f % args.snapshot_every == 0 or f == args.frames:
            film_mod.save_png(fl, args.out, exposure=cfg.exposure)
            if args.checkpoint:
                film_mod.save_checkpoint(fl, args.checkpoint)
            print(f"frame {f}/{args.frames}  {meter.summary()}")

    if preview is not None:
        preview.close()

    film_mod.save_png(fl, args.out, exposure=cfg.exposure)
    print(json.dumps(meter.report()))


if __name__ == "__main__":
    main()
