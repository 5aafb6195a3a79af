"""Interactive preview: orbit rig semantics + the pygame window layer
driven headlessly (SDL dummy video driver) + the run.py --preview loop
end to end on a tiny cornell render."""

import os

import numpy as np
import pytest

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")

from ti_raytrace_tpu.examples.preview import (OrbitRig, PITCH_LIMIT,
                                              PygamePreview)


def test_orbit_rig_actions():
    rig = OrbitRig((0.0, 1.0, 0.0), yaw=0.2, pitch=0.1, scale=4.0)
    cam0 = rig.camera()
    assert rig.apply("yaw+")
    assert rig.yaw == pytest.approx(0.3)
    cam1 = rig.camera()
    assert not np.allclose(np.asarray(cam0.eye), np.asarray(cam1.eye))
    assert rig.apply("zoom_in")
    assert rig.scale < 4.0
    assert not rig.apply("bogus")
    # pitch clamps inside orbit_camera's singularity guard
    for _ in range(40):
        rig.apply("pitch+")
    assert rig.pitch == pytest.approx(PITCH_LIMIT)


def test_pygame_preview_events_and_show():
    pygame = pytest.importorskip("pygame")
    rig = OrbitRig((0.0, 0.0, 0.0), 0.0, 0.0, 2.0)
    pv = PygamePreview(rig, 32, 32, "test")
    try:
        assert pv.poll() is None
        pygame.event.post(
            pygame.event.Event(pygame.KEYDOWN, key=pygame.K_RIGHT)
        )
        assert pv.poll() == "camera"
        assert rig.yaw == pytest.approx(0.1)
        img = (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(
            np.uint8
        )
        pv.show(img)  # blit + flip under the dummy driver
        pygame.event.post(
            pygame.event.Event(pygame.KEYDOWN, key=pygame.K_ESCAPE)
        )
        assert pv.poll() == "quit"
    finally:
        pv.close()


def test_run_cli_preview_loop(tmp_path):
    """--preview renders progressively into the (dummy) window: the CLI
    loop exercises show()/poll() every frame and still writes the PNG."""
    pytest.importorskip("pygame")
    from ti_raytrace_tpu.examples.run import main

    out = str(tmp_path / "preview.png")
    main(["cornell_box", "--size", "16", "--frames", "2", "--out", out,
          "--snapshot-every", "1", "--preview"])
    assert os.path.exists(out)
