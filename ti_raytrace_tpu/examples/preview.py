"""Interactive progressive preview: live window + mouse/keyboard orbit.

The reference renders into a live ``ti.GUI`` window every frame and
exposes an orbit camera rig (yaw/pitch/scale around a target,
Camera.py:68-104, driven by the GUI loop at example/Example.py:38-59).
This is the headless-first framework's counterpart: a small pygame
window refreshed with the film's current sRGB state, an fps/spp HUD in
the title bar, and an orbit rig driven by mouse or keyboard —

    left-drag   orbit yaw / pitch
    wheel       dolly in / out
    arrows      orbit yaw / pitch
    + / -       dolly in / out
    q / ESC     quit

Moving the camera restarts progressive accumulation (same as the
reference's per-move ``set_view_point``/``update`` reset,
Camera.py:97-104).

The rig (`OrbitRig`) is a pure state machine, unit-testable without a
display; `PygamePreview` is the thin window/event layer (pygame runs
headless under SDL_VIDEODRIVER=dummy, which is how the test suite
exercises it end to end).
"""

import numpy as np

from ti_raytrace_tpu.camera import orbit_camera

YAW_STEP = 0.1       # radians per key press
PITCH_STEP = 0.1
ZOOM_STEP = 0.9      # multiplicative dolly factor
PITCH_LIMIT = 1.5    # orbit_camera clips at +-1.57
DRAG_SCALE = 0.01    # radians per pixel of mouse drag


class OrbitRig:
    """Orbit-camera state: target, yaw, pitch, scale -> CameraState.

    `apply(action)` mutates the rig and returns True when the camera
    changed (the caller then restarts progressive accumulation)."""

    ACTIONS = ("yaw+", "yaw-", "pitch+", "pitch-", "zoom_in", "zoom_out")

    def __init__(self, target, yaw: float, pitch: float, scale: float):
        self.target = np.asarray(target, np.float64)
        self.yaw = float(yaw)
        self.pitch = float(pitch)
        self.scale = float(scale)

    def apply(self, action: str) -> bool:
        if action == "yaw+":
            self.yaw += YAW_STEP
        elif action == "yaw-":
            self.yaw -= YAW_STEP
        elif action == "pitch+":
            self.pitch = min(self.pitch + PITCH_STEP, PITCH_LIMIT)
        elif action == "pitch-":
            self.pitch = max(self.pitch - PITCH_STEP, -PITCH_LIMIT)
        elif action == "zoom_in":
            self.scale *= ZOOM_STEP
        elif action == "zoom_out":
            self.scale /= ZOOM_STEP
        else:
            return False
        return True

    def drag(self, dx: float, dy: float) -> bool:
        """Mouse-drag orbit: dx pixels -> yaw, dy pixels -> pitch
        (dragging up looks up, matching the arrow-key directions)."""
        if dx == 0 and dy == 0:
            return False
        self.yaw += dx * DRAG_SCALE
        self.pitch = min(max(self.pitch + dy * DRAG_SCALE, -PITCH_LIMIT),
                         PITCH_LIMIT)
        return True

    def wheel(self, steps: float) -> bool:
        """Mouse-wheel dolly: positive steps (wheel up) zoom in."""
        if steps == 0:
            return False
        self.scale *= ZOOM_STEP ** steps
        return True

    def camera(self):
        return orbit_camera(self.target, self.yaw, self.pitch, self.scale)


class PygamePreview:
    """Live preview window (pygame).  `poll()` pumps events and returns
    'quit', 'camera' (rig changed) or None; `show(img_u8)` refreshes."""

    def __init__(self, rig: OrbitRig, width: int, height: int,
                 title: str = "ti_raytrace_tpu"):
        import pygame

        self._pg = pygame
        self.rig = rig
        self.title = title
        self._dragging = False
        pygame.display.init()
        self.screen = pygame.display.set_mode((width, height))
        pygame.display.set_caption(title)
        self.keymap = {
            pygame.K_LEFT: "yaw-",
            pygame.K_RIGHT: "yaw+",
            pygame.K_UP: "pitch+",
            pygame.K_DOWN: "pitch-",
            pygame.K_PLUS: "zoom_in",
            pygame.K_EQUALS: "zoom_in",
            pygame.K_MINUS: "zoom_out",
        }

    def poll(self):
        pg = self._pg
        changed = False
        for ev in pg.event.get():
            if ev.type == pg.QUIT:
                return "quit"
            if ev.type == pg.KEYDOWN:
                if ev.key in (pg.K_q, pg.K_ESCAPE):
                    return "quit"
                action = self.keymap.get(ev.key)
                if action is not None:
                    changed |= self.rig.apply(action)
            elif ev.type == pg.MOUSEBUTTONDOWN and ev.button == 1:
                self._dragging = True
            elif ev.type == pg.MOUSEBUTTONUP and ev.button == 1:
                self._dragging = False
            elif ev.type == pg.MOUSEMOTION and self._dragging:
                dx, dy = ev.rel
                changed |= self.rig.drag(dx, dy)
            elif ev.type == pg.MOUSEWHEEL:
                changed |= self.rig.wheel(ev.y)
        return "camera" if changed else None

    def set_hud(self, frame: int, total: int, fps: float) -> None:
        """Progress + rate readout in the title bar (the reference's GUI
        loop shows per-frame progress implicitly, Example.py:38-59)."""
        self._pg.display.set_caption(
            f"{self.title} — {frame}/{total} spp  {fps:.1f} fps"
        )

    def show(self, img_u8: np.ndarray) -> None:
        """img_u8: (W, H, 3) uint8 in the film's row-major layout."""
        pg = self._pg
        # film images are (x, y, 3) with y down; pygame surfarray expects
        # (x, y) too — flip y so up is up
        surf = pg.surfarray.make_surface(img_u8[:, ::-1, :])
        self.screen.blit(surf, (0, 0))
        pg.display.flip()

    def close(self) -> None:
        self._pg.display.quit()
