"""Interactive progressive viewer in the terminal.

The TPU-native analogue of the reference's app layer: GLUT window +
per-frame progressive display (reference main.cpp:205-232) and its input
handling (main.cpp:238-364). The GL pixel-buffer blit becomes ANSI
truecolor half-block rendering; the input map is:

  arrows        rotate          (reference PressKey arrows)
  w/a/s/d/q/e   translate forward/left/back/right/down/up
                (reference Ctrl+arrows; Shift = 10x there, '+'-speed here)
  [ ]           translate speed down/up
  r             reset accumulation     (reference Keyboard 'r')
  p             save PNG snapshot
  ESC / Ctrl-C  quit                   (reference Keyboard 27)

Camera motion resets accumulation exactly like the reference
(main.cpp:209 -> Pathtracer::Reset).
"""
from __future__ import annotations

import os
import select
import sys
import time

import numpy as np

# Reference globals.h:53-54
CAM_TRANSLATE_DELTA = 1.0
CAM_ROTATE_DELTA = 0.05


def _halfblock_frame(rgb8: np.ndarray) -> str:
    """Render (H, W, 3) uint8 as ANSI truecolor half-blocks (2 rows/char)."""
    h, w, _ = rgb8.shape
    if h % 2:
        rgb8 = rgb8[:-1]
        h -= 1
    top = rgb8[0::2]
    bot = rgb8[1::2]
    lines = []
    for y in range(h // 2):
        parts = []
        prev = None
        for x in range(w):
            tr, tg, tb = top[y, x]
            br, bg, bb = bot[y, x]
            key = (tr, tg, tb, br, bg, bb)
            if key != prev:
                parts.append(f"\x1b[38;2;{tr};{tg};{tb}m\x1b[48;2;{br};{bg};{bb}m")
                prev = key
            parts.append("▀")
        parts.append("\x1b[0m")
        lines.append("".join(parts))
    return "\n".join(lines)


def _downsample(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Box-average an (H, W, 3) image to at most (th, tw)."""
    h, w, _ = img.shape
    fy = max(1, h // th)
    fx = max(1, w // tw)
    hh = (h // fy) * fy
    ww = (w // fx) * fx
    return (
        img[:hh, :ww]
        .reshape(hh // fy, fy, ww // fx, fx, 3)
        .mean(axis=(1, 3))
    )


class _RawInput:
    """Non-blocking raw keyboard reads (the GLUT callback substitute)."""

    def __enter__(self):
        self.enabled = sys.stdin.isatty()
        if self.enabled:
            import termios
            import tty

            self.fd = sys.stdin.fileno()
            self.old = termios.tcgetattr(self.fd)
            tty.setcbreak(self.fd)
        return self

    def __exit__(self, *exc):
        if self.enabled:
            import termios

            termios.tcsetattr(self.fd, termios.TCSADRAIN, self.old)
        return False

    def poll(self) -> str | None:
        if not self.enabled:
            return None
        if select.select([sys.stdin], [], [], 0)[0]:
            ch = sys.stdin.read(1)
            if ch == "\x1b":  # possible arrow escape
                if select.select([sys.stdin], [], [], 0.01)[0]:
                    seq = sys.stdin.read(2)
                    return {"[A": "UP", "[B": "DOWN", "[C": "RIGHT",
                            "[D": "LEFT"}.get(seq, None)
                return "ESC"
            return ch
        return None


def run_viewer(
    scene,
    camera,
    config,
    seed: int = 0,
    max_frames: int | None = None,
    interactive: bool = True,
    out=sys.stdout,
    snapshot_path: str = "snapshot.png",
) -> int:
    """Main loop. Returns the number of frames rendered.

    max_frames + interactive=False gives a scriptable smoke mode (used by
    tests and headless checks).
    """
    from tpu_pathtracer.io.image import save_png, tonemap
    from tpu_pathtracer.models import camera as cm
    from tpu_pathtracer.models.progressive import ProgressiveRenderer
    from tpu_pathtracer.utils.metrics import RenderMeter

    r = ProgressiveRenderer(scene, camera, config, seed=seed)
    meter = RenderMeter(camera.width * camera.height * config.spp)
    speed = CAM_TRANSLATE_DELTA
    frames = 0

    try:
        cols, rows = os.get_terminal_size()
    except OSError:
        cols, rows = 80, 24
    tw = max(16, min(cols - 1, 160))
    th = max(16, (rows - 2) * 2)

    def redraw():
        img = np.array(r.image())
        small = _downsample(img, tw, th)
        frame = _halfblock_frame(tonemap(small))
        out.write("\x1b[H" + frame + "\x1b[0m\n")
        out.write(
            f"\x1b[K[{meter.status(r.iteration)}]  "
            "arrows:rotate wasdqe:move r:reset p:png ESC:quit\r"
        )
        out.flush()

    with _RawInput() as kb:
        if interactive:
            out.write("\x1b[2J")  # clear
        while True:
            t0 = time.perf_counter()
            r.step()
            r.state.radiance_sum.block_until_ready()
            meter.update(time.perf_counter() - t0, None)
            frames += 1
            if interactive:
                redraw()
            if max_frames is not None and frames >= max_frames:
                break

            key = kb.poll() if interactive else None
            if key is None:
                continue
            cam2 = None
            if key == "ESC":
                break
            elif key == "r":
                r.state = __import__(
                    "tpu_pathtracer.models.progressive", fromlist=["reset"]
                ).reset(r.state)
            elif key == "p":
                save_png(snapshot_path, np.array(r.image()))
            elif key in ("UP", "DOWN", "LEFT", "RIGHT"):
                d = CAM_ROTATE_DELTA
                theta = {
                    "UP": [0.0, d], "DOWN": [0.0, -d],
                    "LEFT": [-d, 0.0], "RIGHT": [d, 0.0],
                }[key]
                cam2 = cm.rotate(r.camera, theta)
            elif key in "wasdqe":
                v = {
                    "w": [0, 0, speed], "s": [0, 0, -speed],
                    "a": [-speed, 0, 0], "d": [speed, 0, 0],
                    "q": [0, -speed, 0], "e": [0, speed, 0],
                }[key]
                cam2 = cm.translate(r.camera, v)
            elif key == "[":
                speed = max(speed / 2, 1e-3)
            elif key == "]":
                speed = speed * 2
            if cam2 is not None:
                r.update_camera(cam2)  # resets accumulation (main.cpp:209)
    return frames
