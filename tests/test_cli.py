"""CLI smoke tests (tpu_pathtracer.cli) — the batch render surface.

The reference's only "batch" surface is its GLUT window loop
(main.cpp:205-232); the CLI is this framework's headless equivalent.
These run on the CPU suite: cli.main no longer sets the process-wide
persistent compile cache on CPU (that config once poisoned the rest of
a pytest run — see the note in cli.cmd_render), so the CLI is safe to
invoke in-process here.
"""
from __future__ import annotations

import json

import numpy as np

from tpu_pathtracer import cli


def _read_png_size(path):
    data = path.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w = int.from_bytes(data[16:20], "big")
    h = int.from_bytes(data[20:24], "big")
    return w, h


def test_render_builtin_scene(tmp_path):
    out = tmp_path / "cornell.png"
    hdr = tmp_path / "cornell.npy"
    rc = cli.main([
        "render", "--scene", "cornell", "--size", "32x24", "--spp", "4",
        "--bounces", "4", "--iterations", "2", "--backend", "xla",
        "-o", str(out), "--hdr-output", str(hdr), "-q",
    ])
    assert rc == 0
    assert _read_png_size(out) == (32, 24)
    lin = np.load(hdr)
    assert lin.shape == (24, 32, 3)
    assert np.isfinite(lin).all() and lin.max() > 0


def test_render_json_scene_with_nee(tmp_path):
    scene = {
        "camera": {"eye": [0, 2, 8], "look_at": [0, 0, 0], "up": [0, 1, 0],
                   "fov": 60.0},
        "materials": [{"type": "diffuse", "color": [0.7, 0.7, 0.7]}],
        "spheres": [{"center": [0, -1e4 - 1, 0], "radius": 1e4,
                     "material": 0}],
        "lights": [{"type": "point", "pos": [0, 3, 0],
                    "intensity": [30, 30, 30]}],
    }
    sf = tmp_path / "scene.json"
    sf.write_text(json.dumps(scene))
    out = tmp_path / "out.png"
    rc = cli.main([
        "render", "--scene", str(sf), "--size", "16x12", "--spp", "4",
        "--bounces", "3", "--iterations", "1", "--nee", "--backend", "xla",
        "-o", str(out), "-q",
    ])
    assert rc == 0
    assert _read_png_size(out) == (16, 12)


def test_invert_kernel_estimator_smoke():
    """CLI inverse-rendering demo through the fused-kernel estimator
    (interpret mode on CPU): runs, prints, loss path finite."""
    rc = cli.main([
        "invert", "--size", "12x8", "--spp", "2", "--steps", "2",
        "--estimator", "kernel",
    ])
    assert rc == 0
