"""CLI end-to-end smoke tests (reference main() successor, test.cpp:800+):
render to BMP+HDR, checkpoint/resume, scene-spec input."""

import json
import os

import numpy as np
import pytest

from ptx import cli
from ptx.io import bmp, hdr


def test_render_demo_writes_outputs(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    cli.main(["render", "--demo", "config1", "--width", "16", "--height",
              "12", "--spp", "2", "--depth", "2", "--out",
              str(tmp_path / "out")])
    img_bmp = bmp.read(tmp_path / "out.bmp")
    assert img_bmp.shape == (12, 16, 3)
    img_hdr = hdr.read(tmp_path / "out.hdr")
    assert img_hdr.shape == (12, 16, 4)
    assert np.isfinite(img_hdr).all() and img_hdr[..., :3].mean() > 0.001

    # structured observability: JSON-line events on stderr (SURVEY §5.5)
    events = [json.loads(l) for l in capsys.readouterr().err.splitlines()
              if l.startswith("{")]
    names = [e["event"] for e in events]
    assert "render_start" in names and "render_done" in names
    done = next(e for e in events if e["event"] == "render_done")
    assert done["rays_per_sec"] > 0
    meter = next(e for e in events if e["event"] == "render")
    assert meter["rays"] == 16 * 12 * 2 * 3      # W·H·spp·(depth+1)


def test_render_checkpoint_resume(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    ckpt = str(tmp_path / "acc.npz")
    cli.main(["render", "--demo", "config1", "--width", "8", "--height", "8",
              "--spp", "2", "--depth", "2", "--checkpoint", ckpt,
              "--out", str(tmp_path / "a")])
    assert os.path.exists(ckpt)
    from ptx.parallel.checkpoint import RenderAccumulator
    acc = RenderAccumulator(8, 8, ckpt)
    assert acc.samples_done == 2
    # resume with a higher target: continues from sample 2
    cli.main(["render", "--demo", "config1", "--width", "8", "--height", "8",
              "--spp", "4", "--depth", "2", "--checkpoint", ckpt,
              "--out", str(tmp_path / "b")])
    acc = RenderAccumulator(8, 8, ckpt)
    assert acc.samples_done == 4


def test_render_scene_spec(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    doc = {
        "materials": {
            "d": {"reflect": 0.8, "scatter": 1.0},
            "sky": {"reflect": 0, "scatter": 0, "emissive": [0.5, 0.5, 0.9]},
        },
        "world": {"type": "union", "objects": [
            {"type": "sphere", "center": [0, 0, -4], "radius": 1.0,
             "material": "d"},
            *[{"type": "plane", "normal": n, "d": 100.0, "material": "sky"}
              for n in ([0, 0, -1], [0, 0, 1], [0, -1, 0], [0, 1, 0],
                        [1, 0, 0], [-1, 0, 0])],
        ]},
        "camera": {"width": 8, "height": 8},
        "render": {"spp": 2, "depth": 2},
    }
    spec = tmp_path / "scene.json"
    spec.write_text(json.dumps(doc))
    cli.main(["render", "--scene", str(spec), "--out", str(tmp_path / "s")])
    img = hdr.read(tmp_path / "s.hdr")
    assert img.shape == (8, 8, 4)
    assert img[..., :3].mean() > 0.01      # sky light reached the film
