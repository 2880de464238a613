"""The shipped examples must actually run and do what they claim —
examples are product surface (the first thing a new user executes)."""

import os
import re
import sys

import pytest


def test_inverse_render_example_converges(monkeypatch, capsys):
    """examples/inverse_render.py: a short optimization run must shrink
    the sphere-radius error — gradients flowing end-to-end through the
    integrator into an optax loop, at example-surface level."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "examples"))
    try:
        import inverse_render
    finally:
        sys.path.pop(0)
    monkeypatch.setattr(sys, "argv", [
        "inverse_render.py", "--steps", "16", "--size", "24", "--spp", "4"])
    inverse_render.main()
    out = capsys.readouterr().out
    target = float(re.search(r"target radius=([\d.]+)", out).group(1))
    start = float(re.search(r"start=([\d.]+)", out).group(1))
    final = float(re.search(r"radius error ([\d.]+)", out).group(1))
    assert final < 0.5 * abs(start - target), out
