"""Matched-seed LCG parity as a committed regression gate (VERDICT r3 #4b).

tools/matched_seed.py proved whole-pixel parity against the LIVE
reference binary: with the bit-exact ``ReferenceLCG`` seeded 0 and the
reference's exact draw order, draw-free pixels (sky / glass / emissive
core — only the two per-sample jitter draws touch the LCG) match the
C++ values to ≤ 3.3e-5 with EXACT per-pixel draw counts
(/root/reference/include/path-trace.h:21-56 stream semantics,
test.cpp:503 corner-first block order).  That harness needs a
hand-patched reference build, so the measured reference pixel values are
PINNED here and the oracle side replays against them in the routine
suite — a drift in the LCG, the oracle recursion, the RGBE codec, or
the procedural probe now fails a committed test instead of a manual
tool (the draw-free expectations below are the 2026-08 run of
tools/matched_seed.py, BASELINE.md "Matched-seed LCG parity").

The fan-out pixel (1.1M draws through the 10000-child scatter
recursion) stays in the manual tool: its Python replay costs minutes,
and its 1.7% residual is an f64-vs-f32 decision-flip bound, not a
regression-stable value.
"""

import numpy as np
import pytest

import oracle
from ptx.core.rng import ReferenceLCG
from ptx.io import hdr

# (x, y, label, reference RGB measured from the patched live binary,
#  reference per-pixel draw count) — rayCount=4, depth 16, seed 0
PINNED = [
    (64, 64, "sky", (0.36709, 0.555879, 0.818086), 8),
    (1600, 200, "sky2", (0.374082, 0.562871, 0.821582), 8),
    (1230, 540, "bulb-core", (1.8, 1.8, 1.8), 8),
    (1100, 500, "bulb-glass", (0.395059, 0.594336, 0.846055), 8),
    (1176, 486, "bulb-mixed", (0.226045, 0.340076, 0.479841), 8),
]

REL_TOL = 1e-3        # measured residual ≤ 3.3e-5 (C++ FMA vs numpy f32)


@pytest.fixture(scope="module")
def probe_image(tmp_path_factory):
    """The regenerated demo probe EXACTLY as the reference consumes it:
    procedural_sky_image round-tripped through the RGBE codec (the
    reference decodes the .hdr file, so texels carry RGBE quantization —
    skipping the round-trip desyncs every sky texel)."""
    from ptx.scenes.builders import procedural_sky_image
    path = tmp_path_factory.mktemp("probe") / "probe.hdr"
    hdr.write(str(path), procedural_sky_image(1536, 3072)[..., :3])
    return np.asarray(hdr.read(str(path)), np.float32)


@pytest.fixture(scope="module")
def world(probe_image):
    from tools.matched_seed import make_world_oracle
    return make_world_oracle(probe_image)


@pytest.mark.parametrize("px,py,label,ref_rgb,ref_draws",
                         PINNED, ids=[p[2] for p in PINNED])
def test_matched_seed_draw_free_pixel(world, px, py, label, ref_rgb,
                                      ref_draws):
    from tools.matched_seed import MatchedRNG, matched_pixel
    rng = MatchedRNG(0)
    ours = matched_pixel(world, px, py, rng)
    ref = np.asarray(ref_rgb, np.float32)
    rel = float(np.max(np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-6)))
    assert rng.draws == ref_draws, (
        f"{label}: LCG stream desync — {rng.draws} draws vs the "
        f"reference's {ref_draws}")
    assert rel <= REL_TOL, (
        f"{label}: pixel value drifted {rel:.2e} from the pinned "
        f"reference value {ref_rgb} (got {tuple(float(v) for v in ours)})")
