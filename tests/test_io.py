"""Image IO round-trips: RGBE HDR codec, PNG codec, BMP writer.

Golden checks decode the reference repo's committed assets
(``/root/reference/test.hdr``, ``test2.hdr``, ``sky01/*.png``,
``image53424F01.hdr``) when present — pure data, no code involved.
"""

import os

import numpy as np
import pytest

from ptx.io import bmp, hdr, image, png

REF = "/root/reference"


def test_rgbe_scalar_roundtrip():
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 1, (17, 23, 3)) ** 2 * 50.0).astype(np.float32)
    img[0, 0] = 0.0                      # dark pixel → 0,0,0,0 encoding
    rgbe = hdr.float_to_rgbe(img)
    back = hdr.rgbe_to_float(rgbe)
    # shared-exponent quantization: mantissa floor'ed at 8 bits — error is
    # bounded by one mantissa step of the per-pixel max channel
    assert np.all(back[..., :3] <= img + 1e-6)
    maxc = img.max(axis=-1, keepdims=True)
    step = maxc / 128.0
    assert np.all(img - back[..., :3] <= step + 1e-6)


def test_hdr_file_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = (rng.uniform(0, 1, (9, 33, 3)) * 10).astype(np.float32)
    img[:, 5:12] = 3.25                  # constant run exercises RLE
    p = tmp_path / "t.hdr"
    hdr.write(p, img)
    back = hdr.read(p)
    want = hdr.rgbe_to_float(hdr.float_to_rgbe(img))
    np.testing.assert_array_equal(back, want)


def test_hdr_write_read_stability(tmp_path):
    """encode→decode→encode is a fixed point (codec self-consistency)."""
    rng = np.random.default_rng(2)
    img = (rng.uniform(0, 1, (7, 19, 3)) * 100).astype(np.float32)
    p1, p2 = tmp_path / "a.hdr", tmp_path / "b.hdr"
    hdr.write(p1, img)
    once = hdr.read(p1)
    hdr.write(p2, once)
    twice = hdr.read(p2)
    np.testing.assert_array_equal(once, twice)


@pytest.mark.skipif(not os.path.exists(f"{REF}/test2.hdr"),
                    reason="reference assets unavailable")
def test_reference_hdr_assets_decode():
    img = hdr.read(f"{REF}/test2.hdr")
    assert img.shape == (480, 640, 4)
    assert np.isfinite(img).all() and img[..., :3].max() > 1.0  # HDR range
    img1 = hdr.read(f"{REF}/test.hdr")
    assert img1.shape[1] == 1280
    assert np.isfinite(img1).all()


@pytest.mark.skipif(not os.path.exists(f"{REF}/image53424F01.hdr"),
                    reason="reference assets unavailable")
def test_reference_written_hdr_roundtrips_bit_exact(tmp_path):
    """The reference's own writer output must survive our decode→encode
    cycle losslessly (same 179·2^(e−8) convention)."""
    img = hdr.read(f"{REF}/image53424F01.hdr")
    p = tmp_path / "re.hdr"
    hdr.write(p, img)
    back = hdr.read(p)
    np.testing.assert_array_equal(img, back)


def test_png_roundtrip_own_codec(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (21, 13, 4), dtype=np.uint8)
    p = tmp_path / "t.png"
    png.write(p, img)
    back = png.decode(open(p, "rb").read())   # force own decoder
    np.testing.assert_array_equal(back, img)


def test_png_rgb_gets_opaque_alpha(tmp_path):
    img = np.zeros((4, 5, 3), np.uint8) + 17
    p = tmp_path / "t.png"
    png.write(p, img)
    back = png.decode(open(p, "rb").read())
    assert back.shape == (4, 5, 4)
    assert (back[..., 3] == 255).all()


@pytest.mark.skipif(not os.path.exists(f"{REF}/sky01/top.png"),
                    reason="reference assets unavailable")
def test_reference_skybox_png_decodes():
    img = png.read(f"{REF}/sky01/top.png")
    assert img.shape == (877, 877, 4)
    own = png.decode(open(f"{REF}/sky01/top.png", "rb").read())
    np.testing.assert_array_equal(own, img)   # own decoder == Pillow


def test_bmp_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    p = tmp_path / "t.bmp"
    bmp.write(p, img)
    np.testing.assert_array_equal(bmp.read(p), img)


def test_image_dispatch(tmp_path):
    img = np.zeros((3, 4, 3), np.float32) + 0.5
    image.save(tmp_path / "x.hdr", img)
    out = image.load(tmp_path / "x.hdr")
    assert out.shape == (3, 4, 4)
    with pytest.raises(ValueError):
        image.load(tmp_path / "x.xyz")
