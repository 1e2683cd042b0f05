"""Image IO round trips + HDRI conversion."""

import os

import numpy as np

from yart_tpu.io.image import load_hdr, save_hdr, write_png, write_ppm
from yart_tpu.tools.convert_hdri import equirect_to_octahedral


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 1, (17, 23, 3)) ** 2 * 50.0).astype(np.float32)
    p = str(tmp_path / "t.hdr")
    save_hdr(p, img)
    back = load_hdr(p)
    assert back.shape == img.shape
    # RGBE precision: mantissa step = 2^ceil(log2(maxchannel))/256 per pixel.
    maxc = np.maximum(img.max(axis=-1, keepdims=True), 1e-9)
    step = np.exp2(np.ceil(np.log2(maxc))) / 256.0
    assert np.all(np.abs(back - img) <= step + 1e-4)


def test_ppm_and_png(tmp_path):
    img = np.linspace(0, 1, 8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3)
    pp = str(tmp_path / "t.ppm")
    pg = str(tmp_path / "t.png")
    write_ppm(pp, img)
    write_png(pg, img)
    raw = open(pp, "rb").read()
    assert raw.startswith(b"P6\n8 8\n255\n")
    assert len(raw) == len(b"P6\n8 8\n255\n") + 8 * 8 * 3
    png = open(pg, "rb").read()
    assert png.startswith(b"\x89PNG")


def test_equirect_to_octahedral_constant():
    img = np.full((32, 64, 3), 2.5, np.float32)
    out = equirect_to_octahedral(img, 64)
    np.testing.assert_allclose(out, 2.5, rtol=1e-5)


def test_equirect_to_octahedral_updown():
    # Top hemisphere bright, bottom dark: octahedral center (up pole) bright,
    # corners (down pole) dark.
    img = np.zeros((64, 128, 3), np.float32)
    img[:32] = 4.0  # theta < pi/2 => y > 0
    out = equirect_to_octahedral(img, 64)
    assert out[32, 32, 0] > 3.0  # center = +y
    assert out[1, 1, 0] < 1.0  # corner = -y
    assert out[62, 62, 0] < 1.0
