"""End-to-end textured rendering: texture channels, alpha cutouts, NEE
transparent shadows (BASELINE.json config 3 class)."""

import numpy as np
import pytest

from yart_tpu.config import CameraConfig, RenderConfig
from yart_tpu.render.renderer import Renderer
from yart_tpu.scene.procedural import textured_box_scene


@pytest.fixture(scope="module")
def rendered():
    scene, meta = textured_box_scene().compile()
    assert meta.any_textures and meta.any_alpha and meta.any_transparent
    cam = CameraConfig(image_size=(32, 32), focal_length=26.0,
                       position=(0, 1.6, 3.2), forward=(0, -0.9, -3.0))
    cfg = RenderConfig(samples=24, max_depth=5, tonemap="none",
                       estimator="mean", first_wave_samples=24,
                       max_wave_samples=24)
    res = Renderer(scene, meta, cam, cfg).render()
    return res.hdr


def test_textured_finite_and_lit(rendered):
    assert np.isfinite(rendered).all()
    assert rendered.mean() > 0.005


def test_checker_visible(rendered):
    """The blue/red checker must produce channel variance on the floor."""
    floor = rendered[20:, :, :]  # bottom rows look at the floor
    # red and blue channels anti-correlated across checker tiles
    r = floor[..., 0].flatten()
    b = floor[..., 2].flatten()
    assert r.std() > 0.005 and b.std() > 0.005
    assert np.corrcoef(r, b)[0, 1] < 0.9


def test_determinism(rendered):
    scene, meta = textured_box_scene().compile()
    cam = CameraConfig(image_size=(32, 32), focal_length=26.0,
                       position=(0, 1.6, 3.2), forward=(0, -0.9, -3.0))
    cfg = RenderConfig(samples=24, max_depth=5, tonemap="none",
                       estimator="mean", first_wave_samples=24,
                       max_wave_samples=24)
    again = Renderer(scene, meta, cam, cfg).render().hdr
    np.testing.assert_array_equal(rendered, again)
