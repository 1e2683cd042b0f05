"""Golden-image regression tests: fixed seed + spp renders must reproduce the
stored images exactly on CPU (SURVEY.md §4.3). Regenerate via
/tmp/e2e/gen_golden.py equivalent if an INTENTIONAL change shifts them —
never loosen tolerances to paper over a regression."""

import os

import numpy as np
import pytest

from yart_tpu.config import CameraConfig, RenderConfig
from yart_tpu.render.renderer import Renderer
from yart_tpu.scene.procedural import cornell_box, furnace

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "golden_v1.npz")


@pytest.fixture(scope="module")
def goldens():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden file not generated")
    return np.load(GOLDEN)


def test_cornell_mat_golden(goldens):
    scene, meta = cornell_box(extra_materials=True).compile()
    cam = CameraConfig(image_size=(16, 16), focal_length=28.0,
                       position=(0, 1.0, 3.4), forward=(0, 0, -1))
    cfg = RenderConfig(samples=16, max_depth=6, tonemap="none",
                       estimator="gmon", first_wave_samples=16,
                       max_wave_samples=16)
    img = Renderer(scene, meta, cam, cfg).render().hdr
    np.testing.assert_allclose(img, goldens["cornell_mat"], rtol=1e-4, atol=1e-5)


def test_cornell_mat_64_golden(goldens):
    if "cornell_mat_64" not in goldens:
        pytest.skip("v2 goldens not generated")
    scene, meta = cornell_box(extra_materials=True).compile()
    cam = CameraConfig(image_size=(64, 64), focal_length=28.0,
                       position=(0, 1.0, 3.4), forward=(0, 0, -1))
    cfg = RenderConfig(samples=16, max_depth=6, tonemap="none",
                       estimator="gmon", first_wave_samples=16,
                       max_wave_samples=16)
    img = Renderer(scene, meta, cam, cfg).render().hdr
    np.testing.assert_allclose(img, goldens["cornell_mat_64"],
                               rtol=1e-4, atol=1e-5)


def test_spheres_dof_golden(goldens):
    from yart_tpu.scene.procedural import material_test_spheres

    if "spheres_dof" not in goldens:
        pytest.skip("v2 goldens not generated")
    scene, meta = material_test_spheres().compile()
    cam = CameraConfig(image_size=(48, 48), focal_length=40.0, f_number=2.8,
                       position=(0, 2.2, 5.5), forward=(0, -1.8, -6.1),
                       aperture_sides=6)
    cfg = RenderConfig(samples=16, max_depth=6, tonemap="none",
                       estimator="mean", first_wave_samples=16,
                       max_wave_samples=16)
    img = Renderer(scene, meta, cam, cfg).render().hdr
    np.testing.assert_allclose(img, goldens["spheres_dof"],
                               rtol=1e-4, atol=1e-5)


def test_textured_golden(goldens):
    from yart_tpu.scene.procedural import textured_box_scene

    if "textured" not in goldens:
        pytest.skip("v2 goldens not generated")
    scene, meta = textured_box_scene().compile()
    cam = CameraConfig(image_size=(48, 48), focal_length=26.0,
                       position=(0, 1.6, 3.2), forward=(0, -0.9, -3.0))
    cfg = RenderConfig(samples=16, max_depth=5, tonemap="none",
                       estimator="mean", first_wave_samples=16,
                       max_wave_samples=16)
    img = Renderer(scene, meta, cam, cfg).render().hdr
    np.testing.assert_allclose(img, goldens["textured"],
                               rtol=1e-4, atol=1e-5)


def test_furnace_golden(goldens):
    scene, meta = furnace(env_value=0.5).compile()
    cam = CameraConfig(image_size=(16, 16), focal_length=30.0,
                       position=(0, 0, 3.5), forward=(0, 0, -3.5))
    cfg = RenderConfig(samples=16, max_depth=8, tonemap="none",
                       estimator="mean", first_wave_samples=16,
                       max_wave_samples=16)
    img = Renderer(scene, meta, cam, cfg).render().hdr
    np.testing.assert_allclose(img, goldens["furnace"], rtol=1e-4, atol=1e-5)
