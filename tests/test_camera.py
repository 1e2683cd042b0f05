"""Thin-lens camera tests (src/core/camera.hpp:10-165)."""

import numpy as np
import jax.numpy as jnp

from yart_tpu.config import CameraConfig
from yart_tpu.render.camera import build_camera, generate_rays


def _rays(cfg, n=256, film=0.5, lens=None):
    cam = build_camera(cfg)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.integers(0, cfg.image_size[0], n), jnp.int32)
    py = jnp.asarray(rng.integers(0, cfg.image_size[1], n), jnp.int32)
    u_film = jnp.full((n, 2), film, jnp.float32)
    u_lens = (
        jnp.asarray(rng.uniform(size=(n, 2)), jnp.float32)
        if lens is None
        else jnp.full((n, 2), lens, jnp.float32)
    )
    return cam, generate_rays(cam, px, py, u_film, u_lens)


def test_pinhole_origin_fixed():
    cfg = CameraConfig(image_size=(64, 64), f_number=0.0,
                       position=(1, 2, 3), forward=(0, 0, -1))
    cam, (o, d) = _rays(cfg)
    np.testing.assert_allclose(np.asarray(o), np.tile([1.0, 2.0, 3.0], (256, 1)), atol=1e-6)
    n = np.linalg.norm(np.asarray(d), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)


def test_dof_spreads_origins():
    cfg = CameraConfig(image_size=(64, 64), focal_length=50.0, f_number=1.4,
                       position=(0, 0, 0), forward=(0, 0, -2))
    cam, (o, d) = _rays(cfg)
    o = np.asarray(o)
    # aperture radius = (f/2000)/N (camera.hpp:57-59)
    r_expect = (50.0 / 2000.0) / 1.4
    radii = np.linalg.norm(o[:, :2], axis=-1)
    assert radii.max() <= r_expect + 1e-5
    assert radii.max() > 0.5 * r_expect  # lens actually sampled
    assert radii.std() > 0.0


def test_focus_plane_sharp():
    """Points on the focus plane project to the same film point regardless of
    lens position (image plane placed AT the focus plane, camera.hpp:41-44)."""
    cfg = CameraConfig(image_size=(65, 65), focal_length=50.0, f_number=2.0,
                       position=(0, 0, 0), forward=(0, 0, -2))
    cam = build_camera(cfg)
    n = 64
    px = jnp.full((n,), 32, jnp.int32)
    py = jnp.full((n,), 32, jnp.int32)
    u_film = jnp.full((n, 2), 0.5, jnp.float32)
    rng = np.random.default_rng(1)
    u_lens = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float32)
    o, d = generate_rays(cam, px, py, u_film, u_lens)
    o = np.asarray(o); d = np.asarray(d)
    # intersect rays with the focus plane z = -2
    t = (-2.0 - o[:, 2]) / d[:, 2]
    pts = o + t[:, None] * d
    assert pts.std(axis=0).max() < 1e-5, pts.std(axis=0)


def test_bladed_aperture():
    cfg = CameraConfig(image_size=(64, 64), focal_length=50.0, f_number=1.0,
                       aperture_sides=6, position=(0, 0, 0), forward=(0, 0, -2))
    cam, (o, d) = _rays(cfg, n=4096)
    o = np.asarray(o)
    radii = np.linalg.norm(o[:, :2], axis=-1) / ((50.0 / 2000.0) / 1.0)
    # hexagon: inner radius cos(pi/6) ~ 0.866; corners reach ~1
    assert radii.max() <= 1.0 + 1e-4
    assert radii.max() > 0.95
    # a circle would fill radius ~1 uniformly in all directions; a hexagon has
    # measure-zero mass beyond the inradius in flat-side directions.
    ang = np.arctan2(o[:, 1], o[:, 0])
    flat_dir = np.abs(np.mod(ang + np.pi / 6, np.pi / 3) - np.pi / 6) < 0.05
    assert radii[flat_dir].max() <= np.cos(np.pi / 6) + 0.08


def test_exposure_scale():
    cfg = CameraConfig(image_size=(8, 8), exposure=2.0)
    cam = build_camera(cfg)
    np.testing.assert_allclose(float(cam.exposure_scale), 4.0)
