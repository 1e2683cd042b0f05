"""Image-level parity vs the reference oracle.

tests/goldens/oracle_images.npz holds full 16x16 HDR renders produced by the
REFERENCE's own integrators (tools/oracle/make_goldens.py: patched-copy build
of /root/reference with a mean estimator) at 8192 spp. Here the same scenes
render through yart_tpu and must agree per pixel within a computed noise
bound — not just in aggregate means (the round-1 gap: quadrant means only).

Noise model: both sides are Monte Carlo with independent sample streams, so
|a - b| per pixel is bounded by k * (sigma_a + sigma_b). The per-pixel
sample variance of the yart render is measured directly from its own
samples; the oracle term scales that by sqrt(spp_test / spp_oracle).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yart_tpu.config import CameraConfig, RenderConfig
from yart_tpu.ops.qmc import make_sampler
from yart_tpu.render.camera import build_camera
from yart_tpu.render.integrator import render_wave
from yart_tpu.scene.procedural import cornell_box, furnace

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "oracle_images.npz")
RES = 16
SPP = 512


@pytest.fixture(scope="module")
def oracle():
    if not os.path.exists(GOLDENS):
        pytest.skip("oracle_images.npz not generated")
    return np.load(GOLDENS)


def _render(scene, meta, cam_cfg, spp=SPP, mis=True):
    """Render RES x RES, returning (mean image, per-pixel sample std)."""
    cam = build_camera(cam_cfg)
    cfg = RenderConfig(
        samples=spp, max_depth=30, integrator="mis" if mis else "naive"
    )
    sampler = make_sampler(cfg.sampler, cfg.samples, (RES, RES), cfg.seed)
    yy, xx = np.meshgrid(np.arange(RES), np.arange(RES), indexing="ij")
    img = np.zeros((RES * RES, 3), np.float64)
    m2 = np.zeros((RES * RES, 3), np.float64)
    chunk = 64  # samples per pass (memory-bounded)
    fn = jax.jit(
        lambda scene, px, py, sidx: render_wave(
            scene, meta, cam, sampler, cfg, px, py, sidx
        )
    )
    px = jnp.asarray(np.repeat(xx.reshape(-1), chunk), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), chunk), jnp.int32)
    for base in range(0, spp, chunk):
        sidx = jnp.asarray(
            np.tile(np.arange(chunk) + base, RES * RES), jnp.uint32
        )
        rad, _ = fn(scene, px, py, sidx)
        r = np.asarray(rad, np.float64).reshape(RES * RES, chunk, 3)
        img += r.sum(axis=1)
        m2 += (r ** 2).sum(axis=1)
    mean = img / spp
    var = np.maximum(m2 / spp - mean ** 2, 0.0)
    std_of_mean = np.sqrt(var / spp)
    return mean.reshape(RES, RES, 3), std_of_mean.reshape(RES, RES, 3)


def _assert_image_parity(ours, std, ref, spp_ref, label, k=5.0, floor=2e-3):
    # Oracle noise approximated from ours scaled to its spp.
    std_ref = std * np.sqrt(SPP / spp_ref)
    bound = k * (std + std_ref) + floor
    delta = np.abs(ours - ref)
    bad = delta > bound
    frac_bad = bad.mean()
    assert frac_bad < 0.01, (
        f"{label}: {frac_bad:.1%} of channels outside the {k}-sigma bound; "
        f"worst delta {delta.max():.4f} vs bound {bound[bad].min() if bad.any() else 0:.4f}"
    )
    # Whole-image mean must agree much tighter than any pixel.
    mean_tol = k * float(np.mean(std)) / RES + 1e-3
    assert abs(ours.mean() - ref.mean()) < max(mean_tol, 5e-3), (
        f"{label}: image means differ {ours.mean():.4f} vs {ref.mean():.4f}"
    )


def test_cornell_mis_image_parity(oracle):
    scene, meta = cornell_box(boxes=False).compile()
    cam = CameraConfig(
        image_size=(RES, RES), focal_length=28.0,
        position=(0, 1.0, 3.4), forward=(0, 0, -1),
    )
    ours, std = _render(scene, meta, cam, mis=True)
    _assert_image_parity(
        ours, std, oracle["cornell_mis"], int(oracle["spp"]), "cornell mis"
    )


def test_cornell_naive_image_parity(oracle):
    scene, meta = cornell_box(boxes=False).compile()
    cam = CameraConfig(
        image_size=(RES, RES), focal_length=28.0,
        position=(0, 1.0, 3.4), forward=(0, 0, -1),
    )
    ours, std = _render(scene, meta, cam, mis=False)
    _assert_image_parity(
        ours, std, oracle["cornell_naive"], int(oracle["spp"]), "cornell naive"
    )


def test_furnace_naive_image_parity(oracle):
    scene, meta = furnace(env_value=0.5).compile()
    cam = CameraConfig(
        image_size=(RES, RES), focal_length=30.0,
        position=(0, 0, 3.5), forward=(0, 0, -3.5),
    )
    ours, std = _render(scene, meta, cam, mis=False)
    _assert_image_parity(
        ours, std, oracle["furnace_naive"], int(oracle["spp"]), "furnace naive"
    )


def test_furnace_mis_image_parity(oracle):
    scene, meta = furnace(env_value=0.5).compile()
    cam = CameraConfig(
        image_size=(RES, RES), focal_length=30.0,
        position=(0, 0, 3.5), forward=(0, 0, -3.5),
    )
    ours, std = _render(scene, meta, cam, mis=True)
    _assert_image_parity(
        ours, std, oracle["furnace_mis"], int(oracle["spp"]), "furnace mis"
    )
