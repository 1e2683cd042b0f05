import jax.numpy as jnp
import numpy as np

from yart_tpu.ops import distribution as dist


def test_build_normalizes():
    f = np.asarray([[1.0, 3.0], [2.0, 2.0]])
    d = dist.build_dist2d(f)
    np.testing.assert_allclose(float(d.integral), f.mean(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d.cond_cdf)[:, -1], 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(d.marg_cdf[-1]), 1.0, rtol=1e-6)


def test_zero_rows_fall_back_to_uniform():
    f = np.zeros((4, 4))
    d = dist.build_dist2d(f)
    u = jnp.asarray(np.random.default_rng(0).random((256, 2), np.float32))
    uv, pdf = dist.sample_dist2d(d, u)
    uv = np.asarray(uv)
    assert np.all((uv >= 0) & (uv <= 1))


def test_sample_pdf_consistency():
    """pdf returned by sample must match pdf_dist2d at the sampled location."""
    rng = np.random.default_rng(1)
    f = rng.random((16, 32)) ** 2 + 0.01
    d = dist.build_dist2d(f)
    u = jnp.asarray(rng.random((4096, 2), np.float32))
    uv, pdf = dist.sample_dist2d(d, u)
    pdf2 = dist.pdf_dist2d(d, uv)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=2e-3, atol=1e-4)


def test_importance_sampling_estimates_integral():
    """MC estimate of ∫g with samples from the distribution of g is exact-ish
    when g is the table itself: E[g/pdf] = integral."""
    rng = np.random.default_rng(2)
    f = rng.random((8, 8)) + 0.1
    d = dist.build_dist2d(f)
    u = jnp.asarray(rng.random((1 << 15, 2), np.float32))
    uv, pdf = dist.sample_dist2d(d, u)
    # g at sampled point (piecewise-constant lookup)
    g = np.asarray(dist.pdf_dist2d(d, uv)) * float(d.integral)
    est = (g / np.maximum(np.asarray(pdf), 1e-9)).mean()
    np.testing.assert_allclose(est, f.mean(), rtol=2e-2)


def test_histogram_matches_density():
    rng = np.random.default_rng(3)
    f = np.asarray([[1.0, 0.0], [0.0, 3.0]])
    d = dist.build_dist2d(f)
    u = jnp.asarray(rng.random((1 << 15, 2), np.float32))
    uv, _ = dist.sample_dist2d(d, u)
    uv = np.asarray(uv)
    q11 = ((uv[:, 0] < 0.5) & (uv[:, 1] < 0.5)).mean()
    q22 = ((uv[:, 0] >= 0.5) & (uv[:, 1] >= 0.5)).mean()
    np.testing.assert_allclose(q11, 0.25, atol=2e-2)
    np.testing.assert_allclose(q22, 0.75, atol=2e-2)
    assert ((uv[:, 0] >= 0.5) & (uv[:, 1] < 0.5)).mean() < 1e-3
