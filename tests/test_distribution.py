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


def _alias_rows(w):
    prob, alias, pdf = dist.build_alias(w)
    return jnp.asarray(np.stack(
        [prob, alias.view(np.float32), pdf, pdf[alias]], axis=1
    ).astype(np.float32))


def test_alias_frequencies_match_weights():
    """Walker alias sampling reproduces the target distribution and returns
    its exact realized pdf (the production env-sampling path)."""
    rng = np.random.default_rng(9)
    w = rng.random(64) ** 3  # spiky
    rows = _alias_rows(w)
    u = jnp.asarray(rng.random(1 << 17, dtype=np.float64).astype(np.float32))
    cell, pdf, r = dist.sample_alias_rows(rows, u)
    cell = np.asarray(cell)
    hist = np.bincount(cell, minlength=64) / cell.shape[0]
    target = w / w.sum()
    np.testing.assert_allclose(hist, target, atol=4e-3)
    # pdf is exactly the cell's density (value / mean)
    np.testing.assert_allclose(
        np.asarray(pdf), (w * 64 / w.sum())[cell], rtol=1e-5
    )
    # leftover entropy is uniform in [0, 1)
    r = np.asarray(r)
    assert 0.0 <= r.min() and r.max() < 1.0
    np.testing.assert_allclose(r.mean(), 0.5, atol=5e-3)
    np.testing.assert_allclose(r.std(), 12 ** -0.5, atol=5e-3)


def test_alias_importance_estimates_integral():
    """E[f(cell)/pdf(cell)] == mean(f) for alias draws (unbiasedness of the
    env NEE estimator under the alias sampler)."""
    rng = np.random.default_rng(10)
    w = rng.random(128) + 0.05
    f = rng.random(128)
    rows = _alias_rows(w)
    u = jnp.asarray(rng.random(1 << 17, dtype=np.float64).astype(np.float32))
    cell, pdf, _ = dist.sample_alias_rows(rows, u)
    est = (f[np.asarray(cell)] / np.asarray(pdf)).mean()
    np.testing.assert_allclose(est, f.mean(), rtol=1e-2)


def test_alias_zero_weights_never_sampled():
    w = np.asarray([0.0, 1.0, 0.0, 2.0])
    rows = _alias_rows(w)
    u = jnp.asarray(np.random.default_rng(11).random(4096, np.float32))
    cell, pdf, _ = dist.sample_alias_rows(rows, u)
    cell = np.asarray(cell)
    assert set(np.unique(cell)) <= {1, 3}
    assert (np.asarray(pdf) > 0).all()
