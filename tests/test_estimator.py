"""Estimator behavior on synthetic outlier streams (SURVEY.md §4.1)."""

import numpy as np
import jax.numpy as jnp

from yart_tpu.render.estimator import estimate, n_buckets


def test_bucket_count_formula():
    # m = min(mMax, max(1, 1 + 2*((n-5)//10))) (estimator.hpp:56)
    assert n_buckets(1) == 1
    assert n_buckets(15) == 3
    assert n_buckets(64) == 11
    assert n_buckets(128) == 15
    assert n_buckets(2048) == 15


def test_mean_and_nan_discard():
    s = np.ones((4, 8, 3), np.float32)
    s[0, 3] = np.nan
    out = np.asarray(estimate(jnp.asarray(s), "mean"))
    # NaN sample dropped from the sum but still divided by n (estimator.hpp:35-41)
    np.testing.assert_allclose(out[0], 7.0 / 8.0, rtol=1e-6)
    np.testing.assert_allclose(out[1], 1.0, rtol=1e-6)


def test_mon_rejects_fireflies():
    rng = np.random.default_rng(0)
    s = rng.uniform(0.4, 0.6, (16, 64, 3)).astype(np.float32)
    s[:, 7] = 1000.0  # firefly in one bucket
    out = np.asarray(estimate(jnp.asarray(s), "mon"))
    assert np.all(out < 1.0), out.max()
    assert np.all(np.abs(out - 0.5) < 0.1)


def test_gmon_between_mean_and_mon():
    rng = np.random.default_rng(1)
    s = rng.uniform(0.4, 0.6, (32, 64, 3)).astype(np.float32)
    s[:, 5] = 500.0
    mean = np.asarray(estimate(jnp.asarray(s), "mean"))
    mon = np.asarray(estimate(jnp.asarray(s), "mon"))
    gmon = np.asarray(estimate(jnp.asarray(s), "gmon"))
    # gmon rejects the outlier like mon
    assert np.all(gmon < 1.0)
    assert np.all(np.abs(gmon - 0.5) < 0.1)
    # but on clean data it matches the mean closely
    clean = rng.uniform(0.4, 0.6, (32, 64, 3)).astype(np.float32)
    m2 = np.asarray(estimate(jnp.asarray(clean), "mean"))
    g2 = np.asarray(estimate(jnp.asarray(clean), "gmon"))
    np.testing.assert_allclose(g2, m2, atol=0.02)


def test_gmon_rejects_negative():
    s = np.full((2, 32, 3), 0.5, np.float32)
    s[:, 3] = -5.0  # negative sample discarded by GMoN (estimator.hpp:155-157)
    out = np.asarray(estimate(jnp.asarray(s), "gmon"))
    np.testing.assert_allclose(out, 0.5, atol=1e-5)


def test_gmonb_switches():
    clean = np.full((4, 64, 3), 0.5, np.float32)
    out = np.asarray(estimate(jnp.asarray(clean), "gmonb"))
    np.testing.assert_allclose(out, 0.5, atol=1e-6)
    dirty = clean.copy()
    dirty[:, 2] = 800.0
    out2 = np.asarray(estimate(jnp.asarray(dirty), "gmonb"))
    assert np.all(out2 < 1.0)
