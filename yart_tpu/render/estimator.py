"""Robust per-pixel sample estimators: mean / MoN / GMoNb / GMoN.

Vectorized re-design of the reference estimators (src/core/estimator.hpp):
instead of per-pixel accumulator objects fed one sample at a time, a whole
wave of samples [num_pixels, k, 3] reduces at once. Bucketing is round-robin
over the sample axis (sample j -> bucket j % m, estimator.hpp:62-65), bucket
means are sorted by Rec.709 luma, and the Gini coefficient drives trimming,
exactly as the reference:

- MoN: median bucket (estimator.hpp:53-88)
- GMoNb: Gini <= 0.25 -> plain mean, else median (estimator.hpp:94-141)
- GMoN: trim c = floor(G * m/2) buckets from both ends, average the rest;
  negative samples discarded (estimator.hpp:148-198)

NaN samples are discarded everywhere (estimator.hpp:35,60,101,155).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_LW = np.asarray([0.2126, 0.7152, 0.0722], np.float32)  # numpy: import-context safe


def n_buckets(k: int, m_max: int = 15) -> int:
    """m = min(mMax, max(1, 1 + 2*((n-5)//10))) (estimator.hpp:56)."""
    return int(min(m_max, max(1, 1 + 2 * ((k - 5) // 10))))


def _bucket_means(samples, m: int, reject_negative: bool):
    """[N, k, 3] -> bucket means [N, m, 3] with round-robin assignment and
    invalid-sample discarding (per-bucket sample counts)."""
    n, k, _ = samples.shape
    valid = ~jnp.any(jnp.isnan(samples), axis=-1)
    if reject_negative:
        valid &= jnp.all(samples >= 0.0, axis=-1)
    clean = jnp.where(valid[..., None], samples, 0.0)

    bucket = jnp.arange(k, dtype=jnp.int32) % m  # [k]
    one_hot = (bucket[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]).astype(
        samples.dtype
    )  # [k, m]
    acc = jnp.einsum("nkc,km->nmc", clean, one_hot)
    cnt = jnp.einsum("nk,km->nm", valid.astype(samples.dtype), one_hot)
    return acc / jnp.maximum(cnt, 1.0)[..., None], cnt


def _sorted_by_luma(means):
    luma = jnp.sum(means * _LW, axis=-1)  # [N, m]
    order = jnp.argsort(luma, axis=-1)  # [N, m]
    # Permutation via masked sums (gather-free; m <= 15; a batched einsum
    # would lower to N tiny matmuls).
    m = means.shape[1]
    sel = order[..., :, None] == jnp.arange(m)[None, None, :]  # [N, mo, mi]
    return jnp.sum(
        jnp.where(sel[..., None], means[:, None, :, :], 0.0), axis=2
    )


def _gini(sorted_means):
    """Gini coefficient over luma-sorted bucket means (estimator.hpp:122-128)."""
    n, m, _ = sorted_means.shape
    idx = jnp.arange(1, m + 1, dtype=sorted_means.dtype)
    s = jnp.sum(sorted_means, axis=1)  # [N, 3]
    ws = jnp.sum(sorted_means * idx[None, :, None], axis=1)
    luma = lambda v: jnp.sum(v * _LW, axis=-1)
    g = 2.0 * luma(ws) / jnp.maximum(m * luma(s), 1e-12) - (m + 1.0) / m
    return jnp.clip(g, 0.0, 1.0), s


def estimate(samples, kind: str = "gmon", m_max: int = 15):
    """Reduce a wave [N, k, 3] -> [N, 3] pixel values."""
    n, k, _ = samples.shape

    if kind == "mean":
        valid = ~jnp.any(jnp.isnan(samples), axis=-1, keepdims=True)
        clean = jnp.where(valid, samples, 0.0)
        return jnp.sum(clean, axis=1) / k

    m = n_buckets(k, m_max)
    reject_neg = kind == "gmon"
    means, cnt = _bucket_means(samples, m, reject_neg)
    if m == 1:
        return means[:, 0]

    smeans = _sorted_by_luma(means)

    if kind == "mon":
        return smeans[:, m // 2]

    g, s = _gini(smeans)
    if kind == "gmonb":
        return jnp.where((g <= 0.25)[..., None], s / m, smeans[:, m // 2])

    if kind == "gmon":
        c = (g * (m // 2)).astype(jnp.int32)  # [N]
        idx = jnp.arange(m, dtype=jnp.int32)[None, :]
        keep = (idx >= c[:, None]) & (idx < (m - c[:, None]))
        trimmed = jnp.sum(jnp.where(keep[..., None], smeans, 0.0), axis=1)
        return trimmed / jnp.maximum((m - 2 * c).astype(samples.dtype), 1.0)[..., None]

    raise ValueError(f"unknown estimator: {kind}")
