"""Piecewise-constant 1D/2D distributions for importance sampling.

Replaces the reference's pointer-y ``PiecewiseConstant1D/2D`` classes
(src/math/sampling.hpp:118-196, sampling.cpp:5-60) with flat device arrays:
the 2D table is stored as a conditional CDF per row plus a marginal CDF, and
sampling is two vectorized ``searchsorted`` calls — embarrassingly parallel
over the wavefront.

Note: the reference has an off-by-one bug at sampling.cpp:28 (``m_cdf[0+1]``
instead of ``m_cdf[o+1]``) that mis-scales the intra-bin offset. We implement
the *correct* math; SURVEY.md §2.1 documents the discrepancy.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax

ONE_MINUS_EPS = float(np.nextafter(np.float32(1.0), np.float32(0.0)))


class Dist2D(NamedTuple):
    """Flattened piecewise-constant 2D distribution over [0,1]^2.

    func:      [nv, nu]   non-negative function values
    cond_cdf:  [nv, nu+1] per-row conditional CDF (cond_cdf[:, -1] == 1)
    cond_int:  [nv]       per-row integrals (un-normalized marginal function)
    marg_cdf:  [nv+1]     marginal CDF over rows
    integral:  []         total integral of func over [0,1]^2
    """

    func: jnp.ndarray
    cond_cdf: jnp.ndarray
    cond_int: jnp.ndarray
    marg_cdf: jnp.ndarray
    integral: jnp.ndarray


def _build_cdf(f: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Build normalized CDF(s) along the last axis; handles zero integrals by
    falling back to uniform (sampling.hpp:135-140)."""
    n = f.shape[-1]
    cdf = np.concatenate(
        [np.zeros(f.shape[:-1] + (1,), np.float64), np.cumsum(f, axis=-1) / n],
        axis=-1,
    )
    integral = cdf[..., -1:].copy()
    uniform = np.linspace(0.0, 1.0, n + 1, dtype=np.float64)
    uniform = np.broadcast_to(uniform, cdf.shape)
    with np.errstate(invalid="ignore", divide="ignore"):
        norm = cdf / integral
    cdf = np.where(integral > 0.0, norm, uniform)
    return cdf.astype(np.float32), integral[..., 0].astype(np.float32)


def build_dist2d(func: np.ndarray) -> Dist2D:
    """Host-side build from a [nv, nu] table of non-negative values."""
    f = np.abs(np.asarray(func, np.float64))
    cond_cdf, cond_int = _build_cdf(f)
    marg_cdf, integral = _build_cdf(cond_int[None, :].astype(np.float64))
    return Dist2D(
        func=jnp.asarray(f, jnp.float32),
        cond_cdf=jnp.asarray(cond_cdf),
        cond_int=jnp.asarray(cond_int),
        marg_cdf=jnp.asarray(marg_cdf[0]),
        integral=jnp.asarray(integral[0]),
    )


def _sample_1d(cdf, func_over_integral, u):
    """Vectorized PiecewiseConstant1D::sample (sampling.cpp:5-33, bug fixed).

    cdf: [n+1] (or [B, n+1] matching u), u: [B]. Returns (x in [0,1], pdf, idx).
    """
    n = cdf.shape[-1] - 1
    if cdf.ndim == 1:
        idx = jnp.clip(jnp.searchsorted(cdf, u, side="left") - 1, 0, n - 1)
        c0 = cdf[idx]
        c1 = cdf[idx + 1]
    else:
        # Batched rows: cdf[i] paired with u[i].
        idx = jnp.clip(
            jnp.sum((cdf < u[..., None]).astype(jnp.int32), axis=-1) - 1, 0, n - 1
        )
        c0 = jnp.take_along_axis(cdf, idx[..., None], axis=-1)[..., 0]
        c1 = jnp.take_along_axis(cdf, idx[..., None] + 1, axis=-1)[..., 0]
    seg = c1 - c0
    du = jnp.where(seg > 0, (u - c0) / jnp.maximum(seg, 1e-20), 0.0)
    x = (idx.astype(u.dtype) + du) / n
    pdf = jnp.take_along_axis(
        func_over_integral, idx[..., None], axis=-1
    )[..., 0] if func_over_integral.ndim > 1 else func_over_integral[idx]
    return x, pdf, idx


def sample_dist2d(d: Dist2D, u):
    """Sample UV in [0,1]^2 from u=[...,2]; returns (uv, pdf).

    Mirrors PiecewiseConstant2D::sample (sampling.cpp:35-44): marginal row
    from u.y, then conditional column from u.x; pdf is the product.
    """
    batch = u.shape[:-1]
    uf = u.reshape(-1, 2)
    nv, nu = d.func.shape

    marg_f = d.cond_int / jnp.maximum(d.integral, 1e-20)
    y, pdf_y, iv = _sample_1d(d.marg_cdf, marg_f, uf[:, 1])

    cond_cdf = d.cond_cdf[iv]  # [B, nu+1]
    cond_f = d.func[iv] / jnp.maximum(d.cond_int[iv][:, None], 1e-20)  # [B, nu]
    x, pdf_x, _ = _sample_1d(cond_cdf, cond_f, uf[:, 0])

    uv = jnp.stack([x, y], axis=-1).reshape(batch + (2,))
    pdf = (pdf_x * pdf_y).reshape(batch)
    return uv, pdf


def pdf_dist2d(d: Dist2D, uv):
    """PDF at uv (PiecewiseConstant2D::pdf, sampling.cpp:46-60): func value at
    the cell over the total integral."""
    nv, nu = d.func.shape
    iu = jnp.clip((uv[..., 0] * nu).astype(jnp.int32), 0, nu - 1)
    iv = jnp.clip((uv[..., 1] * nv).astype(jnp.int32), 0, nv - 1)
    return d.func[iv, iu] / jnp.maximum(d.integral, 1e-20)


def build_alias(weight: np.ndarray):
    """Walker alias table for a discrete distribution over K cells.

    TPU-first replacement for CDF inversion: per-lane binary searches and
    per-row conditional-CDF gathers cost ~5 ms per gather op at wavefront
    scale (tools/diag_gather.py), while alias sampling is ONE row gather +
    arithmetic, O(1) in K. Returns (prob [K], alias [K] i32, pdf [K]) with
    pdf the piecewise-constant density over the unit domain (cell value /
    mean value), matching Dist2D's pdf semantics.
    """
    w = np.asarray(weight, np.float64).reshape(-1)
    k = w.shape[0]
    total = w.sum()
    if total <= 0.0:
        w = np.ones(k, np.float64)
        total = float(k)
    p = w * (k / total)  # mean 1
    prob = np.ones(k, np.float64)
    alias = np.arange(k, dtype=np.int64)
    small = [i for i in range(k) if p[i] < 1.0]
    large = [i for i in range(k) if p[i] >= 1.0]
    p = p.copy()
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] = (p[l] + p[s]) - 1.0
        (small if p[l] < 1.0 else large).append(l)
    for i in small + large:
        prob[i] = 1.0
        alias[i] = i
    pdf = w * (k / total)
    return (
        prob.astype(np.float32),
        alias.astype(np.int32),
        pdf.astype(np.float32),
    )


def sample_alias_rows(rows, u):
    """Sample cells from a packed alias-row table.

    rows: [K, >=4] f32 with cols (prob, alias(bitcast i32), pdf_self,
    pdf_alias); u: [N] uniforms. Returns (cell [N] i32, pdf [N], r [N])
    where r is the renormalized leftover entropy of u (uniform in [0,1)
    given the outcome) — reusable as one intra-cell jitter coordinate.
    """
    k = rows.shape[0]
    x = u * k
    j = jnp.clip(x.astype(jnp.int32), 0, k - 1)
    r = x - j.astype(jnp.float32)
    row = rows[j]  # ONE row gather
    prob = row[..., 0]
    alias = lax.bitcast_convert_type(row[..., 1], jnp.int32)
    accept = r < prob
    cell = jnp.where(accept, j, alias)
    pdf = jnp.where(accept, row[..., 2], row[..., 3])
    r2 = jnp.where(
        accept,
        r / jnp.maximum(prob, 1e-12),
        (r - prob) / jnp.maximum(1.0 - prob, 1e-12),
    )
    return cell, pdf, jnp.clip(r2, 0.0, ONE_MINUS_EPS)
