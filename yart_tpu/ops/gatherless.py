"""Gather-free lookups for TPU: one-hot matmuls and interpolation-weight
("hat function") contractions.

Per-lane dynamic gathers are the slowest primitive on TPU (measured ~100ms
per 2^19-lane fetch chain on v5e, vs ~1ms for the equivalent one-hot matmul
on the MXU). Every small-table lookup in the renderer — material rows,
multiscatter LUT texels, leaf-candidate selects — is reformulated here as a
dense contraction:

- `onehot_matmul(table[M, F], idx[N])`: idx == iota one-hot [N, M] @ table.
  Exact for values representable in f32 (all our tables are f32/small ints).
- `fetch_*`: clamped multilinear interpolation as hat-weight contractions.
  hat_i(x) = max(0, 1 - |x*(n-1) - i|) reproduces the reference's clamped
  bilerp/trilerp (luts.hpp:33-187) exactly, including the index-clamp-to-n-2
  edge behavior, because the hats partition unity on [0, n-1].
- `select_along(vals[N, K], best[N])`: masked-sum instead of
  take_along_axis.

Only worthwhile for tables with few rows (<= ~1024); large-table gathers
(BVH nodes, vertex arrays, big textures) stay real gathers.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _iota(n, dtype=jnp.float32):
    return lax.broadcasted_iota(dtype, (1, n), 1)


def hat_weights(x, n: int):
    """[N] coords in [0,1] -> [N, n] linear interpolation weights."""
    xo = jnp.clip(x, 0.0, 1.0)[..., None] * (n - 1.0)
    return jnp.maximum(0.0, 1.0 - jnp.abs(xo - _iota(n)))


def onehot(idx, n: int, dtype=jnp.float32):
    """[N] int -> [N, n] one-hot (f32 for MXU)."""
    return (idx[..., None] == _iota(n, jnp.int32)).astype(dtype)


def onehot_matmul(table, idx):
    """Gather rows table[idx] as a one-hot matmul: [M, F...] x [N] -> [N, F...]."""
    m = table.shape[0]
    flat = table.reshape(m, -1).astype(jnp.float32)
    out = jnp.dot(onehot(idx, m), flat, preferred_element_type=jnp.float32)
    return out.reshape(idx.shape + table.shape[1:])


def fetch_1d(tab, x):
    """Linear interp of [n] table at x in [0,1]; [N] out."""
    n = tab.shape[0]
    return jnp.sum(hat_weights(x, n) * tab[None, :], axis=-1)


def fetch_2d(tab, x0, x1):
    """Bilinear interp of [n0, n1] table; axes map (x0 -> dim0, x1 -> dim1)."""
    n0, n1 = tab.shape
    w0 = hat_weights(x0, n0)  # [N, n0]
    w1 = hat_weights(x1, n1)  # [N, n1]
    a = jnp.dot(w0, tab.astype(jnp.float32), preferred_element_type=jnp.float32)
    return jnp.sum(a * w1, axis=-1)


def fetch_3d(tab, x0, x1, x2):
    """Trilinear interp of [n0, n1, n2] table."""
    n0, n1, n2 = tab.shape
    w0 = hat_weights(x0, n0)
    w1 = hat_weights(x1, n1)
    w2 = hat_weights(x2, n2)
    a = jnp.dot(
        w0,
        tab.reshape(n0, n1 * n2).astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(x0.shape + (n1, n2))
    return jnp.sum(a * w1[..., :, None] * w2[..., None, :], axis=(-2, -1))


def ref_lerp_weights(x, n: int):
    """[N] coords -> [N, n] weights with the REFERENCE's LUT indexing
    (luts.hpp:33-187): idx = min(size_t(x*(n-1)), n-2) and frac left
    UNCLAMPED. The size_t cast of a negative float is UB; the x86 g++ build
    this project validates against (tools/oracle) wraps negatives to a huge
    value, so min() selects the TOP bin and the lerp extrapolates off the
    top edge. (On the reference author's arm64 the same cast saturates to 0
    and extrapolates off the BOTTOM — the reference's backside-cosine
    behavior is platform-defined; we match the oracle.) For in-range inputs
    this is exactly the reference's clamped bilerp, same as hat_weights."""
    xo = x * (n - 1.0)
    idx = jnp.where(
        xo < 0.0,
        n - 2,
        jnp.minimum(xo.astype(jnp.int32), n - 2),
    )
    frac = (xo - idx.astype(jnp.float32))[..., None]
    base = onehot(idx, n)
    nxt = onehot(idx + 1, n)
    return base * (1.0 - frac) + nxt * frac


def fetch_1d_ref(tab, x):
    """Reference-indexed linear interp of [n] table (luts.hpp semantics)."""
    return jnp.sum(ref_lerp_weights(x, tab.shape[0]) * tab[None, :], axis=-1)


def fetch_2d_ref(tab, x0, x1):
    """Reference-indexed bilerp of [n0, n1] table."""
    n0, n1 = tab.shape
    w0 = ref_lerp_weights(x0, n0)
    w1 = ref_lerp_weights(x1, n1)
    a = jnp.dot(w0, tab.astype(jnp.float32), preferred_element_type=jnp.float32)
    return jnp.sum(a * w1, axis=-1)


def fetch_3d_ref(tab, x0, x1, x2):
    """Reference-indexed trilerp of [n0, n1, n2] table."""
    n0, n1, n2 = tab.shape
    w0 = ref_lerp_weights(x0, n0)
    w1 = ref_lerp_weights(x1, n1)
    w2 = ref_lerp_weights(x2, n2)
    a = jnp.dot(
        w0,
        tab.reshape(n0, n1 * n2).astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(x0.shape + (n1, n2))
    return jnp.sum(a * w1[..., :, None] * w2[..., None, :], axis=(-2, -1))


def select_along(vals, best):
    """take_along_axis(vals [N, K(, C)], best [N]) without a gather."""
    k = vals.shape[1]
    sel = best[:, None] == lax.broadcasted_iota(jnp.int32, (1, k), 1)
    if vals.ndim == 3:
        sel = sel[..., None]
    if vals.dtype == jnp.bool_:
        return jnp.any(vals & sel, axis=1)
    zero = jnp.zeros((), vals.dtype)
    return jnp.sum(jnp.where(sel, vals, zero), axis=1)
