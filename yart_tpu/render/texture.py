"""Batched texture sampling over shelf-packed atlases.

Mirrors the reference sampling semantics (src/core/texture.hpp:126-161,
texture.cpp:21-35): repeat wrap by frac(uv), scale by (true_size - 1), clamp
base texel to size-2, bilinear over the 2x2 neighborhood. sRGB color data is
stored gamma-2 encoded and decoded with one multiply (texture.hpp:80-84,
112-114) — the decode is applied by the *caller* on color channels only.

A stack is ONE [H, W, C] atlas with per-texture (x0, y0, w, h) rects, so a
traced per-lane texture index becomes a rect fetch + four 2D gathers. The
clamp-to-size-2 rule keeps every fetch inside its own rect (no borders).
"""

from __future__ import annotations

import jax.numpy as jnp

from yart_tpu.ops.gatherless import onehot_matmul
from yart_tpu.scene.types import TextureStack


def qrows_from_data(data):
    """[H, W, C] atlas -> [H*W, 4C] per-texel 2x2 quad rows (s00 s10 s01
    s11), edges clamped. jnp ops so texture-content gradients flow through
    the packed rows (render/diff.py texture_grads rebuilds them)."""
    h, w = data.shape[:2]
    x1 = jnp.minimum(jnp.arange(w) + 1, w - 1)
    y1 = jnp.minimum(jnp.arange(h) + 1, h - 1)
    quad = jnp.concatenate(
        [data, data[:, x1], data[y1], data[y1][:, x1]], axis=-1
    )
    return quad.reshape(h * w, -1)


def sample_stack(stack: TextureStack, idx, uv):
    """Sample textures `idx` ([N] int32) at `uv` ([N, 2]); returns [N, C].

    Lanes with idx < 0 return zeros (callers mask on tex slot >= 0); an
    empty stack returns zeros for every lane.
    """
    if stack.table.shape[0] == 0:
        c = stack.data.shape[-1]
        return jnp.zeros(idx.shape + (c,), jnp.float32)
    # Rect fetch as a one-hot contraction (texture counts are tiny); the
    # bilinear fetch is ONE quad-row gather.
    safe_idx = jnp.clip(idx, 0, stack.table.shape[0] - 1)
    rect = onehot_matmul(stack.table.astype(jnp.float32), safe_idx)
    w = rect[..., 2]
    h = rect[..., 3]

    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    u = u * (w - 1.0)
    v = v * (h - 1.0)
    x = jnp.minimum((rect[..., 2] - 2.0), jnp.floor(u))
    y = jnp.minimum((rect[..., 3] - 2.0), jnp.floor(v))
    x = jnp.maximum(x, 0.0)
    y = jnp.maximum(y, 0.0)
    fu = (u - x)[..., None]
    fv = (v - y)[..., None]

    aw = stack.data.shape[1]
    c = stack.data.shape[-1]
    xi = (rect[..., 0] + x).astype(jnp.int32)
    yi = (rect[..., 1] + y).astype(jnp.int32)
    q = stack.qrows[yi * aw + xi]  # [N, 4C]
    s00 = q[..., 0 * c : 1 * c]
    s10 = q[..., 1 * c : 2 * c]
    s01 = q[..., 2 * c : 3 * c]
    s11 = q[..., 3 * c : 4 * c]

    out = (s00 * (1 - fv) + s01 * fv) * (1 - fu) + (s10 * (1 - fv) + s11 * fv) * fu
    out = jnp.where((idx >= 0)[..., None], out, 0.0)
    # Saved across the per-bounce remat under cfg.remat="trace_lut"
    # (diff mode only — the name op is an XLA optimization barrier, so
    # the non-diff forward path must not carry it; ops/lut.py).
    from yart_tpu.ops import lut as _lut

    if not _lut._NAME_RESIDUALS:
        return out
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(out, "lut")
