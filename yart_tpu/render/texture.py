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

from yart_tpu.scene.types import TextureStack


def sample_stack(stack: TextureStack, idx, uv):
    """Sample textures `idx` ([N] int32) at `uv` ([N, 2]); returns [N, C].

    Lanes with idx < 0 return zeros (callers mask on tex slot >= 0); an
    empty stack returns zeros for every lane.
    """
    if stack.table.shape[0] == 0:
        c = stack.data.shape[-1]
        return jnp.zeros(idx.shape + (c,), jnp.float32)
    safe_idx = jnp.clip(idx, 0, stack.table.shape[0] - 1)
    rect = stack.table[safe_idx]  # [N, 4] (x0, y0, w, h)
    x0 = rect[..., 0]
    y0 = rect[..., 1]
    w = rect[..., 2].astype(jnp.float32)
    h = rect[..., 3].astype(jnp.float32)

    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    u = u * (w - 1.0)
    v = v * (h - 1.0)
    x = jnp.minimum((rect[..., 2] - 2), u.astype(jnp.int32))
    y = jnp.minimum((rect[..., 3] - 2), v.astype(jnp.int32))
    x = jnp.maximum(x, 0)
    y = jnp.maximum(y, 0)
    fu = u - x.astype(jnp.float32)
    fv = v - y.astype(jnp.float32)

    d = stack.data
    xx = x0 + x
    yy = y0 + y
    s00 = d[yy, xx]  # [N, C]
    s01 = d[yy + 1, xx]
    s10 = d[yy, xx + 1]
    s11 = d[yy + 1, xx + 1]

    fu = fu[..., None]
    fv = fv[..., None]
    out = (s00 * (1 - fv) + s01 * fv) * (1 - fu) + (s10 * (1 - fv) + s11 * fv) * fu
    return jnp.where((idx >= 0)[..., None], out, 0.0)


def sample_hdr(image, uv):
    """Bilinear sample of a single [H, W, 3] HDR image (env maps), same
    wrap/clamp rules as above."""
    h, w = image.shape[:2]
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    u = u * (w - 1)
    v = v * (h - 1)
    x = jnp.clip(u.astype(jnp.int32), 0, max(w - 2, 0))
    y = jnp.clip(v.astype(jnp.int32), 0, max(h - 2, 0))
    fu = (u - x)[..., None]
    fv = (v - y)[..., None]
    x1 = jnp.minimum(x + 1, w - 1)
    y1 = jnp.minimum(y + 1, h - 1)
    s00 = image[y, x]
    s01 = image[y1, x]
    s10 = image[y, x1]
    s11 = image[y1, x1]
    return (s00 * (1 - fv) + s01 * fv) * (1 - fu) + (s10 * (1 - fv) + s11 * fv) * fu
