"""AgX tonemapping with ASC-CDL looks.

Batched port of the reference tonemapper (src/core/tonemapping.hpp:14-92):
3x3 input matrix -> log2 encode over [-12.47393, 4.026069] EV -> 6th-order
sigmoid polynomial -> look (offset/slope/power/sat) -> inverse matrix ->
clamp -> gamma-2.2 decode back to linear. The matrices and polynomial are the
public minimal-AgX constants (Troy Sobotka's AgX as popularized by the
three.js/Blender "AgX minimal" implementations).

Operates on [..., 3] linear HDR RGB; fully differentiable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# Input/output matrices (tonemapping.hpp:57-61,84-88), stored so that
# `x @ M.T` implements the reference's `M * val`. Rows here sum to ~1 — the
# grey axis is preserved, which pins the orientation (the constants are
# column-major in the GLSL-style listing).
_AGX_MAT = np.asarray(
    [
        [0.842479062253094, 0.0784335999999992, 0.0792237451477643],
        [0.0423282422610123, 0.878468636469772, 0.0791661274605434],
        [0.0423756549057051, 0.0784336, 0.879142973793104],
    ],
    np.float32,
)
_AGX_MAT_INV = np.asarray(
    [
        [1.19687900512017, -0.0980208811401368, -0.0990297440797205],
        [-0.0528968517574562, 1.15190312990417, -0.0989611768448433],
        [-0.0529716355144438, -0.0980434501171241, 1.15107367264116],
    ],
    np.float32,
)
_MIN_EV = -12.47393
_MAX_EV = 4.026069
_LW = np.asarray([0.2126, 0.7152, 0.0722], np.float32)  # numpy: import-context safe


class Look(NamedTuple):
    """ASC-CDL-style grade (tonemapping.hpp:16-33)."""

    offset: tuple
    slope: tuple
    power: tuple
    sat: float


LOOKS = {
    "none": Look((0.0,) * 3, (1.0,) * 3, (1.0,) * 3, 1.0),
    "golden": Look((0.0,) * 3, (1.0, 0.9, 0.5), (0.8,) * 3, 0.8),
    "punchy": Look((0.0,) * 3, (1.0,) * 3, (1.35,) * 3, 1.4),
}


def _contrast(x):
    """6th-order sigmoid fit (tonemapping.hpp:42-54)."""
    x2 = x * x
    x4 = x2 * x2
    return (
        15.5 * x4 * x2
        - 40.14 * x4 * x
        + 31.96 * x4
        - 6.868 * x2 * x
        + 0.4298 * x2
        + 0.1191 * x
        - 0.00232
    )


def agx(hdr, look: str | Look = "none"):
    """Full AgX pipeline on [..., 3] linear HDR; returns linear display RGB."""
    if isinstance(look, str):
        look = LOOKS[look]

    # start(): matrix, log2 encode, contrast (tonemapping.hpp:56-70)
    val = hdr @ _AGX_MAT.T
    val = jnp.clip(jnp.log2(jnp.maximum(val, 1e-10)), _MIN_EV, _MAX_EV)
    val = (val - _MIN_EV) / (_MAX_EV - _MIN_EV)
    val = _contrast(val)

    # applyLook() (tonemapping.hpp:72-80)
    luma = jnp.sum(val * _LW, axis=-1, keepdims=True)
    slope = jnp.asarray(look.slope, jnp.float32)
    offset = jnp.asarray(look.offset, jnp.float32)
    power = jnp.asarray(look.power, jnp.float32)
    val = jnp.maximum(val * slope + offset, 0.0) ** power
    val = luma + look.sat * (val - luma)

    # end(): inverse matrix, clamp, gamma-2.2 decode (tonemapping.hpp:82-90)
    val = val @ _AGX_MAT_INV.T
    val = jnp.clip(val, 0.0, 1.0)
    return val ** 2.2


def tonemap(hdr, kind: str = "agx", look: str = "none"):
    """Dispatch: 'agx' or 'none' (identity)."""
    if kind == "none":
        return hdr
    if kind == "agx":
        return agx(hdr, look)
    raise ValueError(f"unknown tonemap: {kind}")
