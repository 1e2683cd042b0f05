"""Color transfer functions.

Mirrors the reference's color conventions:
- exact sRGB EOTF encode/decode (src/core/color-utils.hpp:12-40)
- the gamma-2.0 texture storage trick: sRGB textures are decoded at load and
  re-encoded with gamma 2 so sampling decodes with one multiply
  (src/core/texture.hpp:80-84,112-114)
- PPM output gamma 1/2.2 (src/output/ppm.cpp:5-21)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def srgb_decode(v):
    """sRGB electro-optical transfer: encoded [0,1] -> linear."""
    v = jnp.asarray(v)
    return jnp.where(v <= 0.04045, v / 12.92, ((v + 0.055) / 1.055) ** 2.4)


def srgb_encode(v):
    """Linear [0,1] -> sRGB-encoded."""
    v = jnp.asarray(v)
    safe = jnp.maximum(v, 1e-12)
    return jnp.where(v <= 0.0031308, v * 12.92, 1.055 * safe ** (1.0 / 2.4) - 0.055)


def srgb_decode_np(v: np.ndarray) -> np.ndarray:
    """Host-side (numpy) sRGB decode for texture loading."""
    v = np.asarray(v, np.float32)
    return np.where(v <= 0.04045, v / 12.92, ((v + 0.055) / 1.055) ** 2.4).astype(np.float32)


def srgb_encode_np(v: np.ndarray) -> np.ndarray:
    """Host-side (numpy) sRGB encode (texture/image export)."""
    v = np.asarray(v, np.float32)
    safe = np.maximum(v, 1e-12)
    return np.where(
        v <= 0.0031308, v * 12.92, 1.055 * safe ** (1.0 / 2.4) - 0.055
    ).astype(np.float32)


def gamma2_encode_np(v: np.ndarray) -> np.ndarray:
    """Host-side gamma-2 re-encode (texture.hpp:80-84): stored = sqrt(linear)."""
    return np.sqrt(np.maximum(np.asarray(v, np.float32), 0.0)).astype(np.float32)


def gamma2_decode(v):
    """Device-side gamma-2 decode: linear = stored * stored (texture.hpp:112-114)."""
    return v * v


def gamma22_encode(v):
    """Output gamma 1/2.2 clamp-encode used by the PPM writer (ppm.cpp:10-16)."""
    return jnp.clip(v, 0.0, 1.0) ** (1.0 / 2.2)
