"""Trowbridge-Reitz (GGX) microfacet distribution, batched and branchless.

TPU-first rewrite of the reference's scalar ``GGX`` class
(yart src/core/bsdf.hpp:175-291): every function maps over arbitrary leading
batch dims with per-lane (alpha_x, alpha_y); the reference's `if (ax != ay)`
specialization becomes a uniform anisotropic formula that reduces to the
isotropic one when ax == ay.

Conventions preserved exactly:
- alpha = roughness^2; anisotropy via aspect = sqrt(1 - 0.9 * aniso)
  (bsdf.hpp:177-187).
- ``smooth`` cutoff: both alphas < 1e-3 -> treat as delta lobes
  (bsdf.hpp:239-241).
- VNDF sampling is the Heitz ellipsoid-stretch + truncated-hemisphere-disk
  construction (bsdf.hpp:243-271).

All directions are in the local shading frame with z = normal.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from yart_tpu.ops import warps
from yart_tpu.ops.vecmath import absdot, normalize, safe_sqrt

PI = jnp.pi
SMOOTH_ALPHA = 1e-3
# Backward-pass guard (round 5): alphas entering denominators are clamped
# to this FLOOR, strictly below the SMOOTH_ALPHA cutoff. Rough lanes
# (alpha >= SMOOTH_ALPHA) are never altered, and smooth lanes' rough-branch
# values are masked out by every caller (`~smooth(a)` gates / delta-lobe
# selects), so forward results are bit-identical — but without the clamp a
# roughness-0 material NaNs the whole gradient: 1/alpha^2 = inf inside the
# masked-out branch turns the masked zero cotangent into 0 * inf = NaN in
# reverse mode (the double-where rule), and one NaN lane contaminates every
# parameter row through the loss reduction (measured: material_test_spheres
# base-color grads were all-NaN before this).
ALPHA_FLOOR = 1e-4


class Alphas(NamedTuple):
    """Per-lane GGX alphas; [...] float32 each."""

    ax: jnp.ndarray
    ay: jnp.ndarray
    roughness: jnp.ndarray


def make_alphas(roughness, anisotropic=0.0) -> Alphas:
    """roughness/aniso -> (alpha_x, alpha_y) (bsdf.hpp:177-187)."""
    roughness = jnp.asarray(roughness, jnp.float32)
    alpha = roughness * roughness
    aniso = jnp.broadcast_to(jnp.asarray(anisotropic, jnp.float32), alpha.shape)
    aspect = jnp.sqrt(1.0 - 0.9 * aniso)
    return Alphas(alpha / aspect, alpha * aspect, roughness)


def smooth(a: Alphas):
    """Delta-lobe cutoff (bsdf.hpp:239-241); boolean [...] mask."""
    return (a.ax < SMOOTH_ALPHA) & (a.ay < SMOOTH_ALPHA)


def _phi_terms(w):
    """(cos2Theta, sin2Theta, cos2Phi, sin2Phi) with the reference's
    degenerate-sin2Theta conventions (bsdf.hpp:205-209,284-287)."""
    cos2t = w[..., 2] * w[..., 2]
    sin2t = jnp.maximum(0.0, 1.0 - cos2t)
    # Divisor masked to 1 below 1e-20: 1/safe^2 in the division's backward
    # is 1e40 = inf (the double-where rule; unnormalized refracted dirs can
    # land cos2t >~ 1 with non-tiny w.xy). Values in that band are ~0
    # either way (k and alpha2 multiply by tan2t <= 1e-20).
    safe = jnp.where(sin2t > 1e-20, sin2t, 1.0)
    cos2p = jnp.where(sin2t == 0.0, 1.0, w[..., 0] * w[..., 0] / safe)
    sin2p = jnp.where(sin2t == 0.0, 0.0, w[..., 1] * w[..., 1] / safe)
    return cos2t, sin2t, cos2p, sin2p


def mdf(a: Alphas, w):
    """Microfacet NDF D(w) (bsdf.hpp:193-217). w: [..., 3] local dir."""
    cos2t, sin2t, cos2p, sin2p = _phi_terms(w)
    # Degenerate cutoff at 1e-12 (not the old 1e-20): between those, tan2t
    # reaches 1e19 and (1 + k)^2 overflows f32 — reverse mode then emits
    # 0-cotangent * inf = NaN. Values in that band were numerical garbage
    # anyway (the reference discards grazing samples). Inputs are masked
    # BEFORE the reciprocal for the same double-where reason.
    ok = cos2t > 1e-12
    # Divisor masked too: 1/max(cos2t, 1e-20)^2 in the division's backward
    # is 1e40 = inf even when the quotient itself is where-masked.
    tan2t = jnp.where(ok, sin2t, 0.0) / jnp.where(ok, cos2t, 1.0)
    cos4t = jnp.where(ok, cos2t * cos2t, 1.0)
    ax = jnp.maximum(a.ax, ALPHA_FLOOR)  # reverse-mode guard, see above
    ay = jnp.maximum(a.ay, ALPHA_FLOOR)
    k = tan2t * (cos2p / (ax * ax) + sin2p / (ay * ay))
    k2 = (1.0 + k) * (1.0 + k)
    d = 1.0 / (PI * ax * ay * cos4t * k2)
    # Grazing w (cos ~ 0) blows up; the reference lets it and discards the
    # sample — here return 0 to keep NaNs out of the wavefront.
    return jnp.where(ok, d, 0.0)


def _lambda(a: Alphas, w):
    """Smith Lambda (bsdf.hpp:276-290)."""
    cos2t, sin2t, cos2p, sin2p = _phi_terms(w)
    # Same cutoff + input masking as mdf: keeps reverse mode finite.
    ok = cos2t > 1e-12
    tan2t = jnp.where(ok, sin2t, 0.0) / jnp.where(ok, cos2t, 1.0)
    alpha2 = a.ax * a.ax * cos2p + a.ay * a.ay * sin2p
    lam = (jnp.sqrt(1.0 + alpha2 * tan2t) - 1.0) * 0.5
    return jnp.where(ok, lam, 1e20)


def g1(a: Alphas, w):
    """Masking (bsdf.hpp:219-221)."""
    return 1.0 / (1.0 + _lambda(a, w))


def g(a: Alphas, wo, wi):
    """Masking-shadowing (bsdf.hpp:224-229)."""
    return 1.0 / (1.0 + _lambda(a, wo) + _lambda(a, wi))


def vmdf(a: Alphas, w, wm):
    """Visible-NDF pdf of wm as seen from w (bsdf.hpp:232-237)."""
    return g1(a, w) / jnp.maximum(jnp.abs(w[..., 2]), 1e-20) * mdf(a, wm) * absdot(w, wm)


def sample_visible(a: Alphas, w, u):
    """Heitz VNDF sampling (bsdf.hpp:243-271). u: [..., 2] uniforms.

    Returns a sampled half-vector wm with wm.z >= 1e-6.
    """
    # Ellipsoid -> hemisphere stretch. Alphas floored (reverse-mode guard,
    # see ALPHA_FLOOR): smooth lanes' sampled wm is replaced by the delta
    # direction in every caller, but alpha-0 here can normalize a
    # near-zero vector at grazing wo and NaN the backward.
    ax = jnp.maximum(a.ax, ALPHA_FLOOR)
    ay = jnp.maximum(a.ay, ALPHA_FLOOR)
    wh = normalize(
        jnp.stack([ax * w[..., 0], ay * w[..., 1], w[..., 2]], axis=-1)
    )
    wh = jnp.where(wh[..., 2:3] < 0.0, -wh, wh)

    # Orthonormal basis about wh (axis_z cross wh, with pole fallback).
    z = jnp.zeros_like(wh).at[..., 2].set(1.0)
    b_raw = normalize(jnp.cross(z, wh))
    x = jnp.zeros_like(wh).at[..., 0].set(1.0)
    b = jnp.where(wh[..., 2:3] < 0.9999, b_raw, x)
    t = jnp.cross(wh, b)

    # Disk sample warped to the truncated hemisphere projection.
    p = warps.sample_disk_uniform(u)
    h = safe_sqrt(1.0 - p[..., 0] * p[..., 0])
    mix = 0.5 * wh[..., 2] + 0.5
    py = h + (p[..., 1] - h) * mix
    px = p[..., 0]

    pz = safe_sqrt(1.0 - px * px - py * py)
    nh = px[..., None] * b + py[..., None] * t + pz[..., None] * wh

    return normalize(
        jnp.stack(
            [
                ax * nh[..., 0],
                ay * nh[..., 1],
                jnp.maximum(1e-6, nh[..., 2]),
            ],
            axis=-1,
        )
    )
