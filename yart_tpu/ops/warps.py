"""Low-discrepancy warps: map uniform [0,1)^k samples onto useful domains.

Vectorized re-implementations of the reference sampling warps
(yart ``src/math/sampling.hpp:13-116``); all functions broadcast over leading
batch dims, with u of shape [..., 2].
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def pixel_jitter_square(u):
    """Uniform jitter in [-0.5, 0.5]^2 (sampling.hpp:13-18)."""
    return u - 0.5


def pixel_jitter_gaussian(u, std_dev=0.3):
    """Box-Muller Gaussian pixel filter, sigma=0.3 by default — the camera's
    film jitter (sampling.hpp:20-28, used at src/core/camera.hpp:145)."""
    ux = jnp.maximum(u[..., 0], 1e-10)
    a = jnp.sqrt(-2.0 * jnp.log(ux)) * std_dev
    b = TWO_PI * u[..., 1]
    return jnp.stack([a * jnp.cos(b), a * jnp.sin(b)], axis=-1)


def sample_cosine_hemisphere(u):
    """Cosine-weighted hemisphere about +z (sampling.hpp:30-38); pdf = z/pi."""
    phi = u[..., 0] * TWO_PI
    sqrt_r2 = jnp.sqrt(u[..., 1])
    x = jnp.cos(phi) * sqrt_r2
    y = jnp.sin(phi) * sqrt_r2
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u[..., 1]))
    return jnp.stack([x, y, z], axis=-1)


def sample_disk_uniform(u):
    """Uniform unit disk (sampling.hpp:40-45)."""
    r = jnp.sqrt(u[..., 0])
    theta = TWO_PI * u[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def sample_sphere_uniform(u):
    """Uniform unit sphere (sampling.hpp:47-52); pdf = 1/4pi."""
    from yart_tpu.ops.vecmath import safe_sqrt

    z = 1.0 - 2.0 * u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = TWO_PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_tri_uniform(u):
    """Uniform barycentrics via the reflection trick (sampling.hpp:54-64)."""
    ux, uy = u[..., 0], u[..., 1]
    lt = ux < uy
    b0 = jnp.where(lt, ux * 0.5, ux - uy * 0.5)
    b1 = jnp.where(lt, uy - ux * 0.5, uy * 0.5)
    return jnp.stack([b0, b1, 1.0 - b0 - b1], axis=-1)


def sample_poly_uniform(u, sides: int):
    """Uniform point in a regular polygon with outer radius 1, used for bladed
    camera apertures (sampling.hpp:72-89). ``sides`` is static (>= 3)."""
    ux = u[..., 0] * sides
    side = jnp.minimum(sides - 1, ux.astype(jnp.int32))
    ux = ux - side.astype(u.dtype)

    b = sample_tri_uniform(jnp.stack([ux, u[..., 1]], axis=-1))
    theta1 = side.astype(u.dtype) / sides * TWO_PI
    theta2 = (side.astype(u.dtype) + 1.0) / sides * TWO_PI
    v1 = jnp.stack([-jnp.sin(theta1), jnp.cos(theta1)], axis=-1)
    v2 = jnp.stack([-jnp.sin(theta2), jnp.cos(theta2)], axis=-1)
    return v1 * b[..., 1:2] + v2 * b[..., 2:3]


def sample_linear(u, a, b):
    """Sample x in [0,1] proportional to lerp(a, b, x) (sampling.hpp:91-94)."""
    denom = a + jnp.sqrt(jnp.maximum(0.0, a * a + u * (b * b - a * a)))
    x = u * (a + b) / jnp.maximum(denom, 1e-20)
    return jnp.where((u == 0.0) & (a == 0.0), 0.0, x)


def sample_bilinear(u, w):
    """Sample [0,1]^2 proportional to bilinear weights w=[w00,w10,w01,w11]
    (sampling.hpp:96-104)."""
    y = sample_linear(u[..., 1], w[..., 0] + w[..., 1], w[..., 2] + w[..., 3])
    x = sample_linear(
        u[..., 0],
        w[..., 0] * (1 - y) + w[..., 2] * y,
        w[..., 1] * (1 - y) + w[..., 3] * y,
    )
    return jnp.stack([x, y], axis=-1)


def bilinear_pdf(p, w):
    """PDF of sample_bilinear (sampling.hpp:106-116)."""
    x, y = p[..., 0], p[..., 1]
    total = w[..., 0] + w[..., 1] + w[..., 2] + w[..., 3]
    val = 4.0 * (
        (1 - x) * (1 - y) * w[..., 0]
        + x * (1 - y) * w[..., 1]
        + (1 - x) * y * w[..., 2]
        + x * y * w[..., 3]
    ) / jnp.maximum(total, 1e-20)
    inside = (x >= 0) & (x <= 1) & (y >= 0) & (y <= 1)
    return jnp.where(inside, jnp.where(total == 0.0, 1.0, val), 0.0)
