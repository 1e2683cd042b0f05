"""Batched 3-vector math over ``[..., 3]`` float32 arrays.

TPU-first re-design of the reference math layer (yart ``src/math/vec.hpp``,
``src/math/math.hpp``, ``src/math/frame.hpp``): instead of a scalar ``vec<T,N>``
class, every op here maps elementwise over arbitrary leading batch dims so the
whole wavefront of rays is processed as dense SoA arrays on the VPU.

Reference parity notes (citations are /root/reference paths):
- reflect/refract/fresnel*: src/math/math.hpp:15-100
- spherical/octahedral UV maps: src/math/math.hpp:136-179
- orthonormal shading frames: src/math/frame.hpp:21-59
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-12


def dot(a, b, keepdims: bool = False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def absdot(a, b, keepdims: bool = False):
    return jnp.abs(dot(a, b, keepdims=keepdims))


def cross(a, b):
    return jnp.cross(a, b)


def length2(v, keepdims: bool = False):
    return jnp.sum(v * v, axis=-1, keepdims=keepdims)


def length(v, keepdims: bool = False):
    return jnp.sqrt(length2(v, keepdims=keepdims))


def normalize(v):
    """Safe normalize; returns v/|v| with 0 for zero-length inputs.

    The rsqrt argument is masked to 1 on the zero branch: evaluating
    rsqrt(0) inside the unselected where-branch makes the BACKWARD pass
    compute 0-cotangent * inf-derivative = NaN (the double-where rule)."""
    n2 = length2(v, keepdims=True)
    pos = n2 > 0
    return v * jnp.where(pos, jax_rsqrt(jnp.where(pos, n2, 1.0)), 0.0)


def safe_sqrt(x):
    """sqrt(max(x, 0)) whose gradient is 0 (not NaN) for x <= 0.

    jnp.sqrt(jnp.maximum(0.0, x)) is the NaN factory of reverse mode:
    at x <= 0 its backward is sqrt'(0) * max'(x) = inf * 0. Forward values
    are bit-identical to the max form."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def jax_rsqrt(x):
    import jax.lax as lax

    return lax.rsqrt(x)


def luma(rgb):
    """Rec.709 luma; matches estimator weighting (src/core/estimator.hpp:20-23)."""
    lw = jnp.asarray([0.2126, 0.7152, 0.0722], rgb.dtype)
    return jnp.sum(rgb * lw, axis=-1)


def max_component(v):
    return jnp.max(v, axis=-1)


def reflect(wo, n):
    """Mirror wo about n (src/math/math.hpp:15-20)."""
    return -wo + n * 2.0 * dot(wo, n, keepdims=True)


def refract(wi, n, ior):
    """Refract wi through interface with normal n and relative ior.

    Branchless port of src/math/math.hpp:22-42: if wi is below the surface
    the ior/normal/cos are flipped; returns ``(wt, tir)`` where ``tir`` marks
    total internal reflection (wt undefined there, caller must mask).

    ``ior`` may be a scalar or lane-shaped [...] (a trailing singleton axis is
    also accepted and squeezed).
    """
    ior = jnp.asarray(ior, wi.dtype)
    if ior.ndim == wi.ndim and ior.shape[-1] == 1:
        ior = ior[..., 0]
    cos_theta = dot(wi, n)  # [...]
    below = cos_theta < 0.0
    eta = jnp.where(below, 1.0 / ior, ior)  # [...]
    cos_theta = jnp.abs(cos_theta)
    n = jnp.where(below[..., None], -n, n)

    sin2 = jnp.maximum(0.0, 1.0 - cos_theta * cos_theta)
    sin2_t = sin2 / (eta * eta)
    tir = sin2_t >= 1.0

    cos_t = safe_sqrt(1.0 - sin2_t)
    wt = -wi / eta[..., None] + (cos_theta / eta - cos_t)[..., None] * n
    return wt, tir


def fresnel_dielectric(cos_theta, ior):
    """Exact dielectric Fresnel (src/math/math.hpp:44-62); handles cos<0 by
    inverting ior. Returns 1.0 under total internal reflection."""
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    below = cos_theta < 0.0
    ior = jnp.where(below, 1.0 / ior, ior)
    cos_theta = jnp.abs(cos_theta)

    sin2 = 1.0 - cos_theta * cos_theta
    sin2_t = sin2 / (ior * ior)
    tir = sin2_t >= 1.0

    cos_t = safe_sqrt(1.0 - sin2_t)
    r_prl = (ior * cos_theta - cos_t) / (ior * cos_theta + cos_t + EPS)
    r_per = (cos_theta - ior * cos_t) / (cos_theta + ior * cos_t + EPS)
    f = 0.5 * (r_prl * r_prl + r_per * r_per)
    return jnp.where(tir, 1.0, f)


def fresnel_complex(cos_theta, eta, k):
    """Conductor Fresnel with complex IOR (src/math/math.hpp:64-79)."""
    cos_theta = jnp.clip(cos_theta, 0.0, 1.0)
    ik = jax_complex(eta, k)
    sin2 = 1.0 - cos_theta * cos_theta
    sin2_t = sin2 / (ik * ik)
    cos_t = jnp.sqrt(1.0 - sin2_t)
    r_prl = (ik * cos_theta - cos_t) / (ik * cos_theta + cos_t)
    r_per = (cos_theta - ik * cos_t) / (cos_theta + ik * cos_t)
    return 0.5 * (jnp.abs(r_prl) ** 2 + jnp.abs(r_per) ** 2)


def jax_complex(re, im):
    return jnp.asarray(re, jnp.complex64) + 1j * jnp.asarray(im, jnp.complex64)


def fresnel_schlick(r0, cos_theta):
    """Schlick approximation; r0 is [...,3] or scalar (src/math/math.hpp:81-88)."""
    k = 1.0 - cos_theta
    k5 = (k * k) * (k * k) * k
    return r0 + (1.0 - r0) * k5


def spherical_uv(d):
    """Direction -> equirect UV (src/math/math.hpp:136-142)."""
    phi = jnp.arctan2(-d[..., 2], -d[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    return jnp.stack([phi / (2.0 * jnp.pi), theta / jnp.pi], axis=-1)


def inv_spherical_uv(uv):
    """Equirect UV -> direction (src/math/math.hpp:144-149)."""
    y = jnp.cos(uv[..., 1] * jnp.pi)
    r = jnp.sin(uv[..., 1] * jnp.pi)
    phi = uv[..., 0] * 2.0 * jnp.pi
    return jnp.stack([-jnp.cos(phi) * r, y, -jnp.sin(phi) * r], axis=-1)


def octahedral_uv(v):
    """Direction -> octahedral-map UV in [0,1]^2 (src/math/math.hpp:151-166).

    Env maps are stored in this projection, not equirect."""
    s = jnp.sum(jnp.abs(v), axis=-1, keepdims=True)
    v = v / jnp.maximum(s, EPS)
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    up_u, up_v = vx, vz
    lo_u = (1.0 - jnp.abs(vz)) * jnp.sign(jnp.where(vx == 0.0, 1.0, vx))
    lo_v = (1.0 - jnp.abs(vx)) * jnp.sign(jnp.where(vz == 0.0, 1.0, vz))
    u = jnp.where(vy >= 0.0, up_u, lo_u)
    w = jnp.where(vy >= 0.0, up_v, lo_v)
    return (jnp.stack([u, w], axis=-1) + 1.0) * 0.5


def inv_octahedral_uv(uv):
    """Octahedral-map UV -> unit direction (src/math/math.hpp:168-179)."""
    x = 2.0 * uv[..., 0] - 1.0
    z = 2.0 * uv[..., 1] - 1.0
    y = 1.0 - (jnp.abs(x) + jnp.abs(z))
    below = y < 0.0
    x_f = (1.0 - jnp.abs(z)) * jnp.sign(jnp.where(x == 0.0, 1.0, x))
    z_f = (1.0 - jnp.abs(x)) * jnp.sign(jnp.where(z == 0.0, 1.0, z))
    x = jnp.where(below, x_f, x)
    z = jnp.where(below, z_f, z)
    return normalize(jnp.stack([x, y, z], axis=-1))


# ---------------------------------------------------------------------------
# Orthonormal shading frames (src/math/frame.hpp:21-59)
# ---------------------------------------------------------------------------


def frame_from_normal(n):
    """Build (x, y, z=n) basis from a normal alone (Frame(n), frame.hpp:27-32)."""
    a = jnp.where(
        (jnp.abs(n[..., 0:1]) > 0.5),
        jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], n.dtype), n.shape),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], n.dtype), n.shape),
    )
    y = normalize(cross(n, a))
    x = cross(n, y)
    return x, y, n


def frame_from_normal_tangent(n, t, handedness=1.0):
    """Build basis from normal + tangent with degenerate-tangent fallback
    (Frame(n, t, handedness), frame.hpp:34-50): |t.n| > 0.9 falls back to the
    normal-only construction, else y = normalize(n x t) * handedness, x = y x n."""
    fx, fy, fz = frame_from_normal(n)
    h = jnp.asarray(handedness, n.dtype)
    if h.ndim > 0:
        h = h[..., None]
    y = normalize(cross(n, t)) * h
    x = cross(y, n)
    degen = (absdot(t, n) > 0.9)[..., None]
    return (
        jnp.where(degen, fx, x),
        jnp.where(degen, fy, y),
        n,
    )


def world_to_local(w, fx, fy, fz):
    """Frame::wtl (frame.hpp:52-54)."""
    return jnp.stack([dot(w, fx), dot(w, fy), dot(w, fz)], axis=-1)


def local_to_world(l, fx, fy, fz):
    """Frame::ltw (frame.hpp:56-58)."""
    return l[..., 0:1] * fx + l[..., 1:2] * fy + l[..., 2:3] * fz


def shading_tangent(n):
    """The integrator's shading tangent convention
    (src/cpu/ray-integrator.cpp:72-77): tg = normalize(cross(n, +Y)), falling
    back to +X when n is within 0.999 of +/-Y."""
    axis_y = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], n.dtype), n.shape)
    axis_x = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], n.dtype), n.shape)
    tg = normalize(cross(n, axis_y))
    degen = (jnp.abs(n[..., 1]) > 0.999)[..., None]
    return jnp.where(degen, axis_x, tg)
