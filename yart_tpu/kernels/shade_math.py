"""Component-SoA shading math for the fused per-bounce shade kernel.

The MIS integrator's per-bounce tail (sampler-fed BSDF sampling, the NEE
f/pdf evaluation, MIS weights, throughput/roulette updates) is ~100 small
XLA fusions per bounce, each round-tripping wavefront arrays through HBM
(BASELINE.md round-2 profile: a >100 ms "small-op tail" on the cornell
wave). This module re-expresses that math in component form — every vector
is a tuple of (x, y, z) arrays, every quantity an array of ANY shape — so
the exact same code drives:

- an XLA reference path (`shade_kernel="xla"`, arrays shaped [N]) used for
  validation and as a safe fallback, and
- the Pallas kernel (`shade_kernel="pallas"`, arrays shaped [Bs, 128]),
  where one kernel invocation fuses the whole post-intersect bounce
  (kernels/pallas_shade.py).

Multiscatter-LUT fetches stay OUTSIDE the kernel: per-lane table lookups
inside a Mosaic kernel cost O(table-size) vector ops per lane block (no
per-lane gather on the VPU), while the proven gatherless hat-weight dots
(ops/gatherless.py) run on the MXU between the two kernel stages. The
split is:

    candidates()  -> sampled half-vectors/directions + LUT fetch coords
    run_fetches() -> batched gatherless fetches (plain XLA, MXU dots)
    finish()      -> lobe energies, one-sample pick, NEE eval, MIS,
                     throughput, roulette, state update

`candidates` + `finish` mirror render/bsdf.py (which mirrors the
reference src/bsdf/parametric.cpp) op-for-op; tests/test_shade_kernel.py
asserts numeric equivalence against the bsdf.py path lane-by-lane, and
the integrator-level test asserts image equivalence.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from yart_tpu.ops import lut

PI = float(jnp.pi)

# Scatter flags (render/bsdf.py, src/core/bsdf.hpp:21-29)
ABSORBED = 0
EMITTED = 1
REFLECTED = 2
TRANSMITTED = 4
DIFFUSE = 8
GLOSSY = 16
SPECULAR = 32

SMOOTH_ALPHA = 1e-3
ALPHA_FLOOR = 1e-4  # = ops/ggx.py ALPHA_FLOOR (reverse-mode guard)


# ---------------------------------------------------------------------------
# Component-vector helpers: a "v3" is a tuple (x, y, z) of same-shape arrays.
# ---------------------------------------------------------------------------


def v3(x, y, z):
    return (x, y, z)


def vsplat(s):
    return (s, s, s)


def vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def vmul(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def vscale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def vneg(a):
    return (-a[0], -a[1], -a[2])


def vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def vcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def vwhere(c, a, b):
    return (
        jnp.where(c, a[0], b[0]),
        jnp.where(c, a[1], b[1]),
        jnp.where(c, a[2], b[2]),
    )


def vnormalize(a):
    """Matches ops/vecmath.normalize (0 for zero-length, masked rsqrt)."""
    n2 = vdot(a, a)
    pos = n2 > 0
    inv = jnp.where(pos, jnp.float32(1.0) / jnp.sqrt(jnp.where(pos, n2, 1.0)), 0.0)
    return vscale(a, inv)


def safe_sqrt(x):
    """ops/vecmath.safe_sqrt: sqrt(max(x, 0)) with finite grad at x <= 0."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def vmirror(a):
    """(-x, -y, z) — mirror about the local normal."""
    return (-a[0], -a[1], a[2])


def reflect_about(wo, wm):
    """-wo + 2 (wo.wm) wm."""
    d2 = 2.0 * vdot(wo, wm)
    return vsub(vscale(wm, d2), wo)


# ---------------------------------------------------------------------------
# Frames (ops/vecmath.py frame_from_normal[_tangent], shading_tangent)
# ---------------------------------------------------------------------------


def shading_tangent(n):
    """tg = normalize(cross(n, +Y)); +X fallback near the Y poles
    (src/cpu/ray-integrator.cpp:72-77)."""
    tg = vnormalize(vcross(n, (jnp.zeros_like(n[0]), jnp.ones_like(n[0]),
                               jnp.zeros_like(n[0]))))
    degen = jnp.abs(n[1]) > 0.999
    one = jnp.ones_like(n[0])
    zero = jnp.zeros_like(n[0])
    return vwhere(degen, (one, zero, zero), tg)


def frame_from_normal(n):
    """(x, y, z=n) from the normal alone (frame.hpp:27-32)."""
    one = jnp.ones_like(n[0])
    zero = jnp.zeros_like(n[0])
    big = jnp.abs(n[0]) > 0.5
    a = vwhere(big, (zero, one, zero), (one, zero, zero))
    y = vnormalize(vcross(n, a))
    x = vcross(n, y)
    return x, y, n


def frame_from_normal_tangent(n, t, handedness=None):
    """Basis with degenerate-tangent fallback (frame.hpp:34-50)."""
    fx, fy, fz = frame_from_normal(n)
    y = vnormalize(vcross(n, t))
    if handedness is not None:
        y = vscale(y, handedness)
    x = vcross(y, n)
    degen = jnp.abs(vdot(t, n)) > 0.9
    return vwhere(degen, fx, x), vwhere(degen, fy, y), n


def world_to_local(v, fx, fy, fz):
    return (vdot(v, fx), vdot(v, fy), vdot(v, fz))


def local_to_world(v, fx, fy, fz):
    return (
        v[0] * fx[0] + v[1] * fy[0] + v[2] * fz[0],
        v[0] * fx[1] + v[1] * fy[1] + v[2] * fz[1],
        v[0] * fx[2] + v[1] * fy[2] + v[2] * fz[2],
    )


def rot_z(v, angle):
    """Rotate xy about +z (anisotropy rotation, parametric.cpp:50-51)."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    return (c * v[0] - s * v[1], s * v[0] + c * v[1], v[2])


# ---------------------------------------------------------------------------
# GGX in component form (ops/ggx.py semantics, bsdf.hpp:175-291)
# ---------------------------------------------------------------------------


def make_alphas(roughness, anisotropic):
    alpha = roughness * roughness
    if anisotropic is None:
        return alpha, alpha
    aspect = jnp.sqrt(1.0 - 0.9 * anisotropic)
    return alpha / aspect, alpha * aspect


def ggx_smooth(ax, ay):
    return (ax < SMOOTH_ALPHA) & (ay < SMOOTH_ALPHA)


def _phi_terms(w):
    cos2t = w[2] * w[2]
    sin2t = jnp.maximum(0.0, 1.0 - cos2t)
    # ops/ggx.py _phi_terms: divisor masked below 1e-20 (reverse-mode inf).
    safe = jnp.where(sin2t > 1e-20, sin2t, 1.0)
    z = sin2t == 0.0
    cos2p = jnp.where(z, 1.0, w[0] * w[0] / safe)
    sin2p = jnp.where(z, 0.0, w[1] * w[1] / safe)
    return cos2t, sin2t, cos2p, sin2p


def ggx_mdf(ax, ay, w):
    cos2t, sin2t, cos2p, sin2p = _phi_terms(w)
    ok = cos2t > 1e-12
    tan2t = jnp.where(ok, sin2t, 0.0) / jnp.where(ok, cos2t, 1.0)
    cos4t = jnp.where(ok, cos2t * cos2t, 1.0)
    # Alpha floor = ops/ggx.py ALPHA_FLOOR (reverse-mode guard: without it
    # a roughness-0 lane's masked-out 1/alpha^2 = inf NaNs the backward).
    ax = jnp.maximum(ax, ALPHA_FLOOR)
    ay = jnp.maximum(ay, ALPHA_FLOOR)
    k = tan2t * (cos2p / (ax * ax) + sin2p / (ay * ay))
    k2 = (1.0 + k) * (1.0 + k)
    d = 1.0 / (PI * ax * ay * cos4t * k2)
    return jnp.where(ok, d, 0.0)


def ggx_lambda(ax, ay, w):
    cos2t, sin2t, cos2p, sin2p = _phi_terms(w)
    ok = cos2t > 1e-12
    tan2t = jnp.where(ok, sin2t, 0.0) / jnp.where(ok, cos2t, 1.0)
    alpha2 = ax * ax * cos2p + ay * ay * sin2p
    lam = (jnp.sqrt(1.0 + alpha2 * tan2t) - 1.0) * 0.5
    return jnp.where(ok, lam, 1e20)


def ggx_g1(ax, ay, w):
    return 1.0 / (1.0 + ggx_lambda(ax, ay, w))


def ggx_g(ax, ay, wo, wi):
    return 1.0 / (1.0 + ggx_lambda(ax, ay, wo) + ggx_lambda(ax, ay, wi))


def ggx_vmdf(ax, ay, w, wm):
    return (
        ggx_g1(ax, ay, w)
        / jnp.maximum(jnp.abs(w[2]), 1e-20)
        * ggx_mdf(ax, ay, wm)
        * jnp.abs(vdot(w, wm))
    )


def sample_disk_uniform(u0, u1):
    r = jnp.sqrt(u0)
    theta = 2.0 * PI * u1
    return r * jnp.cos(theta), r * jnp.sin(theta)


def sample_cosine_hemisphere(u0, u1):
    phi = u0 * 2.0 * PI
    sqrt_r2 = jnp.sqrt(u1)
    x = jnp.cos(phi) * sqrt_r2
    y = jnp.sin(phi) * sqrt_r2
    z = safe_sqrt(1.0 - u1)
    return (x, y, z)


def sample_visible(ax, ay, w, u0, u1):
    """Heitz VNDF sampling (ops/ggx.py sample_visible, bsdf.hpp:243-271)."""
    ax = jnp.maximum(ax, ALPHA_FLOOR)  # reverse-mode guard (ggx_mdf note)
    ay = jnp.maximum(ay, ALPHA_FLOOR)
    wh = vnormalize((ax * w[0], ay * w[1], w[2]))
    wh = vwhere(wh[2] < 0.0, vneg(wh), wh)

    one = jnp.ones_like(wh[0])
    zero = jnp.zeros_like(wh[0])
    b_raw = vnormalize(vcross((zero, zero, one), wh))
    b = vwhere(wh[2] < 0.9999, b_raw, (one, zero, zero))
    t = vcross(wh, b)

    px, py0 = sample_disk_uniform(u0, u1)
    h = safe_sqrt(1.0 - px * px)
    mix = 0.5 * wh[2] + 0.5
    py = h + (py0 - h) * mix
    pz = safe_sqrt(1.0 - px * px - py * py)
    nh = vadd(vadd(vscale(b, px), vscale(t, py)), vscale(wh, pz))
    return vnormalize((ax * nh[0], ay * nh[1], jnp.maximum(1e-6, nh[2])))


# ---------------------------------------------------------------------------
# Fresnel (ops/vecmath.py semantics)
# ---------------------------------------------------------------------------

EPS = 1e-20


def fresnel_dielectric(cos_theta, ior):
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


def fresnel_schlick3(f0, cos_theta):
    """Schlick over an rgb f0 v3 (ops/vecmath.fresnel_schlick: no clip)."""
    m = 1.0 - cos_theta
    m5 = (m * m) * (m * m) * m
    return (
        f0[0] + (1.0 - f0[0]) * m5,
        f0[1] + (1.0 - f0[1]) * m5,
        f0[2] + (1.0 - f0[2]) * m5,
    )


def refract(wi, n, ior):
    """ops/vecmath.refract in component form; returns (wt, tir)."""
    cos_theta = vdot(wi, n)
    below = cos_theta < 0.0
    eta = jnp.where(below, 1.0 / ior, ior)
    cos_theta = jnp.abs(cos_theta)
    nn = vwhere(below, vneg(n), n)
    sin2 = jnp.maximum(0.0, 1.0 - cos_theta * cos_theta)
    sin2_t = sin2 / (eta * eta)
    tir = sin2_t >= 1.0
    cos_t = safe_sqrt(1.0 - sin2_t)
    wt = vadd(vscale(vneg(wi), 1.0 / eta), vscale(nn, cos_theta / eta - cos_t))
    return wt, tir


def _outward(wm):
    """render/bsdf.py _outward: normalize + flip up; ok = |wm|^2 > 1e-20."""
    n2 = vdot(wm, wm)
    ok = n2 > 1e-20
    n2m = jnp.where(ok, n2, 1.0)
    w = vscale(wm, jnp.where(ok, 1.0 / jnp.sqrt(n2m), 0.0))
    w = vwhere(w[2] < 0.0, vneg(w), w)
    return w, ok


def _safe_div(a, b, eps=1e-20):
    """render/bsdf.py _safe_div: clamped branch stop-gradiented so reverse
    mode stays finite (0-cotangent * overflowing -a/b^2 = NaN)."""
    import jax

    small = jnp.abs(b) < eps
    bb = jnp.where(small, jnp.where(b < 0, -eps, eps), b)
    bb = jnp.where(small, jax.lax.stop_gradient(bb), bb)
    return a / bb


def _favg_fit(ior):
    return (ior - 1.0) / (4.08567 + 1.00071 * ior)


def roughen(r):
    """Path-regularization roughening (src/core/bsdf.hpp:16-18)."""
    return jnp.maximum(r, jnp.clip(r * 2.0, 0.1, 0.3))


# ---------------------------------------------------------------------------
# Stage 1: candidates + fetch coordinates
# ---------------------------------------------------------------------------


def candidates(inp, gates):
    """Frames, sampled half-vectors, candidate directions and LUT fetch
    coordinates for one bounce.

    `inp` is a dict of same-shape component arrays (see pallas_shade.py for
    the packing); `gates` = (use_metal, use_diel, use_coat, use_aniso)
    static bools (SceneMeta lobe gates). Pure elementwise math — runs on
    [N] lanes (XLA mode) or [Bs, 128] blocks (inside the Pallas kernel).

    Mirrors render/bsdf.py bsdf_sample's direction phase
    (parametric.cpp:179-258) plus the NEE local-frame transform.
    """
    use_metal, use_diel, use_coat, use_aniso = gates
    n = inp["n"]
    d = inp["d"]
    rough = inp["roughness"]
    ccr = inp["cc_roughness"]
    u0, u1 = inp["u0"], inp["u1"]

    tg = shading_tangent(n)
    fx, fy, fz = frame_from_normal_tangent(n, tg)
    wo = world_to_local(vneg(d), fx, fy, fz)

    regularized = inp["acc_rough"] > inp["reg_threshold"]
    if "force_reg" in inp:
        # Specular-chain regularization (cfg.regularize_specular): the
        # integrator pre-computes the per-lane gate from its spec_depth
        # counter (XLA shade mode only; render/integrator.py).
        regularized = regularized | inp["force_reg"]
    r_s = jnp.where(regularized, roughen(rough), rough)

    wo_r = rot_z(wo, -inp["aniso_rotation"]) if use_aniso else wo
    ax, ay = make_alphas(r_s, inp["anisotropic"] if use_aniso else None)
    smooth = ggx_smooth(ax, ay)
    wm = sample_visible(ax, ay, wo_r, u0, u1)

    # Candidate directions (shared across lobes; parametric.cpp reflects
    # about the SAME VNDF half-vector for metal/glossy/dielectric).
    wi_g = reflect_about(wo_r, wm)
    wi_d = sample_cosine_hemisphere(u0, u1)
    wi_d = vwhere(wo_r[2] < 0.0, vneg(wi_d), wi_d)

    # NEE direction in the local (and rotated) frame.
    wi_l = world_to_local(inp["ls_wi"], fx, fy, fz)
    wi_l_r = rot_z(wi_l, -inp["aniso_rotation"]) if use_aniso else wi_l

    out = dict(
        frame=(fx, fy, fz), wo=wo, wo_r=wo_r, wm=wm, smooth=smooth,
        ax=ax, ay=ay, r_s=r_s, wi_g=wi_g, wi_d=wi_d, wi_l=wi_l,
        wi_l_r=wi_l_r, regularized=regularized,
    )

    ior = inp["ior"]
    r0 = (1.0 - ior) / (1.0 + ior)
    f0 = r0 * r0
    out["f0"] = f0

    cos_o = wo_r[2]
    cos_o_abs = jnp.abs(cos_o)
    r_raw = rough

    coords = {
        # glossy sample (RAW sign-carrying cosines: the reference's
        # backside LUT extrapolation, ops/gatherless.ref_lerp_weights)
        "eavg_s": ("eavg", r_s),
        "e_o_s_raw": ("e", cos_o, r_s),
        "e_i_g": ("e", wi_g[2], r_s),
        "base_e_o_s": ("base_e", f0, r_s, cos_o),
        "base_e_i_d": ("base_e", f0, r_s, wi_d[2]),
        "base_eavg_s": ("base_eavg", f0, r_s),
        # NEE f/pdf eval (abs cosines, unroughened r)
        "eavg_raw": ("eavg", r_raw),
        "e_o_abs_raw": ("e", cos_o_abs, r_raw),
        "e_i_l_abs": ("e", jnp.abs(wi_l_r[2]), r_raw),
        "base_e_o_abs": ("base_e", f0, r_raw, cos_o_abs),
        "base_e_i_l": ("base_e", f0, r_raw, jnp.abs(wi_l_r[2])),
        "base_eavg_raw": ("base_eavg", f0, r_raw),
    }
    if use_metal:
        coords["e_o_abs_s"] = ("e", cos_o_abs, r_s)
    if use_diel:
        ior_rel = jnp.where(inp["thin"] | (wo_r[2] > 0.0), ior, 1.0 / ior)
        coords["glass_e_s"] = ("glass_e", ior_rel, r_s, cos_o_abs)
        out["ior_rel"] = ior_rel
        # NEE eval ior selection (parametric.cpp:354-363)
        is_refl = cos_o * wi_l_r[2] > 0.0
        ior_f = jnp.where(is_refl, 1.0, jnp.where(cos_o > 0.0, ior, 1.0 / ior))
        coords["glass_e_f"] = ("glass_e", ior_f, r_raw, cos_o_abs)
    if use_coat:
        cr_s = jnp.where(regularized, roughen(ccr), ccr)
        acx, acy = make_alphas(cr_s, None)
        wm_coat = sample_visible(acx, acy, wo, u0, u1)
        out["cr_s"] = cr_s
        out["ac"] = (acx, acy)
        out["wm_coat"] = wm_coat
        coords["eavg_c"] = ("eavg", cr_s)
        coords["e_o_c"] = (
            "e", jnp.clip(jnp.abs(vdot(wo, wm_coat)), 0.0, 1.0), cr_s,
        )
    out["coords"] = coords
    return out


def run_fetches(tables, coords):
    """Batched gatherless LUT fetches (plain XLA; ops/lut.py fetchers on the
    MXU). Queries of the same kind are stacked into ONE hat-weight dot so a
    full bounce costs 5 dot chains instead of ~15."""
    by_kind = {}
    for name, q in coords.items():
        by_kind.setdefault(q[0], []).append((name, q[1:]))
    out = {}
    for kind, items in by_kind.items():
        names = [n for n, _ in items]
        args = [jnp.stack([a[i] for _, a in items], axis=0)
                for i in range(len(items[0][1]))]
        if kind == "eavg":
            vals = lut.ggx_eavg(tables, args[0])
        elif kind == "e":
            vals = lut.ggx_e(tables, args[0], args[1])  # (cos, r)
        elif kind == "base_e":
            vals = lut.ggx_base_e(tables, args[0], args[1], args[2])
        elif kind == "base_eavg":
            vals = lut.ggx_base_eavg(tables, args[0], args[1])
        elif kind == "glass_e":
            vals = lut.ggx_glass_e(tables, args[0], args[1], args[2])
        else:  # pragma: no cover
            raise ValueError(kind)
        for i, name in enumerate(names):
            out[name] = vals[i]
    return out


# ---------------------------------------------------------------------------
# Lobe samples (component transliteration of render/bsdf.py _sample_*)
# ---------------------------------------------------------------------------


def _mk(flags, f, Le, wi, pdf, roughness):
    return dict(flags=flags, f=f, Le=Le, wi=wi, pdf=pdf, roughness=roughness)


def _sample_metallic_c(inp, cand, fet):
    """(parametric.cpp:307-352)"""
    wo, wm = cand["wo_r"], cand["wm"]
    ax, ay = cand["ax"], cand["ay"]
    smooth = cand["smooth"]
    base = inp["base"]

    wi_s = vmirror(wo)
    f_s = vscale(
        fresnel_schlick3(base, wo[2]),
        1.0 / jnp.maximum(jnp.abs(wo[2]), 1e-12),
    )

    wi = cand["wi_g"]
    valid = wo[2] * wi[2] >= 0.0
    pdf = ggx_vmdf(ax, ay, wo, wm) / jnp.maximum(4 * jnp.abs(vdot(wo, wm)), 1e-12)
    cos_o = jnp.abs(wo[2])
    cos_i = jnp.abs(wi[2])
    fss = fresnel_schlick3(base, jnp.abs(vdot(wo, wm)))
    m_scalar = ggx_mdf(ax, ay, wm) * ggx_g(ax, ay, wo, wi) / jnp.maximum(
        4 * cos_o * cos_i, 1e-12
    )
    mss = vscale(fss, m_scalar)
    ess = jnp.maximum(fet["e_o_abs_s"], 1e-4)
    ms_gain = (1.0 - ess) / ess
    f = vmul(mss, vadd(vsplat(jnp.ones_like(ess)), vscale(base, ms_gain)))

    zero3 = vsplat(jnp.zeros_like(ess))
    flags_r = jnp.where(valid, REFLECTED | GLOSSY, ABSORBED)
    return _mk(
        flags=jnp.where(smooth, REFLECTED | SPECULAR, flags_r).astype(jnp.int32),
        f=vwhere(smooth, f_s, vwhere(valid, f, zero3)),
        Le=zero3,
        wi=vwhere(smooth, wi_s, wi),
        pdf=jnp.where(smooth, 1.0, pdf),
        roughness=jnp.where(smooth, 0.0, inp["roughness_base"]),
    )


def _sample_dielectric_c(inp, cand, fet):
    """(parametric.cpp:462-575)"""
    wo, wm = cand["wo_r"], cand["wm"]
    ax, ay = cand["ax"], cand["ay"]
    smooth = cand["smooth"]
    base = inp["base"]
    thin = inp["thin"]
    ior = inp["ior"]
    uc = inp["uc"]
    ior_rel = cand["ior_rel"]
    one = jnp.ones_like(ior)
    zero = jnp.zeros_like(ior)

    # ---- smooth (delta) case ----
    f_spec = fresnel_dielectric(jnp.abs(wo[2]), ior_rel)
    refl_s = uc < f_spec
    wi_s_refl = vmirror(wo)
    wi_s_refr, tir_s = refract(wo, (zero, zero, one), ior)
    wi_s_refr = vwhere(thin, vneg(wo), wi_s_refr)
    # Boolean algebra instead of where(mask, False, b): Mosaic cannot
    # truncate the scalar literal to i1.
    tir_s = tir_s & jnp.logical_not(thin)
    wi_s = vwhere(refl_s, wi_s_refl, wi_s_refr)
    t_spec = 1.0 - f_spec
    f_s = vwhere(
        refl_s,
        vsplat(f_spec / jnp.maximum(jnp.abs(wi_s_refl[2]), 1e-12)),
        vscale(base, t_spec / jnp.maximum(jnp.abs(wi_s_refr[2]), 1e-12)),
    )
    pdf_s = jnp.where(refl_s, f_spec, t_spec)
    flags_s = jnp.where(
        refl_s,
        REFLECTED | SPECULAR,
        jnp.where(tir_s, ABSORBED, TRANSMITTED | SPECULAR),
    )

    # ---- rough case ----
    fss = fresnel_dielectric(jnp.abs(vdot(wo, wm)), ior_rel)
    cos_o = jnp.abs(wo[2])
    e_o = jnp.maximum(fet["glass_e_s"], 1e-4)
    refl = uc < fss
    dot_wo_wm = vdot(wo, wm)
    vm = ggx_vmdf(ax, ay, wo, wm) / jnp.maximum(4 * jnp.abs(dot_wo_wm), 1e-12)

    # reflection branch
    wi_r = cand["wi_g"]
    ok_r = wo[2] * wi_r[2] >= 0.0
    cos_i_r = jnp.abs(wi_r[2])
    mss_r = ggx_mdf(ax, ay, wm) * ggx_g(ax, ay, wo, wi_r) / jnp.maximum(
        4 * cos_o * cos_i_r, 1e-12
    )
    f_r = vsplat(fss * mss_r / e_o)
    pdf_r = vm * fss

    # thin transmission branch: reflect(wo, wm) * (1, 1, -1)
    wi_thin = (wi_r[0], wi_r[1], -wi_r[2])
    cos_i_t = jnp.abs(wi_thin[2])
    tss_thin = ggx_mdf(ax, ay, wm) * ggx_g(ax, ay, wo, wi_thin) / jnp.maximum(
        4 * cos_o * cos_i_t, 1e-12
    )
    f_thin = vscale(base, (1.0 - fss) * tss_thin / e_o)
    pdf_thin = vm * (1.0 - fss)

    # full refraction branch
    wi_t, tir = refract(wo, wm, ior)
    bad_t = tir | (wo[2] * wi_t[2] > 0.0) | (wi_t[2] == 0.0)
    dot_wi_wm = vdot(wi_t, wm)
    temp = dot_wi_wm * ior_rel + dot_wo_wm
    dwm_dwi = jnp.abs(dot_wi_wm) / jnp.maximum(temp * temp, 1e-12)
    pdf_t = ggx_vmdf(ax, ay, wo, wm) * dwm_dwi * (1.0 - fss)
    tss = ggx_mdf(ax, ay, wm) * ggx_g(ax, ay, wo, wi_t) * jnp.abs(
        _safe_div(dot_wi_wm * dot_wo_wm, wi_t[2] * wo[2] * temp * temp)
    )
    f_t = vscale(base, (1.0 - fss) * tss / e_o)

    use_thin = ~refl & thin
    wi_rough = vwhere(refl, wi_r, vwhere(use_thin, wi_thin, wi_t))
    f_rough = vwhere(refl, f_r, vwhere(use_thin, f_thin, f_t))
    pdf_rough = jnp.where(refl, pdf_r, jnp.where(use_thin, pdf_thin, pdf_t))
    flags_rough = jnp.where(
        refl,
        jnp.where(ok_r, REFLECTED | GLOSSY, ABSORBED),
        jnp.where(
            use_thin,
            TRANSMITTED | GLOSSY,
            jnp.where(bad_t, ABSORBED, TRANSMITTED | GLOSSY),
        ),
    )

    return _mk(
        flags=jnp.where(smooth, flags_s, flags_rough).astype(jnp.int32),
        f=vwhere(smooth, f_s, f_rough),
        Le=vsplat(zero),
        wi=vwhere(smooth, wi_s, wi_rough),
        pdf=jnp.where(smooth, pdf_s, pdf_rough),
        roughness=jnp.where(smooth, 0.0, cand["r_s"]),
    )


def _sample_glossy_c(inp, cand, fet):
    """(parametric.cpp:648-730)"""
    wo, wm = cand["wo_r"], cand["wm"]
    ax, ay = cand["ax"], cand["ay"]
    smooth = cand["smooth"]
    base = inp["base"]
    ior = inp["ior"]
    uc = inp["uc"]
    emission = inp["emission"]

    cos_o = wo[2]
    favg = _favg_fit(ior)
    eavg = fet["eavg_s"]
    fms = favg * favg * eavg / jnp.maximum(1.0 - favg * (1.0 - eavg), 1e-6)
    e_o = fet["e_o_s_raw"]  # RAW sign-carrying cosine (backside extrapolation)
    kappa = 1.0 - (favg * e_o + fms * (1.0 - e_o))

    sel_diffuse = uc < kappa

    # ---- diffuse branch ----
    wi_d = cand["wi_d"]
    cos_i_d = wi_d[2]
    e_wo = fet["base_e_o_s"]
    e_wi = fet["base_e_i_d"]
    eavg_b = fet["base_eavg_s"]
    c_diffuse = (1.0 - e_wo) * (1.0 - e_wi) / jnp.maximum(
        PI * (1.0 - eavg_b), 1e-6
    )
    f_d = vscale(base, c_diffuse)
    pdf_d = jnp.abs(cos_i_d) * c_diffuse
    emissive = vdot(emission, emission) > 0.0
    flags_d = jnp.where(
        emissive, REFLECTED | DIFFUSE | EMITTED, REFLECTED | DIFFUSE
    )

    # ---- smooth specular ----
    f_spec = fresnel_dielectric(cos_o, ior)
    wi_s = vmirror(wo)
    f_sv = vsplat(f_spec / jnp.maximum(jnp.abs(wi_s[2]), 1e-12))

    # ---- rough reflection ----
    wi_g = cand["wi_g"]
    cos_i_g = wi_g[2]
    ok_g = cos_o * cos_i_g >= 0.0
    fss = fresnel_dielectric(vdot(wo, wm), ior)
    mss = ggx_mdf(ax, ay, wm) * ggx_g(ax, ay, wo, wi_g) / jnp.maximum(
        jnp.abs(4 * cos_o * cos_i_g), 1e-12
    )
    e_i = fet["e_i_g"]
    mms = (1.0 - e_o) * (1.0 - e_i) / jnp.maximum(PI * (1.0 - eavg), 1e-6)
    f_g = vsplat(fss * mss + fms * mms)
    pdf_g = ggx_vmdf(ax, ay, wo, wm) / jnp.maximum(
        4 * jnp.abs(vdot(wo, wm)), 1e-12
    ) * fss
    flags_g = jnp.where(ok_g, REFLECTED | GLOSSY, ABSORBED)

    zero3 = vsplat(jnp.zeros_like(cos_o))
    spec_flags = jnp.where(smooth, REFLECTED | SPECULAR, flags_g)
    spec_f = vwhere(smooth, f_sv, vwhere(ok_g, f_g, zero3))
    spec_wi = vwhere(smooth, wi_s, wi_g)
    spec_pdf = jnp.where(smooth, f_spec, pdf_g)
    spec_rough = jnp.where(smooth, 0.0, cand["r_s"])

    return _mk(
        flags=jnp.where(sel_diffuse, flags_d, spec_flags).astype(jnp.int32),
        f=vwhere(sel_diffuse, f_d, spec_f),
        Le=vwhere(sel_diffuse, emission, zero3),
        wi=vwhere(sel_diffuse, wi_d, spec_wi),
        pdf=jnp.where(sel_diffuse, pdf_d, spec_pdf),
        roughness=jnp.where(sel_diffuse, 1.0, spec_rough),
    )


def _sample_clearcoat_c(inp, cand, fet):
    """(parametric.cpp:795-832)"""
    wo = cand["wo"]
    wm = cand["wm_coat"]
    acx, acy = cand["ac"]
    smooth = ggx_smooth(acx, acy)
    cos_o = wo[2]
    base = inp["base"]

    # smooth: the reference uses the MATERIAL ior here (parametric.cpp:804)
    f_spec = fresnel_dielectric(cos_o, inp["ior"])
    wi_s = vmirror(wo)
    f_sv = vsplat(f_spec / jnp.maximum(jnp.abs(wi_s[2]), 1e-12))

    wi = reflect_about(wo, wm)
    ok = cos_o * wi[2] >= 0.0
    fss = fresnel_dielectric(vdot(wo, wm), 1.5)
    mss = ggx_mdf(acx, acy, wm) * ggx_g(acx, acy, wo, wi) / jnp.maximum(
        jnp.abs(4 * cos_o * wi[2]), 1e-12
    )
    pdf = fss * ggx_vmdf(acx, acy, wo, wm) / jnp.maximum(
        4 * jnp.abs(vdot(wo, wm)), 1e-12
    )
    f = vsplat(fss * mss)
    zero3 = vsplat(jnp.zeros_like(cos_o))
    flags = jnp.where(ok, REFLECTED | GLOSSY, ABSORBED)

    return _mk(
        flags=jnp.where(smooth, REFLECTED | SPECULAR, flags).astype(jnp.int32),
        f=vwhere(smooth, f_sv, vwhere(ok, f, zero3)),
        Le=zero3,
        wi=vwhere(smooth, wi_s, wi),
        pdf=jnp.where(smooth, f_spec, pdf),
        roughness=jnp.where(smooth, 0.0, inp["cc_roughness_base"]),
    )


# ---------------------------------------------------------------------------
# NEE f / pdf evaluation (component transliteration of render/bsdf.py
# _f_* / _pdf_* at the UNROUGHENED material roughness)
# ---------------------------------------------------------------------------


def _raw_alphas(inp, use_aniso):
    return make_alphas(
        inp["roughness"], inp["anisotropic"] if use_aniso else None
    )


def _f_metallic_c(inp, cand, fet, ax, ay, wo, wi):
    """(parametric.cpp:260-286)"""
    cos_o = jnp.abs(wo[2])
    cos_i = jnp.abs(wi[2])
    wm, ok = _outward(vadd(wo, wi))
    ok = ok & (cos_o > 0) & (cos_i > 0) & ~ggx_smooth(ax, ay)

    fss = fresnel_schlick3(inp["base"], jnp.abs(vdot(wo, wm)))
    m_scalar = ggx_mdf(ax, ay, wm) * ggx_g(ax, ay, wo, wi) / jnp.maximum(
        4 * cos_o * cos_i, 1e-12
    )
    mss = vscale(fss, m_scalar)
    ess = jnp.maximum(fet["e_o_abs_raw"], 1e-4)
    mms = vscale(vmul(mss, inp["base"]), (1.0 - ess) / ess)
    zero3 = vsplat(jnp.zeros_like(cos_o))
    return vwhere(ok, vadd(mss, mms), zero3)


def _pdf_metallic_c(inp, cand, ax, ay, wo, wi):
    """(parametric.cpp:288-305)"""
    wm, ok = _outward(vadd(wo, wi))
    ok = ok & ~ggx_smooth(ax, ay)
    pdf = ggx_vmdf(ax, ay, wo, wm) / jnp.maximum(4 * jnp.abs(vdot(wo, wm)), 1e-12)
    return jnp.where(ok, pdf, 0.0)


def _f_dielectric_c(inp, cand, fet, ax, ay, wo, wi):
    """(parametric.cpp:354-414)"""
    base = inp["base"]
    thin = inp["thin"]
    cos_o = wo[2]
    cos_i = wi[2]
    is_refl = cos_o * cos_i > 0.0
    ior = jnp.where(
        is_refl, 1.0, jnp.where(cos_o > 0.0, inp["ior"], 1.0 / inp["ior"])
    )

    wm, ok = _outward(vadd(vscale(wi, ior), wo))
    ok = ok & (cos_i != 0) & (cos_o != 0) & ~ggx_smooth(ax, ay)
    ok = ok & (vdot(wm, wi) * cos_i >= 0.0) & (vdot(wm, wo) * cos_o >= 0.0)

    fss = fresnel_dielectric(jnp.abs(vdot(wo, wm)), ior)
    t = 1.0 - fss
    e_o = jnp.maximum(fet["glass_e_f"], 1e-4)

    d_g = ggx_mdf(ax, ay, wm) * ggx_g(ax, ay, wo, wi)

    f_refl = fss * d_g / jnp.maximum(jnp.abs(4 * cos_o * cos_i), 1e-12)

    # SIGNED cos_o denominator — reference quirk, see render/bsdf.py
    # _f_dielectric thin branch (parametric.cpp:399-402).
    wip = (wi[0], wi[1], -wi[2])
    wm_thin, ok_thin = _outward(vadd(wip, wo))
    cos_ip = jnp.abs(wip[2])
    tss_thin = ggx_mdf(ax, ay, wm_thin) * ggx_g(ax, ay, wo, wip) * _safe_div(
        1.0, 4 * cos_o * cos_ip, eps=1e-12
    )

    temp = vdot(wi, wm) * ior + vdot(wo, wm)
    dwm_dwi = jnp.abs(vdot(wi, wm)) * jnp.abs(vdot(wo, wm)) / jnp.maximum(
        temp * temp, 1e-12
    )
    tss = d_g * dwm_dwi / jnp.maximum(jnp.abs(cos_i * cos_o), 1e-12)

    trans_ss = jnp.where(thin, jnp.where(ok_thin, tss_thin, 0.0), tss)
    f_trans = vscale(base, t * trans_ss)

    out = vwhere(is_refl, vsplat(f_refl / e_o), vscale(f_trans, 1.0 / e_o))
    zero3 = vsplat(jnp.zeros_like(cos_o))
    return vwhere(ok, out, zero3)


def _pdf_dielectric_c(inp, cand, ax, ay, wo, wi):
    """(parametric.cpp:416-460)"""
    thin = inp["thin"]
    cos_o = wo[2]
    cos_i = wi[2]
    is_refl = cos_o * cos_i > 0.0
    ior = jnp.where(
        is_refl, 1.0, jnp.where(cos_o > 0.0, inp["ior"], 1.0 / inp["ior"])
    )

    wm, ok = _outward(vadd(vscale(wi, ior), wo))
    ok = ok & (cos_i != 0) & (cos_o != 0) & ~ggx_smooth(ax, ay)
    ok = ok & (vdot(wm, wi) * cos_i >= 0.0) & (vdot(wm, wo) * cos_o >= 0.0)

    # NOTE: signed dot and the MATERIAL ior (parametric.cpp:438-440).
    f = fresnel_dielectric(vdot(wo, wm), inp["ior"])
    t = 1.0 - f

    pdf_refl = ggx_vmdf(ax, ay, wo, wm) / jnp.maximum(
        4 * jnp.abs(vdot(wo, wm)), 1e-12
    ) * f

    wip = (wi[0], wi[1], -wi[2])
    wm_thin, _ = _outward(vadd(wip, wo))
    pdf_thin = (
        ggx_vmdf(ax, ay, wo, wm_thin)
        / jnp.maximum(4 * jnp.abs(vdot(wo, wm_thin)), 1e-12)
        * t
    )

    temp2 = vdot(wi, wm) + vdot(wo, wm) / ior
    dwm_dwi2 = jnp.abs(vdot(wo, wm)) / jnp.maximum(temp2 * temp2, 1e-12)
    pdf_refr = ggx_vmdf(ax, ay, wo, wm) * dwm_dwi2 * t

    pdf = jnp.where(is_refl, pdf_refl, jnp.where(thin, pdf_thin, pdf_refr))
    return jnp.where(ok, pdf, 0.0)


def _glossy_diffuse_factor_eval(fet):
    return (1.0 - fet["base_e_o_abs"]) * (1.0 - fet["base_e_i_l"]) / jnp.maximum(
        PI * (1.0 - fet["base_eavg_raw"]), 1e-6
    )


def _f_glossy_c(inp, cand, fet, ax, ay, wo, wi):
    """(parametric.cpp:577-617)"""
    cos_o = jnp.abs(wo[2])
    cos_i = jnp.abs(wi[2])
    wm, ok = _outward(vadd(wo, wi))
    ok = ok & (cos_o > 0) & (cos_i > 0)
    rough_ok = ok & ~ggx_smooth(ax, ay)

    ior = inp["ior"]
    fss = fresnel_dielectric(vdot(wo, wm), ior)
    mss = ggx_mdf(ax, ay, wm) * ggx_g(ax, ay, wo, wi) / jnp.maximum(
        4 * cos_o * cos_i, 1e-12
    )

    favg = _favg_fit(ior)
    eavg = fet["eavg_raw"]
    e_o = fet["e_o_abs_raw"]
    e_i = fet["e_i_l_abs"]
    mms = (1.0 - e_o) * (1.0 - e_i) / jnp.maximum(PI * (1.0 - eavg), 1e-6)
    fms = favg * favg * eavg / jnp.maximum(1.0 - favg * (1.0 - eavg), 1e-6)

    c_diffuse = _glossy_diffuse_factor_eval(fet)
    diffuse = vscale(inp["base"], c_diffuse)

    spec = jnp.where(rough_ok, fss * mss + mms * fms, 0.0)
    out = vadd(vsplat(spec), diffuse)
    zero3 = vsplat(jnp.zeros_like(cos_o))
    return vwhere(ok, out, zero3)


def _pdf_glossy_c(inp, cand, fet, ax, ay, wo, wi):
    """(parametric.cpp:619-645)"""
    cos_i = jnp.abs(wi[2])
    wm, ok = _outward(vadd(wo, wi))

    ior = inp["ior"]
    fss = fresnel_dielectric(vdot(wo, wm), ior)
    favg = _favg_fit(ior)
    eavg = fet["eavg_raw"]
    fms = favg * favg * eavg / jnp.maximum(1.0 - favg * (1.0 - eavg), 1e-6)
    e_o = fet["e_o_abs_raw"]
    kappa = 1.0 - (favg * e_o + fms * (1.0 - e_o))

    spec_pdf = (fss + fms) * ggx_vmdf(ax, ay, wo, wm) / jnp.maximum(
        4 * jnp.abs(vdot(wo, wm)), 1e-12
    )
    spec_pdf = jnp.where(ok & ~ggx_smooth(ax, ay), spec_pdf, 0.0)
    return spec_pdf + cos_i * kappa


def _f_clearcoat_c(inp, acx, acy, wo, wi):
    """(parametric.cpp:732-766); returns (f_scalar, Fc)."""
    cos_o = jnp.abs(wo[2])
    cos_i = jnp.abs(wi[2])
    wm, ok = _outward(vadd(wo, wi))
    ok = ok & (cos_o > 0) & (cos_i > 0) & ~ggx_smooth(acx, acy)

    fss = fresnel_dielectric(vdot(wo, wm), 1.5)
    mss = ggx_mdf(acx, acy, wm) * ggx_g(acx, acy, wo, wi) / jnp.maximum(
        4 * cos_o * cos_i, 1e-12
    )
    fc = jnp.maximum(
        fresnel_dielectric(cos_o, 1.5), fresnel_dielectric(cos_i, 1.5)
    )
    return jnp.where(ok, fss * mss, 0.0), fc


def _pdf_clearcoat_c(inp, acx, acy, wo, wi):
    """(parametric.cpp:768-793); returns (pdf, Fc)."""
    wm, ok = _outward(vadd(wo, wi))
    ok = ok & ~ggx_smooth(acx, acy)
    fss = fresnel_dielectric(vdot(wo, wm), 1.5)
    pdf = fss * ggx_vmdf(acx, acy, wo, wm) / jnp.maximum(
        4 * jnp.abs(vdot(wo, wm)), 1e-12
    )
    fc = jnp.maximum(
        fresnel_dielectric(jnp.abs(wo[2]), 1.5),
        fresnel_dielectric(jnp.abs(wi[2]), 1.5),
    )
    return jnp.where(ok, pdf, 0.0), fc


def bsdf_f_c(inp, cand, fet, gates):
    """Full layered f at (wo_r, wi_l_r) — render/bsdf.py bsdf_f."""
    use_metal, use_diel, use_coat, use_aniso = gates
    ax, ay = _raw_alphas(inp, use_aniso)
    wo, wi = cand["wo_r"], cand["wi_l_r"]

    metallic = inp["metallic"]
    trans = inp["transmission"]
    c_metal = metallic
    c_diel = (1.0 - metallic) * trans
    c_glossy = (1.0 - metallic) * (1.0 - trans)

    val = vscale(_f_glossy_c(inp, cand, fet, ax, ay, wo, wi), c_glossy)
    if use_metal:
        val = vadd(val, vscale(_f_metallic_c(inp, cand, fet, ax, ay, wo, wi), c_metal))
    if use_diel:
        val = vadd(val, vscale(_f_dielectric_c(inp, cand, fet, ax, ay, wo, wi), c_diel))

    if use_coat:
        accx, accy = make_alphas(inp["cc_roughness"], None)
        # clearcoat evaluates UNROTATED in bsdf.py? No: bsdf_f rotates wo/wi
        # once and feeds every lobe the rotated pair (render/bsdf.py:427-444).
        f_coat, fc = _f_clearcoat_c(inp, accx, accy, wo, wi)
        c = inp["clearcoat"]
        val = vadd(vscale(val, 1.0 - c * fc), vsplat(c * f_coat))
    return val


def bsdf_pdf_c(inp, cand, fet, gates):
    """Full layered pdf — render/bsdf.py bsdf_pdf. UNROTATED directions:
    the reference's pdfImpl skips the anisotropy rotation (its quirk;
    see bsdf.py bsdf_pdf)."""
    use_metal, use_diel, use_coat, use_aniso = gates
    ax, ay = _raw_alphas(inp, use_aniso)
    wo, wi = cand["wo"], cand["wi_l"]

    metallic = inp["metallic"]
    trans = inp["transmission"]
    p_metal = metallic
    p_diel = (1.0 - metallic) * trans
    p_glossy = (1.0 - metallic) * (1.0 - trans)

    pdf = p_glossy * _pdf_glossy_c(inp, cand, fet, ax, ay, wo, wi)
    if use_metal:
        pdf += p_metal * _pdf_metallic_c(inp, cand, ax, ay, wo, wi)
    if use_diel:
        pdf += p_diel * _pdf_dielectric_c(inp, cand, ax, ay, wo, wi)

    if use_coat:
        accx, accy = make_alphas(inp["cc_roughness"], None)
        pdf_coat, fc = _pdf_clearcoat_c(inp, accx, accy, wo, wi)
        c = inp["clearcoat"]
        pdf = (1.0 - c * fc) * pdf + c * pdf_coat
    return pdf


def bsdf_sample_c(inp, cand, fet, gates):
    """One-sample layered BSDF sample — render/bsdf.py bsdf_sample
    (parametric.cpp:179-258). Returns the picked sample dict with wi in the
    LOCAL (unrotated) frame."""
    use_metal, use_diel, use_coat, use_aniso = gates
    uc2 = inp["uc2"]
    n0 = inp["metallic"]  # shape donor
    zero = jnp.zeros_like(n0)

    if use_coat:
        favg15 = _favg_fit(1.5)
        eavg_c = fet["eavg_c"]
        fms_c = favg15 * favg15 * eavg_c / jnp.maximum(
            1.0 - favg15 * (1.0 - eavg_c), 1e-6
        )
        e_o_c = fet["e_o_c"]
        kappa_c = 1.0 - (favg15 * e_o_c + fms_c * (1.0 - e_o_c))
        p_coat = inp["clearcoat"] * (1.0 - kappa_c)
    else:
        p_coat = zero

    p_metal = (1.0 - p_coat) * inp["metallic"]
    p_diel = (1.0 - p_coat) * (
        inp["metallic"] + (1.0 - inp["metallic"]) * inp["transmission"]
    )

    false_ = zero > 1.0
    sel_coat = (uc2 < p_coat) if use_coat else false_
    sel_metal = (~sel_coat & (uc2 < p_metal)) if use_metal else false_
    sel_diel = (
        (~sel_coat & ~sel_metal & (uc2 < p_diel)) if use_diel else false_
    )
    sel_glossy = ~sel_coat & ~sel_metal & ~sel_diel

    s = _sample_glossy_c(inp, cand, fet)
    glossy_le = s["Le"]
    for sel, smp in (
        (sel_diel, _sample_dielectric_c(inp, cand, fet) if use_diel else None),
        (sel_metal, _sample_metallic_c(inp, cand, fet) if use_metal else None),
        (sel_coat, _sample_clearcoat_c(inp, cand, fet) if use_coat else None),
    ):
        if smp is None:
            continue
        s = dict(
            flags=jnp.where(sel, smp["flags"], s["flags"]),
            f=vwhere(sel, smp["f"], s["f"]),
            Le=s["Le"],
            wi=vwhere(sel, smp["wi"], s["wi"]),
            pdf=jnp.where(sel, smp["pdf"], s["pdf"]),
            roughness=jnp.where(sel, smp["roughness"], s["roughness"]),
        )
    zero3 = vsplat(zero)
    s["Le"] = vwhere(sel_glossy, glossy_le, zero3)

    # un-rotate base-lobe wi (parametric.cpp:254-255); clearcoat unrotated.
    if use_aniso:
        wi_unrot = rot_z(s["wi"], inp["aniso_rotation"])
        s["wi"] = vwhere(sel_coat, s["wi"], wi_unrot)
    return s


# ---------------------------------------------------------------------------
# Stage 3: finish — everything between the two traversals of a bounce
# (render/integrator.py li body, mis-integrator.cpp:27-133)
# ---------------------------------------------------------------------------


def finish(inp, cand, fet, gates, mis=True, any_lights=True,
           detach=False):
    """Sample pick + emitted-MIS + NEE eval + throughput + roulette + state.

    Returns the dict of per-lane outputs the integrator consumes after the
    shadow traversal. All decisions are branchless; `mis`/`any_lights` and
    the lobe gates are static.

    `detach=True` (differentiable mode, XLA assembly only) applies the
    SAME detached-sampling cut as the classic bounce body
    (render/integrator.py): the sampled direction, its pdf, and the
    regularization roughness become constants AFTER the sample is built,
    while f and Le keep their parameter dependence — so gradients match
    the classic path (tests/test_diff.py::test_shade_xla_grads*).
    """
    frame = cand["frame"]
    n = inp["n"]
    p = inp["p"]
    d = inp["d"]
    atten = inp["atten"]
    found = inp["found"]
    zero = jnp.zeros_like(inp["last_pdf"])
    zero3 = vsplat(zero)

    smp = bsdf_sample_c(inp, cand, fet, gates)
    if detach:
        import jax

        sg = jax.lax.stop_gradient
        smp = dict(
            smp,
            wi=tuple(sg(c) for c in smp["wi"]),
            pdf=sg(smp["pdf"]),
            roughness=sg(smp["roughness"]),
        )
    flags = smp["flags"]
    wi_world = local_to_world(smp["wi"], *frame)

    # ---- emitted radiance + MIS vs the light sampler (li: emitted block) ----
    emitted = ((flags & EMITTED) != 0) & found
    if mis:
        dp = vsub(inp["last_p"], p)
        dist2 = vdot(dp, dp)
        if any_lights:
            pdf_light = (
                inp["pdf_area"]
                * dist2
                * inp["sel_p"]
                / jnp.maximum(jnp.abs(vdot(vneg(d), n)), 1e-9)
            )
        else:
            pdf_light = zero
        w_b = jnp.where(
            inp["depth0"] | inp["specular_prev"] | inp["light_neg"],
            1.0,
            inp["last_pdf"] / jnp.maximum(inp["last_pdf"] + pdf_light, 1e-20),
        )
    else:
        w_b = jnp.ones_like(zero)
    L_emit = vwhere(emitted, vscale(vmul(atten, smp["Le"]), w_b), zero3)

    scattered = ((flags & (REFLECTED | TRANSMITTED)) != 0) & found

    # ---- NEE: f/pdf at the sampled light direction + pending contrib ----
    if mis and any_lights:
        do_nee = scattered & (((flags & (EMITTED | SPECULAR))) == 0)
        f_l = bsdf_f_c(inp, cand, fet, gates)
        pdf_b = bsdf_pdf_c(inp, cand, fet, gates)
        nee_need = do_nee & inp["ls_valid"] & (vdot(f_l, f_l) > 0.0)
        to_l = vsub(inp["ls_p"], p)
        dist2_l = vdot(to_l, to_l)
        dist_l = jnp.sqrt(jnp.maximum(dist2_l, 1e-20))
        shadow_d = vscale(to_l, 1.0 / dist_l)
        shadow_tmax = jnp.where(nee_need, dist_l - 1e-3, -1.0)
        pdf_l = (
            inp["ls_select_p"]
            * inp["ls_pdf"]
            / jnp.maximum(jnp.abs(vdot(inp["ls_n"], inp["ls_wi"])), 1e-9)
        )
        pdf_l = jnp.where(inp["ls_is_env"], pdf_l, pdf_l * dist2_l)
        w_nee = jnp.abs(vdot(inp["ls_wi"], n)) / jnp.maximum(
            pdf_b + pdf_l, 1e-20
        )
        contrib = vmul(atten, vscale(vmul(inp["ls_Li"], f_l), w_nee))
    else:
        nee_need = jnp.zeros_like(found)
        shadow_d = zero3
        shadow_tmax = jnp.full_like(zero, -1.0)
        contrib = zero3

    # ---- throughput update (mis-integrator.cpp:83-96) ----
    fcos = vscale(smp["f"], jnp.abs(vdot(wi_world, n)))
    atten_new = vmul(atten, vscale(fcos, 1.0 / jnp.maximum(smp["pdf"], 1e-20)))
    vc = inp["volume_color"]
    dens = inp["volume_density"]
    vol = (
        jnp.exp((vc[0] - 1.0) * inp["hit_t"] * dens),
        jnp.exp((vc[1] - 1.0) * inp["hit_t"] * dens),
        jnp.exp((vc[2] - 1.0) * inp["hit_t"] * dens),
    )
    vol = vwhere(inp["thin"], vsplat(jnp.ones_like(zero)), vol)
    atten_new = vwhere(
        inp["hit_back"] & scattered, vmul(atten_new, vol), atten_new
    )

    active = inp["active"] & scattered
    specular = (flags & SPECULAR) != 0
    acc_rough = inp["acc_rough"] + jnp.where(scattered, smp["roughness"], 0.0)

    # ---- russian roulette (mis-integrator.cpp:98-102) ----
    if mis:
        q = jnp.maximum(
            0.0,
            1.0 - jnp.maximum(atten_new[0], jnp.maximum(atten_new[1], atten_new[2])),
        )
        if detach:
            # Detached-sampling RR: the 1/(1-q) reweight must not carry
            # parameter dependence or the gradient gains a spurious
            # f·q'/(1-q) term (see the classic body, render/integrator.py).
            q = lax.stop_gradient(q)
        rr_on = inp["rr_on"] & active
        killed = rr_on & (inp["u_rr"] < q)
        active = active & ~killed
        scale = jnp.where(
            rr_on & ~killed, 1.0 / jnp.maximum(1.0 - q, 1e-9), 1.0
        )
        atten_new = vscale(atten_new, scale)

    atten_out = vwhere(active, atten_new, atten)

    return dict(
        L_emit=L_emit,
        contrib=contrib,
        nee_need=nee_need,
        shadow_d=shadow_d,
        shadow_tmax=shadow_tmax,
        o=vwhere(active, p, inp["o"]),
        d=vwhere(active, wi_world, d),
        atten=atten_out,
        active=active,
        # Boolean algebra instead of where(): Mosaic cannot lower an
        # i1-result select_n (nor the f32->i1 truncation a mixed-dtype
        # where would insert).
        specular=(active & specular)
        | (~active & (inp["specular_prev"] != 0.0)),
        acc_rough=acc_rough,
        last_pdf=jnp.where(active, smp["pdf"], inp["last_pdf"]),
        last_p=vwhere(active, p, inp["last_p"]),
    )


# ---------------------------------------------------------------------------
# In-kernel sampler draws (ops/qmc.py ZSobol / Hash, component form)
#
# The classic bounce body draws u/uc/uc2/u_rr with per-digit one-hot S4
# permutation DOTS — ~50 tiny [N, 24] matmuls per bounce, each an XLA
# fusion boundary. Inside the kernel the packed permutation bytes are
# Python constants, so the lookup is a 24-step compare-select on registers
# and every draw is pure u32 bit math on [Bs, 128] tiles. ops/qmc.py's u64
# helpers are elementwise and reused directly; equivalence is bit-exact
# (tests/test_shade_kernel.py::test_inkernel_draws_bit_exact).
# ---------------------------------------------------------------------------


def _perm_packed_const():
    import numpy as np

    from yart_tpu.ops.qmc import _perm_table

    pt = _perm_table().reshape(24, 4).astype(np.uint32)
    packed = pt[:, 0] | (pt[:, 1] << 2) | (pt[:, 2] << 4) | (pt[:, 3] << 6)
    return tuple(int(x) for x in packed)


_PERM_PACKED = _perm_packed_const()


def zsobol_index_c(hi, lo, perm_c, n_base4_digits: int, log2spp: int):
    """sampler.hpp:155-173 _sample_index with the S4 permutation lookup as
    a constant compare-select chain. hi/lo: [.] uint32; perm_c: scalar u32."""
    from yart_tpu.ops import qmc

    U32 = jnp.uint32
    morton = qmc.U64(hi, lo)
    pow2_samples = bool(log2spp & 1)
    last_digit = 1 if pow2_samples else 0
    out_hi = jnp.zeros_like(lo)
    out_lo = jnp.zeros_like(lo)
    for i in range(n_base4_digits - 1, last_digit - 1, -1):
        digit_shift = 2 * i - last_digit
        shifted = qmc.u64_shr(morton, digit_shift)
        digit = shifted.lo & U32(3)
        higher = qmc.u64_shr(morton, digit_shift + 2)
        mixed = qmc.mix_bits64(qmc.U64(higher.hi, higher.lo ^ perm_c))
        p = qmc.u64_mod24(qmc.u64_shr(mixed, 24))
        packed = jnp.zeros_like(lo)
        for t, val in enumerate(_PERM_PACKED):
            packed = jnp.where(p == U32(t), U32(val), packed)
        digit = (packed >> (digit * U32(2))) & U32(3)
        placed = qmc.u64_shl(qmc.u64_from_u32(digit), digit_shift)
        out_hi |= placed.hi
        out_lo |= placed.lo
    if pow2_samples:
        digit = morton.lo & U32(1)
        m1 = qmc.u64_shr(morton, 1)
        mixed = qmc.mix_bits64(qmc.U64(m1.hi, m1.lo ^ perm_c))
        out_lo |= digit ^ (mixed.lo & U32(1))
    return out_hi, out_lo


def zsobol_get1d_c(hi, lo, perm_c, seed, n_base4_digits: int, log2spp: int):
    from yart_tpu.ops import qmc

    _, idx_lo = zsobol_index_c(hi, lo, perm_c, n_base4_digits, log2spp)
    v = qmc.reverse_bits32(idx_lo)
    v = qmc.scramble_fast_owen(v, seed)
    return qmc.u32_to_unit_float(v)


def zsobol_get2d_c(hi, lo, perm_c, seed_a, seed_b, n_base4_digits: int,
                   log2spp: int, matrix1: tuple):
    from yart_tpu.ops import qmc

    U32 = jnp.uint32
    idx_hi, idx_lo = zsobol_index_c(hi, lo, perm_c, n_base4_digits, log2spp)
    va = qmc.reverse_bits32(idx_lo)
    vb = jnp.zeros_like(idx_lo)
    for i in range(32):
        bit = (idx_lo >> U32(i)) & U32(1)
        vb ^= bit * U32(matrix1[i])
    for i in range(len(matrix1) - 32):
        bit = (idx_hi >> U32(i)) & U32(1)
        vb ^= bit * U32(matrix1[32 + i])
    va = qmc.scramble_fast_owen(va, seed_a)
    vb = qmc.scramble_fast_owen(vb, seed_b)
    return qmc.u32_to_unit_float(va), qmc.u32_to_unit_float(vb)


def hash_get1d_c(state, dim_const):
    """ops/qmc.py HashSampler.get1d with dim * 0xC2B2AE35 prefolded into
    the scalar dim_const."""
    from yart_tpu.ops import qmc

    return qmc.u32_to_unit_float(qmc.mix32(state ^ dim_const))
