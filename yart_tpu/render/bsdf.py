"""Parametric layered uber-BSDF, fully batched and branchless.

TPU re-design of the reference ParametricBSDF (src/bsdf/parametric.cpp):
instead of virtual dispatch + scalar branches, every lane carries resolved
material parameters and ALL lobes are evaluated with masked arithmetic — the
reference itself already mixes lobes by coefficients (parametric.cpp:111-132),
so the masked form is the same math.

Lobe structure (parametric.cpp):
- metallic:    Cook-Torrance w/ Schlick F + Turquin multiscatter comp.
- dielectric:  rough glass reflect/refract (+thin variant) / ggxGlassE comp.
- glossy:      dielectric specular + Kulla-Conty energy-conserving diffuse;
               emission is returned on diffuse samples (`EMITTED` flag).
- clearcoat:   fixed IOR 1.5 GGX reflection layered on top with
               Fresnel-weighted attenuation (1 - c*Fc).

Sampling reproduces the reference's one-sample scheme exactly: lobe selected
by uc2 against {pClearcoat, pMetallic, pDielectric} thresholds
(parametric.cpp:212-255); the returned f/pdf are the *lobe's own* values (the
lobe coefficient cancels against its selection probability).

All directions are in the local shading frame (z = shading normal).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from yart_tpu.ops import ggx, lut, warps
from yart_tpu.ops.gatherless import onehot_matmul
from yart_tpu.ops.vecmath import absdot, dot, fresnel_dielectric, fresnel_schlick, refract
from yart_tpu.render.texture import sample_stack
from yart_tpu.scene.types import CompiledScene, SceneMeta

PI = jnp.pi

# Scatter flags (src/core/bsdf.hpp:21-29)
ABSORBED = 0
EMITTED = 1
REFLECTED = 2
TRANSMITTED = 4
DIFFUSE = 8
GLOSSY = 16
SPECULAR = 32


class LaneMaterial(NamedTuple):
    """Per-lane resolved (texture-modulated) material parameters."""

    base: jnp.ndarray  # [N, 3]
    metallic: jnp.ndarray  # [N]
    roughness: jnp.ndarray  # [N] texture-modulated
    roughness_base: jnp.ndarray  # [N] factor only (metallic sample.roughness)
    transmission: jnp.ndarray  # [N]
    ior: jnp.ndarray  # [N]
    anisotropic: jnp.ndarray  # [N]
    aniso_rotation: jnp.ndarray  # [N] radians
    clearcoat: jnp.ndarray  # [N]
    cc_roughness: jnp.ndarray  # [N]
    cc_roughness_base: jnp.ndarray  # [N]
    emission: jnp.ndarray  # [N, 3]
    thin: jnp.ndarray  # [N] bool
    volume_color: jnp.ndarray  # [N, 3]
    volume_density: jnp.ndarray  # [N]


class BSDFSample(NamedTuple):
    """SoA analog of BSDFSample (src/core/bsdf.hpp:20-41)."""

    flags: jnp.ndarray  # [N] int32 bitmask
    f: jnp.ndarray  # [N, 3]
    Le: jnp.ndarray  # [N, 3]
    wi: jnp.ndarray  # [N, 3]
    pdf: jnp.ndarray  # [N]
    roughness: jnp.ndarray  # [N]


def has_flag(flags, bit):
    return (flags & bit) != 0


def roughen(r):
    """Path-regularization roughening (src/core/bsdf.hpp:16-18)."""
    return jnp.maximum(r, jnp.clip(r * 2.0, 0.1, 0.3))


def resolve_material(scene: CompiledScene, meta: SceneMeta, mat_idx, uv) -> LaneMaterial:
    """Material row fetch + texture modulation (parametric.cpp:88-110).

    The whole material table is packed into one [M, F] matrix and fetched as
    ONE one-hot matmul (per-lane gathers are ~100x slower on TPU; gradients
    flow through the matmul to the table for differentiable rendering).
    """
    m = scene.materials
    f32 = jnp.float32
    packed = jnp.concatenate(
        [
            m.base_color[:, :3],                    # 0:3
            m.metallic[:, None],                    # 3
            m.roughness[:, None],                   # 4
            m.transmission[:, None],                # 5
            m.ior[:, None],                         # 6
            m.anisotropic[:, None],                 # 7
            m.aniso_rotation[:, None],              # 8
            m.clearcoat[:, None],                   # 9
            m.cc_roughness[:, None],                # 10
            m.emission,                             # 11:14
            m.normal_scale[:, None],                # 14
            m.thin[:, None].astype(f32),            # 15
            m.volume_color,                         # 16:19
            m.volume_density[:, None],              # 19
            m.tex_base[:, None].astype(f32),        # 20
            m.tex_mr[:, None].astype(f32),          # 21
            m.tex_transmission[:, None].astype(f32),# 22
            m.tex_normal[:, None].astype(f32),      # 23
            m.tex_clearcoat[:, None].astype(f32),   # 24
            m.tex_emission[:, None].astype(f32),    # 25
        ],
        axis=1,
    )
    rows = onehot_matmul(packed, mat_idx)  # [N, 26]

    base = rows[:, 0:3]
    metallic = rows[:, 3]
    rough = rows[:, 4]
    trans = rows[:, 5]
    cc = rows[:, 9]
    ccr = rows[:, 10]
    emission = rows[:, 11:14]

    if meta.any_textures:
        tb = rows[:, 20].astype(jnp.int32)
        base_tex = sample_stack(scene.tex_rgba, tb, uv)
        # sRGB color stored gamma-2: decode = square (texture.hpp:112-114).
        base = jnp.where((tb >= 0)[..., None], base * base_tex[..., :3] ** 2, base)

        tmr = rows[:, 21].astype(jnp.int32)
        mr = sample_stack(scene.tex_2ch, tmr, uv)
        has_mr = tmr >= 0
        rough = jnp.where(has_mr, rough * mr[..., 0], rough)
        metallic = jnp.where(has_mr, metallic * mr[..., 1], metallic)

        tt = rows[:, 22].astype(jnp.int32)
        tr = sample_stack(scene.tex_mono, tt, uv)
        trans = jnp.where(tt >= 0, trans * tr[..., 0], trans)

        tc = rows[:, 24].astype(jnp.int32)
        cct = sample_stack(scene.tex_mono, tc, uv)
        has_cc = tc >= 0
        cc = jnp.where(has_cc, cc * cct[..., 0], cc)
        ccr = jnp.where(has_cc, ccr * cct[..., 0], ccr)

        te = rows[:, 25].astype(jnp.int32)
        em = sample_stack(scene.tex_rgb, te, uv)
        emission = jnp.where((te >= 0)[..., None], emission * em ** 2, emission)

    return LaneMaterial(
        base=base,
        metallic=metallic,
        roughness=rough,
        roughness_base=rows[:, 4],
        transmission=trans,
        ior=rows[:, 6],
        anisotropic=rows[:, 7],
        aniso_rotation=rows[:, 8],
        clearcoat=cc,
        cc_roughness=ccr,
        cc_roughness_base=rows[:, 10],
        emission=emission,
        thin=rows[:, 15] > 0.5,
        volume_color=rows[:, 16:19],
        volume_density=rows[:, 19],
    )


def volume_attenuation(mat: LaneMaterial, d):
    """Beer-Lambert attenuation on backside hits (parametric.cpp:834-838)."""
    att = jnp.exp((mat.volume_color - 1.0) * d[..., None] * mat.volume_density[..., None])
    return jnp.where(mat.thin[..., None], 1.0, att)


def _rot_z(v, angle):
    """Rotate the xy components about +z by `angle` (anisotropy rotation,
    parametric.cpp:50-51)."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    x = c * v[..., 0] - s * v[..., 1]
    y = s * v[..., 0] + c * v[..., 1]
    return jnp.stack([x, y, v[..., 2]], axis=-1)


def _favg_fit(ior):
    """Average Fresnel fit (KC2017; parametric.cpp:7-9)."""
    return (ior - 1.0) / (4.08567 + 1.00071 * ior)


def _outward(wm):
    """Normalize a half-vector and flip to the upper hemisphere.

    The rsqrt input is masked to 1 below the ok-threshold (callers discard
    those lanes via `ok`): sqrt(x)^-3 at x ~ 1e-30 overflows f32 in reverse
    mode and 0-cotangent * inf = NaN."""
    n2 = jnp.sum(wm * wm, axis=-1, keepdims=True)
    ok = n2[..., 0] > 1e-20
    n2m = jnp.where(n2 > 1e-20, n2, 1.0)
    wm = wm * jnp.where(n2 > 1e-20, 1.0 / jnp.sqrt(n2m), 0.0)
    wm = jnp.where(wm[..., 2:3] < 0.0, -wm, wm)
    return wm, ok


def _safe_div(a, b, eps=1e-20):
    """a / b with |b| clamped away from 0. The clamped branch is
    stop-gradiented (same forward value): d(a/b)/db = -a/b^2 overflows f32
    at b = eps and 0-cotangent * inf = NaN in reverse mode."""
    import jax

    small = jnp.abs(b) < eps
    bb = jnp.where(small, jnp.where(b < 0, -eps, eps), b)
    bb = jnp.where(small, jax.lax.stop_gradient(bb), bb)
    return a / bb


# ---------------------------------------------------------------------------
# Lobe evaluation (f / pdf), batched
# ---------------------------------------------------------------------------


def _f_metallic(tables, mat, a, wo, wi):
    """(parametric.cpp:260-286)"""
    cos_o = jnp.abs(wo[..., 2])
    cos_i = jnp.abs(wi[..., 2])
    wm, ok = _outward(wo + wi)
    ok = ok & (cos_o > 0) & (cos_i > 0) & ~ggx.smooth(a)

    fss = fresnel_schlick(mat.base, absdot(wo, wm)[..., None])
    mss = fss * (ggx.mdf(a, wm) * ggx.g(a, wo, wi) / jnp.maximum(4 * cos_o * cos_i, 1e-12))[..., None]
    ess = jnp.maximum(lut.ggx_e(tables, cos_o, a.roughness), 1e-4)
    mms = mss * mat.base * ((1.0 - ess) / ess)[..., None]
    return jnp.where(ok[..., None], mss + mms, 0.0)


def _pdf_metallic(tables, mat, a, wo, wi):
    """(parametric.cpp:288-305)"""
    wm, ok = _outward(wo + wi)
    ok = ok & ~ggx.smooth(a)
    pdf = ggx.vmdf(a, wo, wm) / jnp.maximum(4 * absdot(wo, wm), 1e-12)
    return jnp.where(ok, pdf, 0.0)


def _f_dielectric(tables, mat, a, wo, wi):
    """(parametric.cpp:354-414)"""
    cos_o = wo[..., 2]
    cos_i = wi[..., 2]
    is_refl = cos_o * cos_i > 0.0
    ior = jnp.where(is_refl, 1.0, jnp.where(cos_o > 0.0, mat.ior, 1.0 / mat.ior))

    wm, ok = _outward(ior[..., None] * wi + wo)
    ok = ok & (cos_i != 0) & (cos_o != 0) & ~ggx.smooth(a)
    ok = ok & (dot(wm, wi) * cos_i >= 0.0) & (dot(wm, wo) * cos_o >= 0.0)

    fss = fresnel_dielectric(absdot(wo, wm), ior)
    t = 1.0 - fss
    e_o = jnp.maximum(
        lut.ggx_glass_e(tables, ior, a.roughness, jnp.abs(cos_o)),
        1e-4,
    )

    d_g = ggx.mdf(a, wm) * ggx.g(a, wo, wi)

    # reflection branch
    f_refl = fss * d_g / jnp.maximum(jnp.abs(4 * cos_o * cos_i), 1e-12)

    # thin transmission branch: flip wi and evaluate as reflection.
    # NOTE the reference divides by the SIGNED cos_o here
    # (parametric.cpp:399-402: 4 * cosTheta_o * cosTheta_ip with
    # cosTheta_o = wo.z()), so backside evaluations yield NEGATIVE f —
    # quirky ("TODO: check this is correct" upstream) but parity-load-
    # bearing: the thin-glass oracle image diverges 26% without it.
    wip = jnp.stack([wi[..., 0], wi[..., 1], -wi[..., 2]], axis=-1)
    wm_thin, ok_thin = _outward(wip + wo)
    cos_ip = jnp.abs(wip[..., 2])
    tss_thin = ggx.mdf(a, wm_thin) * ggx.g(a, wo, wip) * _safe_div(
        1.0, 4 * cos_o * cos_ip, eps=1e-12
    )

    # full refraction branch
    temp = dot(wi, wm) * ior + dot(wo, wm)
    dwm_dwi = absdot(wi, wm) * absdot(wo, wm) / jnp.maximum(temp * temp, 1e-12)
    tss = d_g * dwm_dwi / jnp.maximum(jnp.abs(cos_i * cos_o), 1e-12)

    trans_ss = jnp.where(mat.thin, jnp.where(ok_thin, tss_thin, 0.0), tss)
    f_trans = (t * trans_ss)[..., None] * mat.base

    out = jnp.where(
        is_refl[..., None],
        (f_refl / e_o)[..., None] * jnp.ones_like(mat.base),
        f_trans / e_o[..., None],
    )
    return jnp.where(ok[..., None], out, 0.0)


def _pdf_dielectric(tables, mat, a, wo, wi):
    """(parametric.cpp:416-460)"""
    cos_o = wo[..., 2]
    cos_i = wi[..., 2]
    is_refl = cos_o * cos_i > 0.0
    ior = jnp.where(is_refl, 1.0, jnp.where(cos_o > 0.0, mat.ior, 1.0 / mat.ior))

    wm, ok = _outward(ior[..., None] * wi + wo)
    ok = ok & (cos_i != 0) & (cos_o != 0) & ~ggx.smooth(a)
    ok = ok & (dot(wm, wi) * cos_i >= 0.0) & (dot(wm, wo) * cos_o >= 0.0)

    # NOTE: reference uses signed dot and the material ior here
    # (parametric.cpp:438-440).
    f = fresnel_dielectric(dot(wo, wm), mat.ior)
    t = 1.0 - f

    pdf_refl = ggx.vmdf(a, wo, wm) / jnp.maximum(4 * absdot(wo, wm), 1e-12) * f

    wip = jnp.stack([wi[..., 0], wi[..., 1], -wi[..., 2]], axis=-1)
    wm_thin, _ = _outward(wip + wo)
    pdf_thin = (
        ggx.vmdf(a, wo, wm_thin)
        / jnp.maximum(4 * absdot(wo, wm_thin), 1e-12)
        * t
    )

    temp2 = dot(wi, wm) + dot(wo, wm) / ior
    dwm_dwi2 = absdot(wo, wm) / jnp.maximum(temp2 * temp2, 1e-12)
    pdf_refr = ggx.vmdf(a, wo, wm) * dwm_dwi2 * t

    pdf = jnp.where(
        is_refl, pdf_refl, jnp.where(mat.thin, pdf_thin, pdf_refr)
    )
    return jnp.where(ok, pdf, 0.0)


def _glossy_diffuse_factor(tables, mat, a, cos_o, cos_i):
    """Kulla-Conty energy-conserving diffuse weight (parametric.cpp:606-613)."""
    r0 = (1.0 - mat.ior) / (1.0 + mat.ior)
    f0 = r0 * r0
    e_wo = lut.ggx_base_e(tables, f0, a.roughness, cos_o)
    e_wi = lut.ggx_base_e(tables, f0, a.roughness, cos_i)
    eavg = lut.ggx_base_eavg(tables, f0, a.roughness)
    return (1.0 - e_wo) * (1.0 - e_wi) / jnp.maximum(PI * (1.0 - eavg), 1e-6)


def _f_glossy(tables, mat, a, wo, wi):
    """(parametric.cpp:577-617)"""
    cos_o = jnp.abs(wo[..., 2])
    cos_i = jnp.abs(wi[..., 2])
    wm, ok = _outward(wo + wi)
    ok = ok & (cos_o > 0) & (cos_i > 0)
    rough_ok = ok & ~ggx.smooth(a)

    fss = fresnel_dielectric(dot(wo, wm), mat.ior)
    mss = ggx.mdf(a, wm) * ggx.g(a, wo, wi) / jnp.maximum(4 * cos_o * cos_i, 1e-12)

    favg = _favg_fit(mat.ior)
    eavg = lut.ggx_eavg(tables, a.roughness)
    e_o = lut.ggx_e(tables, cos_o, a.roughness)
    e_i = lut.ggx_e(tables, cos_i, a.roughness)
    mms = (1.0 - e_o) * (1.0 - e_i) / jnp.maximum(PI * (1.0 - eavg), 1e-6)
    fms = favg * favg * eavg / jnp.maximum(1.0 - favg * (1.0 - eavg), 1e-6)

    c_diffuse = _glossy_diffuse_factor(tables, mat, a, cos_o, cos_i)
    diffuse = mat.base * c_diffuse[..., None]

    spec = jnp.where(rough_ok, fss * mss + mms * fms, 0.0)
    return jnp.where(ok[..., None], spec[..., None] + diffuse, 0.0)


def _pdf_glossy(tables, mat, a, wo, wi):
    """(parametric.cpp:619-645)"""
    cos_o = jnp.abs(wo[..., 2])
    cos_i = jnp.abs(wi[..., 2])
    wm, ok = _outward(wo + wi)

    fss = fresnel_dielectric(dot(wo, wm), mat.ior)
    favg = _favg_fit(mat.ior)
    eavg = lut.ggx_eavg(tables, a.roughness)
    fms = favg * favg * eavg / jnp.maximum(1.0 - favg * (1.0 - eavg), 1e-6)
    e_o = lut.ggx_e(tables, cos_o, a.roughness)
    kappa = 1.0 - (favg * e_o + fms * (1.0 - e_o))

    spec_pdf = (fss + fms) * ggx.vmdf(a, wo, wm) / jnp.maximum(4 * absdot(wo, wm), 1e-12)
    spec_pdf = jnp.where(ok & ~ggx.smooth(a), spec_pdf, 0.0)
    return spec_pdf + cos_i * kappa


def _f_clearcoat(tables, mat, a_coat, wo, wi):
    """(parametric.cpp:732-766); returns (f_scalar, Fc)."""
    cos_o = jnp.abs(wo[..., 2])
    cos_i = jnp.abs(wi[..., 2])
    wm, ok = _outward(wo + wi)
    ok = ok & (cos_o > 0) & (cos_i > 0) & ~ggx.smooth(a_coat)

    fss = fresnel_dielectric(dot(wo, wm), 1.5)
    mss = ggx.mdf(a_coat, wm) * ggx.g(a_coat, wo, wi) / jnp.maximum(
        4 * cos_o * cos_i, 1e-12
    )
    fc = jnp.maximum(
        fresnel_dielectric(cos_o, 1.5), fresnel_dielectric(cos_i, 1.5)
    )
    return jnp.where(ok, fss * mss, 0.0), fc


def _pdf_clearcoat(tables, mat, a_coat, wo, wi):
    """(parametric.cpp:768-793); returns (pdf, Fc)."""
    wm, ok = _outward(wo + wi)
    ok = ok & ~ggx.smooth(a_coat)
    fss = fresnel_dielectric(dot(wo, wm), 1.5)
    pdf = fss * ggx.vmdf(a_coat, wo, wm) / jnp.maximum(4 * absdot(wo, wm), 1e-12)
    fc = jnp.maximum(
        fresnel_dielectric(jnp.abs(wo[..., 2]), 1.5),
        fresnel_dielectric(jnp.abs(wi[..., 2]), 1.5),
    )
    return jnp.where(ok, pdf, 0.0), fc


# ---------------------------------------------------------------------------
# Public f / pdf / sample
# ---------------------------------------------------------------------------


def _lobe_flags(meta):
    """Static lobe-usage gates (SceneMeta flags): lets scenes without a lobe
    skip its entire trace."""
    if meta is None:
        return True, True, True, True
    return (
        meta.any_metallic,
        meta.any_transmissive,
        meta.any_clearcoat,
        meta.any_anisotropy,
    )


def bsdf_f(tables, mat: LaneMaterial, wo, wi, meta=None):
    """Full layered f (parametric.cpp:84-132). Local-frame wo/wi [N, 3]."""
    use_metal, use_diel, use_coat, use_aniso = _lobe_flags(meta)
    a = ggx.make_alphas(mat.roughness, mat.anisotropic if use_aniso else 0.0)
    wo_r = _rot_z(wo, -mat.aniso_rotation) if use_aniso else wo
    wi_r = _rot_z(wi, -mat.aniso_rotation) if use_aniso else wi

    c_metal = mat.metallic
    c_diel = (1.0 - mat.metallic) * mat.transmission
    c_glossy = (1.0 - mat.metallic) * (1.0 - mat.transmission)

    val = c_glossy[..., None] * _f_glossy(tables, mat, a, wo_r, wi_r)
    if use_metal:
        val += c_metal[..., None] * _f_metallic(tables, mat, a, wo_r, wi_r)
    if use_diel:
        val += c_diel[..., None] * _f_dielectric(tables, mat, a, wo_r, wi_r)

    if use_coat:
        a_coat = ggx.make_alphas(mat.cc_roughness)
        f_coat, fc = _f_clearcoat(tables, mat, a_coat, wo_r, wi_r)
        c = mat.clearcoat
        val = (1.0 - c * fc)[..., None] * val + (c * f_coat)[..., None]
    return val


def bsdf_pdf(tables, mat: LaneMaterial, wo, wi, meta=None):
    """Full layered pdf (parametric.cpp:135-177).

    NOTE: unlike fImpl/sampleImpl, the reference's pdfImpl does NOT apply
    the anisotropy rotation to wo/wi (parametric.cpp:135-177 has no
    m_localRotation line) — invisible for isotropic lobes, but at
    anisotropic+rotated materials the NEE/MIS pdf diverges up to ~40x if
    rotated here (found by the per-lobe oracle probe). Reproduced as-is."""
    use_metal, use_diel, use_coat, use_aniso = _lobe_flags(meta)
    a = ggx.make_alphas(mat.roughness, mat.anisotropic if use_aniso else 0.0)
    wo_r = wo
    wi_r = wi

    p_metal = mat.metallic
    p_diel = (1.0 - mat.metallic) * mat.transmission
    p_glossy = (1.0 - mat.metallic) * (1.0 - mat.transmission)

    pdf = p_glossy * _pdf_glossy(tables, mat, a, wo_r, wi_r)
    if use_metal:
        pdf += p_metal * _pdf_metallic(tables, mat, a, wo_r, wi_r)
    if use_diel:
        pdf += p_diel * _pdf_dielectric(tables, mat, a, wo_r, wi_r)

    if use_coat:
        a_coat = ggx.make_alphas(mat.cc_roughness)
        pdf_coat, fc = _pdf_clearcoat(tables, mat, a_coat, wo_r, wi_r)
        c = mat.clearcoat
        pdf = (1.0 - c * fc) * pdf + c * pdf_coat
    return pdf


def bsdf_sample(tables, mat: LaneMaterial, wo, u, uc, uc2, regularized,
                meta=None):
    """Full layered sample (parametric.cpp:179-258).

    regularized: [N] bool — roughen() applied per-lane. Absent lobes (static
    SceneMeta flags) are skipped at trace time.
    Returns a BSDFSample; lanes that sampled an invalid direction get the
    ABSORBED flag (flags == 0).
    """
    use_metal, use_diel, use_coat, use_aniso = _lobe_flags(meta)
    r = jnp.where(regularized, roughen(mat.roughness), mat.roughness)

    n = wo.shape[0]
    if use_coat:
        cr = jnp.where(regularized, roughen(mat.cc_roughness), mat.cc_roughness)
        # --- clearcoat selection probability (parametric.cpp:211-227) ---
        a_coat = ggx.make_alphas(cr)
        wm_coat = ggx.sample_visible(a_coat, wo, u)
        favg15 = _favg_fit(1.5)
        eavg_c = lut.ggx_eavg(tables, cr)
        fms_c = favg15 * favg15 * eavg_c / jnp.maximum(
            1.0 - favg15 * (1.0 - eavg_c), 1e-6
        )
        e_o_c = lut.ggx_e(tables, jnp.clip(absdot(wo, wm_coat), 0, 1), cr)
        kappa_c = 1.0 - (favg15 * e_o_c + fms_c * (1.0 - e_o_c))
        p_coat = mat.clearcoat * (1.0 - kappa_c)
    else:
        p_coat = jnp.zeros((n,), jnp.float32)

    p_metal = (1.0 - p_coat) * mat.metallic
    p_diel = (1.0 - p_coat) * (
        mat.metallic + (1.0 - mat.metallic) * mat.transmission
    )

    sel_coat = (uc2 < p_coat) if use_coat else jnp.zeros((n,), bool)
    sel_metal = ~sel_coat & (uc2 < p_metal) if use_metal else jnp.zeros((n,), bool)
    sel_diel = (
        ~sel_coat & ~sel_metal & (uc2 < p_diel)
        if use_diel
        else jnp.zeros((n,), bool)
    )
    sel_glossy = ~sel_coat & ~sel_metal & ~sel_diel

    # --- base-lobe shared state (anisotropy rotation + VNDF sample) ---
    a = ggx.make_alphas(r, mat.anisotropic if use_aniso else 0.0)
    wo_r = _rot_z(wo, -mat.aniso_rotation) if use_aniso else wo
    wm = ggx.sample_visible(a, wo_r, u)
    smooth = ggx.smooth(a)

    s_glossy = _sample_glossy(tables, mat, a, smooth, wo_r, wm, u, uc)
    s_metal = (
        _sample_metallic(tables, mat, a, smooth, wo_r, wm) if use_metal else None
    )
    s_diel = (
        _sample_dielectric(tables, mat, a, smooth, wo_r, wm, uc)
        if use_diel
        else None
    )
    s_coat = (
        _sample_clearcoat(tables, mat, a_coat, wo, wm_coat, cr)
        if use_coat
        else None
    )

    def pick(field):
        out = getattr(s_glossy, field)
        for sel, smp in (
            (sel_diel, s_diel), (sel_metal, s_metal), (sel_coat, s_coat)
        ):
            if smp is None:
                continue
            fv = getattr(smp, field)
            sel_b = sel[..., None] if fv.ndim > sel.ndim else sel
            out = jnp.where(sel_b, fv, out)
        return out

    wi = pick("wi")
    # un-rotate base-lobe wi (parametric.cpp:254-255); clearcoat is unrotated.
    if use_aniso:
        wi_unrot = _rot_z(wi, mat.aniso_rotation)
        wi = jnp.where(sel_coat[..., None], wi, wi_unrot)

    return BSDFSample(
        flags=pick("flags"),
        f=pick("f"),
        Le=jnp.where(sel_glossy[..., None], s_glossy.Le, 0.0),
        wi=wi,
        pdf=pick("pdf"),
        roughness=pick("roughness"),
    )


def _mk_sample(flags, f, Le, wi, pdf, roughness):
    return BSDFSample(flags, f, Le, wi, pdf, roughness)


def _mirror(wo):
    return jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)


def _sample_metallic(tables, mat, a, smooth, wo, wm):
    """(parametric.cpp:307-352)"""
    # smooth: delta mirror
    wi_s = _mirror(wo)
    f_s = fresnel_schlick(mat.base, wo[..., 2:3]) / jnp.maximum(
        jnp.abs(wo[..., 2:3]), 1e-12
    )

    # rough
    wi = -wo + 2.0 * dot(wo, wm, keepdims=True) * wm
    valid = wo[..., 2] * wi[..., 2] >= 0.0
    pdf = ggx.vmdf(a, wo, wm) / jnp.maximum(4 * absdot(wo, wm), 1e-12)
    cos_o = jnp.abs(wo[..., 2])
    cos_i = jnp.abs(wi[..., 2])
    fss = fresnel_schlick(mat.base, absdot(wo, wm)[..., None])
    mss = fss * (ggx.mdf(a, wm) * ggx.g(a, wo, wi) / jnp.maximum(4 * cos_o * cos_i, 1e-12))[..., None]
    ess = jnp.maximum(lut.ggx_e(tables, cos_o, a.roughness), 1e-4)
    f = mss * (1.0 + mat.base * ((1.0 - ess) / ess)[..., None])

    flags_r = jnp.where(valid, REFLECTED | GLOSSY, ABSORBED)
    return _mk_sample(
        flags=jnp.where(smooth, REFLECTED | SPECULAR, flags_r).astype(jnp.int32),
        f=jnp.where(smooth[..., None], f_s, jnp.where(valid[..., None], f, 0.0)),
        Le=jnp.zeros_like(f),
        wi=jnp.where(smooth[..., None], wi_s, wi),
        pdf=jnp.where(smooth, 1.0, pdf),
        roughness=jnp.where(smooth, 0.0, mat.roughness_base),
    )


def _sample_dielectric(tables, mat, a, smooth, wo, wm, uc):
    """(parametric.cpp:462-575)"""
    ior_rel = jnp.where(
        mat.thin | (wo[..., 2] > 0.0), mat.ior, 1.0 / mat.ior
    )

    # ---- smooth (delta) case ----
    f_spec = fresnel_dielectric(jnp.abs(wo[..., 2]), ior_rel)
    refl_s = uc < f_spec
    wi_s_refl = _mirror(wo)
    z_axis = jnp.zeros_like(wo).at[..., 2].set(1.0)
    wi_s_refr, tir_s = refract(wo, z_axis, mat.ior)
    wi_s_refr = jnp.where(mat.thin[..., None], -wo, wi_s_refr)
    tir_s = jnp.where(mat.thin, False, tir_s)
    wi_s = jnp.where(refl_s[..., None], wi_s_refl, wi_s_refr)
    t_spec = 1.0 - f_spec
    f_s = jnp.where(
        refl_s[..., None],
        (f_spec / jnp.maximum(jnp.abs(wi_s_refl[..., 2]), 1e-12))[..., None]
        * jnp.ones_like(mat.base),
        (t_spec / jnp.maximum(jnp.abs(wi_s_refr[..., 2]), 1e-12))[..., None]
        * mat.base,
    )
    pdf_s = jnp.where(refl_s, f_spec, t_spec)
    flags_s = jnp.where(
        refl_s,
        REFLECTED | SPECULAR,
        jnp.where(tir_s, ABSORBED, TRANSMITTED | SPECULAR),
    )

    # ---- rough case ----
    fss = fresnel_dielectric(absdot(wo, wm), ior_rel)
    cos_o = jnp.abs(wo[..., 2])
    e_o = jnp.maximum(
        lut.ggx_glass_e(tables, ior_rel, a.roughness, cos_o), 1e-4
    )
    refl = uc < fss

    # reflection branch
    wi_r = -wo + 2.0 * dot(wo, wm, keepdims=True) * wm
    ok_r = wo[..., 2] * wi_r[..., 2] >= 0.0
    cos_i_r = jnp.abs(wi_r[..., 2])
    mss_r = ggx.mdf(a, wm) * ggx.g(a, wo, wi_r) / jnp.maximum(
        4 * cos_o * cos_i_r, 1e-12
    )
    f_r = (fss * mss_r / e_o)[..., None] * jnp.ones_like(mat.base)
    pdf_r = ggx.vmdf(a, wo, wm) / jnp.maximum(4 * absdot(wo, wm), 1e-12) * fss

    # thin transmission branch
    wi_thin = _mirror(-(-wo + 2.0 * dot(wo, wm, keepdims=True) * wm))
    # reflect(wo, wm) * (1, 1, -1):
    wi_thin = (-wo + 2.0 * dot(wo, wm, keepdims=True) * wm) * jnp.asarray(
        [1.0, 1.0, -1.0]
    )
    cos_i_t = jnp.abs(wi_thin[..., 2])
    tss_thin = ggx.mdf(a, wm) * ggx.g(a, wo, wi_thin) / jnp.maximum(
        4 * cos_o * cos_i_t, 1e-12
    )
    f_thin = ((1.0 - fss) * tss_thin / e_o)[..., None] * mat.base
    pdf_thin = (
        ggx.vmdf(a, wo, wm) / jnp.maximum(4 * absdot(wo, wm), 1e-12) * (1.0 - fss)
    )

    # full refraction branch
    wi_t, tir = refract(wo, wm, mat.ior)
    bad_t = tir | (wo[..., 2] * wi_t[..., 2] > 0.0) | (wi_t[..., 2] == 0.0)
    temp = dot(wi_t, wm) * ior_rel + dot(wo, wm)
    dwm_dwi = absdot(wi_t, wm) / jnp.maximum(temp * temp, 1e-12)
    pdf_t = ggx.vmdf(a, wo, wm) * dwm_dwi * (1.0 - fss)
    tss = ggx.mdf(a, wm) * ggx.g(a, wo, wi_t) * jnp.abs(
        _safe_div(
            dot(wi_t, wm) * dot(wo, wm),
            wi_t[..., 2] * wo[..., 2] * temp * temp,
        )
    )
    f_t = ((1.0 - fss) * tss / e_o)[..., None] * mat.base

    # select rough branch
    use_thin = ~refl & mat.thin
    use_refr = ~refl & ~mat.thin
    wi_rough = jnp.where(
        refl[..., None], wi_r, jnp.where(use_thin[..., None], wi_thin, wi_t)
    )
    f_rough = jnp.where(
        refl[..., None], f_r, jnp.where(use_thin[..., None], f_thin, f_t)
    )
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

    return _mk_sample(
        flags=jnp.where(smooth, flags_s, flags_rough).astype(jnp.int32),
        f=jnp.where(smooth[..., None], f_s, f_rough),
        Le=jnp.zeros_like(f_s),
        wi=jnp.where(smooth[..., None], wi_s, wi_rough),
        pdf=jnp.where(smooth, pdf_s, pdf_rough),
        roughness=jnp.where(smooth, 0.0, a.roughness),
    )


def _sample_glossy(tables, mat, a, smooth, wo, wm, u, uc):
    """(parametric.cpp:648-730)"""
    cos_o = wo[..., 2]
    favg = _favg_fit(mat.ior)
    eavg = lut.ggx_eavg(tables, a.roughness)
    fms = favg * favg * eavg / jnp.maximum(1.0 - favg * (1.0 - eavg), 1e-6)
    # RAW sign-carrying cosine, like parametric.cpp:658-662: backside
    # evaluations extrapolate off the LUT edge (see ops/gatherless.py
    # ref_lerp_weights) - this is visible in emissive-surface brightness.
    e_o = lut.ggx_e(tables, cos_o, a.roughness)
    kappa = 1.0 - (favg * e_o + fms * (1.0 - e_o))

    sel_diffuse = uc < kappa

    # ---- diffuse branch ----
    wi_d = warps.sample_cosine_hemisphere(u)
    wi_d = jnp.where((cos_o < 0)[..., None], -wi_d, wi_d)
    cos_i_d = wi_d[..., 2]
    c_diffuse = _glossy_diffuse_factor(tables, mat, a, cos_o, cos_i_d)
    f_d = mat.base * c_diffuse[..., None]
    pdf_d = jnp.abs(cos_i_d) * c_diffuse
    emissive = jnp.sum(mat.emission * mat.emission, axis=-1) > 0.0
    flags_d = jnp.where(
        emissive, REFLECTED | DIFFUSE | EMITTED, REFLECTED | DIFFUSE
    )

    # ---- smooth specular ----
    f_spec = fresnel_dielectric(cos_o, mat.ior)
    wi_s = _mirror(wo)
    f_s = (f_spec / jnp.maximum(jnp.abs(wi_s[..., 2]), 1e-12))[..., None] * jnp.ones_like(mat.base)

    # ---- rough reflection ----
    wi_g = -wo + 2.0 * dot(wo, wm, keepdims=True) * wm
    cos_i_g = wi_g[..., 2]
    ok_g = cos_o * cos_i_g >= 0.0
    fss = fresnel_dielectric(dot(wo, wm), mat.ior)
    mss = ggx.mdf(a, wm) * ggx.g(a, wo, wi_g) / jnp.maximum(
        jnp.abs(4 * cos_o * cos_i_g), 1e-12
    )
    e_i = lut.ggx_e(tables, cos_i_g, a.roughness)
    mms = (1.0 - e_o) * (1.0 - e_i) / jnp.maximum(PI * (1.0 - eavg), 1e-6)
    f_g = (fss * mss + fms * mms)[..., None] * jnp.ones_like(mat.base)
    pdf_g = ggx.vmdf(a, wo, wm) / jnp.maximum(4 * absdot(wo, wm), 1e-12) * fss
    flags_g = jnp.where(ok_g, REFLECTED | GLOSSY, ABSORBED)

    # combine: diffuse < smooth-specular < rough-glossy
    spec_flags = jnp.where(smooth, REFLECTED | SPECULAR, flags_g)
    spec_f = jnp.where(smooth[..., None], f_s, jnp.where(ok_g[..., None], f_g, 0.0))
    spec_wi = jnp.where(smooth[..., None], wi_s, wi_g)
    spec_pdf = jnp.where(smooth, f_spec, pdf_g)
    spec_rough = jnp.where(smooth, 0.0, a.roughness)

    return _mk_sample(
        flags=jnp.where(sel_diffuse, flags_d, spec_flags).astype(jnp.int32),
        f=jnp.where(sel_diffuse[..., None], f_d, spec_f),
        Le=jnp.where(sel_diffuse[..., None], mat.emission, 0.0),
        wi=jnp.where(sel_diffuse[..., None], wi_d, spec_wi),
        pdf=jnp.where(sel_diffuse, pdf_d, spec_pdf),
        roughness=jnp.where(sel_diffuse, 1.0, spec_rough),
    )


def _sample_clearcoat(tables, mat, a_coat, wo, wm_coat, cr):
    """(parametric.cpp:795-832)"""
    smooth = ggx.smooth(a_coat)
    cos_o = wo[..., 2]

    # smooth: NOTE the reference uses the material ior here, not 1.5
    # (parametric.cpp:804).
    f_spec = fresnel_dielectric(cos_o, mat.ior)
    wi_s = _mirror(wo)
    f_s = (f_spec / jnp.maximum(jnp.abs(wi_s[..., 2]), 1e-12))[..., None] * jnp.ones_like(mat.base)

    wi = -wo + 2.0 * dot(wo, wm_coat, keepdims=True) * wm_coat
    ok = cos_o * wi[..., 2] >= 0.0
    fss = fresnel_dielectric(dot(wo, wm_coat), 1.5)
    mss = ggx.mdf(a_coat, wm_coat) * ggx.g(a_coat, wo, wi) / jnp.maximum(
        jnp.abs(4 * cos_o * wi[..., 2]), 1e-12
    )
    pdf = fss * ggx.vmdf(a_coat, wo, wm_coat) / jnp.maximum(
        4 * absdot(wo, wm_coat), 1e-12
    )
    f = (fss * mss)[..., None] * jnp.ones_like(mat.base)
    flags = jnp.where(ok, REFLECTED | GLOSSY, ABSORBED)

    return _mk_sample(
        flags=jnp.where(smooth, REFLECTED | SPECULAR, flags).astype(jnp.int32),
        f=jnp.where(smooth[..., None], f_s, jnp.where(ok[..., None], f, 0.0)),
        Le=jnp.zeros_like(f),
        wi=jnp.where(smooth[..., None], wi_s, wi),
        pdf=jnp.where(smooth, f_spec, pdf),
        roughness=jnp.where(smooth, 0.0, mat.cc_roughness_base),
    )
