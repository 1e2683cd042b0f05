"""GGX multi-scatter energy LUTs: baking + device fetch.

The reference ships 8 baked tables (src/bsdf/luts.cpp, adapted from the
Enterprise PBR spec and Blender Cycles). We do NOT copy those tables — we
re-derive them by numerical integration of the same physical quantities
(directional albedo of the single-scatter GGX lobe under various Fresnel
models), using the VNDF importance-sampling estimator:

    E(wo) = ∫ f_ss(wo, wi) |cos θi| dwi  =  E_u[ F(wo·wm) · G2(wo,wi)/G1(wo) ]

with wm ~ VNDF(wo) (the f/pdf ratio collapses to F·G2/G1; Heitz 2014 eq. 19 /
Turquin 2019). Eavg(r) = 2 ∫ E(μ, r) μ dμ by Gauss-Legendre quadrature.

Table shapes and index parametrizations mirror the reference fetchers
(src/bsdf/luts.hpp:33-187) exactly so the BSDF math is interchangeable:

- ggx_E[32][32]        axes (r, cosTheta), F = 1
- ggx_Eavg[32]         axis r
- ggx_base_E[16][16][16]   axes (f0, r, cosTheta), F = Schlick(f0)
- ggx_base_Eavg[16][16]    axes (f0, r)
- ggx_glass_E[16][16][16]  axes (f0(ior), cosTheta, r), dielectric refl+refr,
                           ior >= 1; `inv` variant uses 1/ior (inside looking
                           out). f0 axis parametrized f0 = sqrt((ior-1)/(ior+1))
- ggx_glass_Eavg[16][16]   axes (f0(ior), r) + inv variant

Baked once on the host (numpy float64, Hammersley QMC) and cached to
yart_tpu/data/luts.npz; device fetches are tiny-table gathers with the same
clamped bilinear/trilinear rules as luts.hpp.
"""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp
import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")
_NPZ_PATH = os.path.abspath(os.path.join(_DATA_DIR, "luts.npz"))

N_SAMPLES = 1 << 14  # QMC samples per table entry


# ---------------------------------------------------------------------------
# Host-side baking (numpy, float64)
# ---------------------------------------------------------------------------


def _hammersley(n: int) -> np.ndarray:
    """[n, 2] Hammersley points (van der Corput base 2 + i/n)."""
    i = np.arange(n, dtype=np.uint32)
    b = i.copy()
    b = ((b & 0x55555555) << 1) | ((b & 0xAAAAAAAA) >> 1)
    b = ((b & 0x33333333) << 2) | ((b & 0xCCCCCCCC) >> 2)
    b = ((b & 0x0F0F0F0F) << 4) | ((b & 0xF0F0F0F0) >> 4)
    b = ((b & 0x00FF00FF) << 8) | ((b & 0xFF00FF00) >> 8)
    b = (b << 16) | (b >> 16)
    u2 = b.astype(np.float64) * 2.0 ** -32
    u1 = (i.astype(np.float64) + 0.5) / n
    return np.stack([u1, u2], axis=-1)


def _sample_vndf_np(alpha, wo, u):
    """Heitz VNDF sampling, isotropic, numpy batched.

    alpha: scalar; wo: [..., 3]; u: [..., 2]. Same construction as
    ops/ggx.sample_visible (reference bsdf.hpp:243-271).
    """
    w = wo.copy()
    wh = np.stack([alpha * w[..., 0], alpha * w[..., 1], w[..., 2]], -1)
    wh /= np.linalg.norm(wh, axis=-1, keepdims=True)
    wh = np.where(wh[..., 2:3] < 0, -wh, wh)

    z = np.array([0.0, 0.0, 1.0])
    b = np.cross(np.broadcast_to(z, wh.shape), wh)
    bl = np.linalg.norm(b, axis=-1, keepdims=True)
    x = np.array([1.0, 0.0, 0.0])
    b = np.where(bl > 1e-9, b / np.maximum(bl, 1e-20), x)
    t = np.cross(wh, b)

    r = np.sqrt(u[..., 0])
    phi = 2.0 * np.pi * u[..., 1]
    px = r * np.cos(phi)
    py0 = r * np.sin(phi)
    h = np.sqrt(1.0 - px * px)
    mix = 0.5 * wh[..., 2] + 0.5
    py = h + (py0 - h) * mix
    pz = np.sqrt(np.maximum(0.0, 1.0 - px * px - py * py))
    nh = px[..., None] * b + py[..., None] * t + pz[..., None] * wh
    wm = np.stack(
        [alpha * nh[..., 0], alpha * nh[..., 1], np.maximum(1e-6, nh[..., 2])], -1
    )
    return wm / np.linalg.norm(wm, axis=-1, keepdims=True)


def _lambda_np(alpha, w):
    c2 = w[..., 2] * w[..., 2]
    s2 = np.maximum(0.0, 1.0 - c2)
    t2 = s2 / np.maximum(c2, 1e-20)
    return (np.sqrt(1.0 + alpha * alpha * t2) - 1.0) * 0.5


def _g2_over_g1_np(alpha, wo, wi):
    lo = _lambda_np(alpha, wo)
    li = _lambda_np(alpha, wi)
    return (1.0 + lo) / (1.0 + lo + li)


def _fresnel_dielectric_np(cos_i, ior):
    cos_i = np.clip(np.abs(cos_i), 0.0, 1.0)
    sin2_t = (1.0 - cos_i * cos_i) / (ior * ior)
    tir = sin2_t >= 1.0
    cos_t = np.sqrt(np.maximum(0.0, 1.0 - sin2_t))
    r_prl = (ior * cos_i - cos_t) / (ior * cos_i + cos_t)
    r_per = (cos_i - ior * cos_t) / (cos_i + ior * cos_t)
    return np.where(tir, 1.0, 0.5 * (r_prl ** 2 + r_per ** 2))


def _refract_np(wi, wm, ior):
    """Refract wi about wm with relative ior (outside convention); returns
    (wt, tir_mask)."""
    cos_i = np.sum(wi * wm, axis=-1, keepdims=True)
    below = cos_i < 0.0
    eta = np.where(below[..., 0], 1.0 / ior, ior)[..., None]
    n = np.where(below, -wm, wm)
    ci = np.abs(cos_i)
    sin2_t = np.maximum(0.0, 1.0 - ci * ci) / (eta * eta)
    tir = sin2_t[..., 0] >= 1.0
    ct = np.sqrt(np.maximum(0.0, 1.0 - sin2_t))
    wt = -wi / eta + (ci / eta - ct) * n
    return wt, tir


def _wo_grid(cos_grid):
    wo = np.zeros(cos_grid.shape + (3,))
    mu = np.clip(cos_grid, 1e-4, 1.0)
    wo[..., 0] = np.sqrt(np.maximum(0.0, 1.0 - mu * mu))
    wo[..., 2] = mu
    return wo


def _directional_albedo(alpha, cos_grid, fresnel_fn, n_samples=N_SAMPLES):
    """E(mu) over cos_grid for one roughness. fresnel_fn(wo, wm, wi_r) gives
    the per-sample reflection weight (and handles refraction internally when
    it returns the full weight)."""
    u = _hammersley(n_samples)  # [S, 2]
    wo = _wo_grid(cos_grid)  # [C, 3]
    wo_b = wo[:, None, :]  # [C, 1, 3]
    u_b = u[None, :, :]  # [1, S, 2]
    if alpha < 1e-3:
        # Smooth limit: mirror reflection, G2/G1 = 1.
        wm = np.broadcast_to(np.array([0.0, 0.0, 1.0]), wo_b.shape)
        wm = np.broadcast_to(wm, (cos_grid.shape[0], n_samples, 3))
    else:
        wm = _sample_vndf_np(alpha, np.broadcast_to(wo_b, (cos_grid.shape[0], n_samples, 3)), np.broadcast_to(u_b, (cos_grid.shape[0], n_samples, 2)))
    return fresnel_fn(alpha, np.broadcast_to(wo_b, wm.shape), wm).mean(axis=1)


def _weight_no_fresnel(alpha, wo, wm):
    wi = _reflect_np(wo, wm)
    w = _g2_over_g1_np(alpha, wo, wi)
    return np.where(wi[..., 2] > 0.0, w, 0.0)


def _reflect_np(wo, wm):
    return -wo + 2.0 * np.sum(wo * wm, axis=-1, keepdims=True) * wm


def _make_weight_schlick(f0):
    def fn(alpha, wo, wm):
        c = np.abs(np.sum(wo * wm, axis=-1))
        f = f0 + (1.0 - f0) * (1.0 - c) ** 5
        wi = _reflect_np(wo, wm)
        w = f * _g2_over_g1_np(alpha, wo, wi)
        return np.where(wi[..., 2] > 0.0, w, 0.0)

    return fn


def _make_weight_glass(ior):
    def fn(alpha, wo, wm):
        cos_wm = np.abs(np.sum(wo * wm, axis=-1))
        f = _fresnel_dielectric_np(cos_wm, ior)
        wi_r = _reflect_np(wo, wm)
        w_r = f * _g2_over_g1_np(alpha, wo, wi_r)
        w_r = np.where(wi_r[..., 2] * wo[..., 2] > 0.0, w_r, 0.0)
        wi_t, tir = _refract_np(wo, wm, ior)
        nrm = np.linalg.norm(wi_t, axis=-1, keepdims=True)
        wi_t = wi_t / np.maximum(nrm, 1e-20)
        w_t = (1.0 - f) * _g2_over_g1_np(alpha, wo, wi_t)
        w_t = np.where(tir | (wi_t[..., 2] * wo[..., 2] > 0.0), 0.0, w_t)
        return w_r + w_t

    return fn


def _eavg_from_e(e_of_mu_fn, alphas, n_mu=64):
    """Eavg = 2 * int_0^1 E(mu) mu dmu by Gauss-Legendre."""
    x, w = np.polynomial.legendre.leggauss(n_mu)
    mu = 0.5 * (x + 1.0)
    wq = 0.5 * w
    out = []
    for a in alphas:
        e = e_of_mu_fn(a, mu)
        out.append(2.0 * np.sum(e * mu * wq))
    return np.asarray(out)


def _ior_from_f0_axis(f0):
    """Invert the glass-table axis f0 = sqrt((ior-1)/(ior+1))."""
    f2 = np.clip(f0 * f0, 0.0, 1.0 - 1e-6)
    return (1.0 + f2) / (1.0 - f2)


def bake(n_samples: int = N_SAMPLES, verbose: bool = True) -> dict:
    """Bake all 8 tables; returns dict of numpy arrays."""
    out = {}
    rs32 = np.arange(32) / 31.0
    cos32 = np.arange(32) / 31.0
    # --- ggx_E / ggx_Eavg (F = 1) ---
    e = np.zeros((32, 32))
    for i, r in enumerate(rs32):
        alpha = r * r
        e[i] = _directional_albedo(alpha, cos32, _weight_no_fresnel, n_samples)
    out["ggx_E"] = e
    out["ggx_Eavg"] = _eavg_from_e(
        lambda a, mu: _directional_albedo(a, mu, _weight_no_fresnel, n_samples // 4),
        rs32 ** 2,
    )
    if verbose:
        print("baked ggx_E / ggx_Eavg")

    # --- ggx_base_E / ggx_base_Eavg (Schlick f0) ---
    f0s = np.arange(16) / 15.0
    rs16 = np.arange(16) / 15.0
    cos16 = np.arange(16) / 15.0
    base_e = np.zeros((16, 16, 16))
    base_eavg = np.zeros((16, 16))
    for i, f0 in enumerate(f0s):
        wfn = _make_weight_schlick(f0)
        for j, r in enumerate(rs16):
            base_e[i, j] = _directional_albedo(r * r, cos16, wfn, n_samples // 2)
        base_eavg[i] = _eavg_from_e(
            lambda a, mu: _directional_albedo(a, mu, wfn, n_samples // 4),
            rs16 ** 2,
            n_mu=32,
        )
    out["ggx_base_E"] = base_e
    out["ggx_base_Eavg"] = base_eavg
    if verbose:
        print("baked ggx_base_E / ggx_base_Eavg")

    # --- glass tables: axes (f0(ior), cos, r) + inv ---
    for tag in ("", "_inv"):
        g_e = np.zeros((16, 16, 16))
        g_eavg = np.zeros((16, 16))
        for i, f0 in enumerate(f0s):
            ior = _ior_from_f0_axis(f0)
            if tag:
                ior = 1.0 / ior
            wfn = _make_weight_glass(ior)
            per_r = np.zeros((16, 16))  # [r, cos]
            for j, r in enumerate(rs16):
                per_r[j] = _directional_albedo(r * r, cos16, wfn, n_samples // 2)
            g_e[i] = per_r.T  # -> [cos, r]
            g_eavg[i] = _eavg_from_e(
                lambda a, mu: _directional_albedo(a, mu, wfn, n_samples // 4),
                rs16 ** 2,
                n_mu=32,
            )
        # ior -> 1 limit: the interface vanishes, so the energy is exactly 1
        # (F = 0 and refraction is straight-through; the G2/G1 factor is an
        # artifact of treating the no-op interface as scattering).
        g_e[0] = 1.0
        g_eavg[0] = 1.0
        out[f"ggx_glass{tag}_E"] = g_e
        out[f"ggx_glass{tag}_Eavg"] = g_eavg
        if verbose:
            print(f"baked ggx_glass{tag}_E / Eavg")
    return out


def ensure_baked(path: str = _NPZ_PATH) -> str:
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tables = bake()
        np.savez_compressed(path, **{k: v.astype(np.float32) for k, v in tables.items()})
    return path


@functools.lru_cache()
def load_tables():
    """Load (bake if needed) all tables as host numpy arrays.

    Deliberately numpy, not jnp: the cache may be populated from inside a jit
    trace, and caching trace-created device arrays would leak tracers into
    later traces. numpy constants are lifted per-trace by XLA.
    """
    with np.load(ensure_baked()) as z:
        return {k: np.ascontiguousarray(z[k]) for k in z.files}


# ---------------------------------------------------------------------------
# Device-side fetch (batched; mirrors luts.hpp:33-187 semantics)
#
# Implemented as gather-free weight contractions (ops/gatherless.py): per-lane
# gathers are ~100x slower than one-hot/hat matmuls on TPU. The weights use
# the REFERENCE's exact index arithmetic (fetch_*_ref), including its
# unclamped lerp fractions: negative cosines (backside evaluations in
# parametric.cpp sampleGlossy, :662,675-676,717) EXTRAPOLATE off the table
# edge instead of clamping — measurably visible in emissive-surface
# brightness (see tests/test_parity.py).
# ---------------------------------------------------------------------------

from yart_tpu.ops.gatherless import fetch_1d_ref, fetch_2d_ref, fetch_3d_ref


# Trace-time flag: the integrator arms it ONLY while tracing the
# differentiable path (render/integrator.py named_residuals()).
# checkpoint_name is semantically identity, but it is also an XLA
# optimization barrier — leaving it in the non-diff forward path
# measured -17% on the cornell wave (BASELINE.md round 4).
_NAME_RESIDUALS = False


class named_residuals:
    def __enter__(self):
        global _NAME_RESIDUALS
        self._prev = _NAME_RESIDUALS
        _NAME_RESIDUALS = True

    def __exit__(self, *exc):
        global _NAME_RESIDUALS
        _NAME_RESIDUALS = self._prev


def _named(x):
    # Saved as a remat residual under cfg.remat="trace_lut" so the
    # backward re-forward skips the hat-weight contractions.
    if not _NAME_RESIDUALS:
        return x
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, "lut")


def ggx_e(tables, cos_theta, r):
    """ggxE (luts.hpp:34-45); axes [r][cos]."""
    return _named(fetch_2d_ref(jnp.asarray(tables["ggx_E"]), r, cos_theta))


def ggx_eavg(tables, r):
    """ggxEavg (luts.hpp:53-58)."""
    return _named(fetch_1d_ref(jnp.asarray(tables["ggx_Eavg"]), r))


def ggx_base_e(tables, f0, r, cos_theta):
    """ggxBaseE (luts.hpp:70-99); axes [f0][r][cos]."""
    f0 = jnp.broadcast_to(jnp.asarray(f0, jnp.float32), jnp.shape(r))
    return _named(fetch_3d_ref(jnp.asarray(tables["ggx_base_E"]), f0, r, cos_theta))


def ggx_base_eavg(tables, f0, r):
    """ggxBaseEavg (luts.hpp:107-118); axes [f0][r]."""
    f0 = jnp.broadcast_to(jnp.asarray(f0, jnp.float32), jnp.shape(r))
    return _named(fetch_2d_ref(jnp.asarray(tables["ggx_base_Eavg"]), f0, r))


def _glass_f0(ior):
    """Axis parametrization f0 = sqrt((ior-1)/(ior+1)), ior >= 1
    (luts.hpp:135-137)."""
    return jnp.sqrt(jnp.abs((ior - 1.0) / (ior + 1.0)))


def ggx_glass_e(tables, ior, r, cos_theta):
    """ggxGlassE (luts.hpp:127-160): branchless over the ior<1 (inv) variant;
    axes [f0][cos][r]."""
    inv = ior < 1.0
    ior_n = jnp.where(inv, 1.0 / jnp.maximum(ior, 1e-6), ior)
    f0 = _glass_f0(ior_n)
    v_n = fetch_3d_ref(jnp.asarray(tables["ggx_glass_E"]), f0, cos_theta, r)
    v_i = fetch_3d_ref(jnp.asarray(tables["ggx_glass_inv_E"]), f0, cos_theta, r)
    return _named(jnp.where(inv, v_i, v_n))


def ggx_glass_eavg(tables, ior, r):
    """ggxGlassEavg (luts.hpp:168-187); axes [f0][r]."""
    inv = ior < 1.0
    ior_n = jnp.where(inv, 1.0 / jnp.maximum(ior, 1e-6), ior)
    f0 = _glass_f0(ior_n)
    v_n = fetch_2d_ref(jnp.asarray(tables["ggx_glass_Eavg"]), f0, r)
    v_i = fetch_2d_ref(jnp.asarray(tables["ggx_glass_inv_Eavg"]), f0, r)
    return _named(jnp.where(inv, v_i, v_n))
