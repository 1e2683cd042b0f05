"""Light sampling: power-weighted light selection + area/env light sampling.

Batched re-design of the reference light stack:
- PowerLightSampler (src/core/light-sampler.cpp:32-93): infinite lights get
  reserved probability pInf = nInf/(nInf+1); area lights chosen by cumulative
  power binary search. Here: one searchsorted over the power CDF.
- AreaLight::sample (src/core/light.cpp:44-73): uniform barycentric point on
  an emissive triangle, pdf = 1/area.
- ImageInfiniteLight (src/core/light.cpp:137-242): octahedral env map with
  piecewise-constant 2D importance sampling; pdf(wi) = dist.pdf(octaUV)/4pi;
  sampled point pushed to 2*sceneRadius.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from yart_tpu.ops import warps
from yart_tpu.ops.gatherless import onehot_matmul
from yart_tpu.ops.distribution import ONE_MINUS_EPS, sample_alias_rows
from yart_tpu.ops.vecmath import inv_octahedral_uv, normalize, octahedral_uv
from yart_tpu.scene.types import CompiledScene, SceneMeta

FOUR_PI = 4.0 * jnp.pi


class LightSample(NamedTuple):
    """SoA LightSample (src/core/light.hpp:10) + selection probability."""

    Li: jnp.ndarray  # [N, 3]
    wi: jnp.ndarray  # [N, 3]
    p: jnp.ndarray  # [N, 3] point on light
    n: jnp.ndarray  # [N, 3] light normal
    pdf: jnp.ndarray  # [N] area-measure pdf (or solid-angle/4pi for env)
    select_p: jnp.ndarray  # [N] probability this light was selected
    is_env: jnp.ndarray  # [N] bool
    valid: jnp.ndarray  # [N] bool


def _in_bounds(scene: CompiledScene, uv):
    b = scene.env_bounds
    return (
        (uv[..., 0] >= b[0]) & (uv[..., 0] < b[2])
        & (uv[..., 1] >= b[1]) & (uv[..., 1] < b[3])
    )


def env_rows_from_image(env_image, pdf_cells):
    """Assemble the [K, 16] env row table: per bilinear base cell the 2x2
    texel quad (radiance) + the cell's sampling density. jnp ops, so
    env-image gradients flow through to the radiance fetch (render/diff.py
    rebuilds the rows from the differentiable image)."""
    h, w = env_image.shape[:2]
    wc, hc = max(w - 1, 1), max(h - 1, 1)
    x1 = jnp.minimum(jnp.arange(wc) + 1, w - 1)
    y1 = jnp.minimum(jnp.arange(hc) + 1, h - 1)
    s00 = env_image[:hc, :wc]
    s10 = env_image[:hc, x1]
    s01 = env_image[y1, :wc]
    s11 = env_image[y1][:, x1]
    quad = jnp.concatenate([s00, s10, s01, s11], axis=-1)  # [hc, wc, 12]
    quad = quad.reshape(hc * wc, 12)
    return jnp.concatenate(
        [quad, pdf_cells.reshape(-1, 1),
         jnp.zeros((hc * wc, 3), env_image.dtype)],
        axis=1,
    )


def _env_fetch(scene: CompiledScene, meta: SceneMeta, uv):
    """One row gather -> (Le bilinear, uv-square sampling pdf)."""
    wc = meta.env_wc if meta is not None else 1
    hc = meta.env_hc if meta is not None else 1
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    # Bilinear base == sampling cell by construction (grid = (W-1)x(H-1)).
    fx = u * wc
    fy = v * hc
    x = jnp.clip(fx.astype(jnp.int32), 0, wc - 1)
    y = jnp.clip(fy.astype(jnp.int32), 0, hc - 1)
    fu = (fx - x)[..., None]
    fv = (fy - y)[..., None]
    row = scene.env_rows[y * wc + x]  # [N, 16]
    le = (
        (row[..., 0:3] * (1 - fu) + row[..., 3:6] * fu) * (1 - fv)
        + (row[..., 6:9] * (1 - fu) + row[..., 9:12] * fu) * fv
    )
    return le, row[..., 12]


def env_le(scene: CompiledScene, d, meta: SceneMeta = None):
    """Env radiance along direction d (light.cpp:196-201); the rotation maps
    world directions into map space (light.cpp:208). With portal bounds,
    radiance outside the crop is zero (light.cpp:201-205)."""
    return env_le_pdf(scene, d, meta)[0]


def env_le_pdf(scene: CompiledScene, d, meta: SceneMeta = None):
    """(radiance, solid-angle sampling pdf) along d from ONE table fetch —
    the miss path needs both (Le + the MIS weight's light pdf)."""
    uv = octahedral_uv(d @ scene.env_rotation.T)
    le, pdf_uv = _env_fetch(scene, meta, uv)
    if meta is not None and meta.env_portal:
        le = jnp.where(_in_bounds(scene, uv)[..., None], le, 0.0)
    if meta is not None and not meta.env_sampleable:
        pdf = jnp.zeros(d.shape[:-1], jnp.float32)
    else:
        pdf = pdf_uv / FOUR_PI
    return le, pdf


def env_pdf(scene: CompiledScene, d, meta: SceneMeta = None):
    """Solid-angle pdf of env importance sampling (light.cpp:208-214). A
    UniformInfiniteLight has pdf 0 — sampling is disabled (light.cpp:105-110).
    Outside portal bounds the distribution weight is zero, so the pdf already
    vanishes there."""
    if meta is not None and not meta.env_sampleable:
        return jnp.zeros(d.shape[:-1], jnp.float32)
    return env_le_pdf(scene, d, meta)[1]


def p_infinite(meta: SceneMeta) -> float:
    """Reserved infinite-light probability (light-sampler.cpp:57-59)."""
    n_inf = 1 if meta.has_env else 0
    if meta.n_lights == 0:
        return 1.0
    return n_inf / (n_inf + 1.0)


def select_p_area(scene: CompiledScene, meta: SceneMeta, light_idx,
                  kind: str = "power"):
    """Selection probability of area light `light_idx` for MIS
    (light-sampler.cpp:80-93 / 23-29)."""
    if kind == "uniform":
        n_total = meta.n_lights + (1 if meta.has_env else 0)
        return jnp.full(jnp.shape(light_idx), 1.0 / max(n_total, 1), jnp.float32)
    p_inf = p_infinite(meta)
    total = jnp.maximum(scene.light_cdf[-1], 1e-20)
    return scene.light_power[light_idx] / total * (1.0 - p_inf)


def sample_light(
    scene: CompiledScene, meta: SceneMeta, p, uc, u, kind: str = "power"
) -> LightSample:
    """Power/Uniform LightSampler::sample + Light::sample, batched.

    p: [N, 3] shading points; uc: [N] selector; u: [N, 2];
    kind: "power" (light-sampler.cpp:52-78) or "uniform" (:11-21, env
    occupying the last index).
    """
    n = p.shape[0]
    if kind == "uniform":
        n_total = meta.n_lights + (1 if meta.has_env else 0)
        pick = jnp.clip(
            (uc * n_total - 0.01).astype(jnp.int32), 0, max(n_total - 1, 0)
        )
        pick_env = (
            (pick == meta.n_lights) if meta.has_env else jnp.zeros((n,), bool)
        )
        p_inf = 0.0
        uniform_sel = jnp.full((n,), 1.0 / max(n_total, 1), jnp.float32)
    else:
        p_inf = p_infinite(meta)
        pick_env = uc < p_inf if meta.has_env else jnp.zeros((n,), bool)

    # ---- area light branch (power CDF; light-sampler.cpp:69-78) ----
    if meta.n_lights > 0:
        if kind == "uniform":
            li = jnp.clip(pick, 0, meta.n_lights - 1)
        # findFirst over the power CDF (light-sampler.cpp:71-75) as a
        # broadcast compare-and-sum: batched searchsorted lowers poorly on
        # TPU, and L is small.
        if kind != "uniform":
            u_area = jnp.where(
                p_inf < 1.0, (uc - p_inf) / max(1.0 - p_inf, 1e-9), 0.0
            )
            target = u_area * scene.light_cdf[-1]
            li = jnp.clip(
                jnp.sum(
                    (scene.light_cdf[None, 1:] <= target[:, None]).astype(
                        jnp.int32
                    ),
                    axis=-1,
                ),
                0,
                meta.n_lights - 1,
            )
        # One packed one-hot fetch of all per-light data (gather-free).
        lpack = jnp.concatenate(
            [
                scene.light_verts.reshape(-1, 9),   # 0:9
                scene.light_norms.reshape(-1, 9),   # 9:18
                scene.light_emission,               # 18:21
                scene.light_area[:, None],          # 21
                scene.light_power[:, None],         # 22
            ],
            axis=1,
        )
        rows = onehot_matmul(lpack, li)
        b = warps.sample_tri_uniform(u)
        b0, b1, b2 = b[:, 0:1], b[:, 1:2], b[:, 2:3]
        # barycentric interpolation as elementwise ops (a batched einsum
        # lowers to N tiny matmuls on TPU — pathological)
        pos = b0 * rows[:, 0:3] + b1 * rows[:, 3:6] + b2 * rows[:, 6:9]
        nrm = b0 * rows[:, 9:12] + b1 * rows[:, 12:15] + b2 * rows[:, 15:18]
        wi_area = normalize(pos - p)
        pdf_area = 1.0 / jnp.maximum(rows[:, 21], 1e-20)
        li_rgb = rows[:, 18:21]
        if kind == "uniform":
            sel_area = uniform_sel
        else:
            total = jnp.maximum(scene.light_cdf[-1], 1e-20)
            sel_area = rows[:, 22] / total * (1.0 - p_inf)
    else:
        pos = jnp.zeros_like(p)
        nrm = jnp.zeros_like(p)
        wi_area = jnp.zeros_like(p)
        pdf_area = jnp.zeros((n,), jnp.float32)
        li_rgb = jnp.zeros_like(p)
        sel_area = jnp.zeros((n,), jnp.float32)

    # ---- env branch (light.cpp:219-238) ----
    if meta.has_env:
        # Alias draw over the bilinear base-cell grid: one row gather picks
        # the cell (u.x also yields one intra-cell jitter coordinate); a
        # second row fetch returns radiance + pdf together. Sample
        # PLACEMENT differs from the reference's 2-step CDF inversion (a
        # documented statistical-match departure, like the alpha stream);
        # the pdf is exactly the realized sampling density, so the
        # estimator stays unbiased and MIS weights stay consistent.
        cell, pdf_uv, r = sample_alias_rows(scene.env_alias, u[:, 0])
        wc, hc = meta.env_wc, meta.env_hc
        iu = (cell % wc).astype(jnp.float32)
        iv = (cell // wc).astype(jnp.float32)
        jit2 = jnp.minimum(u[:, 1], ONE_MINUS_EPS)
        uv = jnp.stack(
            [(iu + r) / wc, (iv + jit2) / hc], axis=-1
        )
        wi_env = inv_octahedral_uv(uv) @ scene.env_rotation
        li_env, _ = _env_fetch(scene, meta, uv)
        pdf_env = pdf_uv / FOUR_PI
        pos_env = wi_env * 2.0 * scene.scene_radius
        if kind == "uniform":
            sel_env = uniform_sel
        else:
            sel_env = jnp.full((n,), p_inf / 1.0, jnp.float32)
        # UniformInfiniteLight: sample() is disabled (light.cpp:112-133) but
        # the light still occupies the reserved pInf slot, so those draws
        # yield no NEE contribution — same estimator as the reference.
        env_ok = (pdf_uv > 0.0) & meta.env_sampleable
    else:
        wi_env = jnp.zeros_like(p)
        li_env = jnp.zeros_like(p)
        pdf_env = jnp.zeros((n,), jnp.float32)
        pos_env = jnp.zeros_like(p)
        sel_env = jnp.zeros((n,), jnp.float32)
        env_ok = jnp.zeros((n,), bool)

    pe = pick_env[..., None]
    valid = jnp.where(
        pick_env, env_ok, jnp.ones((n,), bool) if meta.n_lights else False
    )
    return LightSample(
        Li=jnp.where(pe, li_env, li_rgb),
        wi=jnp.where(pe, wi_env, wi_area),
        p=jnp.where(pe, pos_env, pos),
        n=jnp.where(pe, -wi_env, nrm),
        pdf=jnp.where(pick_env, pdf_env, pdf_area),
        select_p=jnp.where(pick_env, sel_env, sel_area),
        is_env=pick_env,
        valid=valid,
    )
