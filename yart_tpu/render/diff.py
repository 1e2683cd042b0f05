"""Differentiable rendering: gradients w.r.t. scene parameters.

A capability the CPU reference does not have (BASELINE.json north star):
pixel gradients with respect to material parameters, emission, and the
environment image, via the detached-sampling estimator in
`integrator.li(differentiable=True)`.

What is differentiable:
- all MaterialTable parameters that enter f/Le continuously (base_color,
  metallic, roughness*, transmission*, ior*, clearcoat*, emission,
  volume_color, volume_density),
- the env image (through Le lookups; its CDF is treated as fixed),
- texture contents (through the bilinear fetches),
- vertex positions (cfg.diff_geometry: each hit's t/u/v re-solved from
  `scene.positions` by Moller-Trumbore as an implicit function — the
  interior derivative; hit points, NEE distances/cosines and interpolated
  attributes all chain through it).

What is detached (biased-but-standard):
- visibility (BVH traversal, alpha tests) — geometry gradients therefore
  carry no silhouette/occlusion terms (the edge-sampling estimator is out
  of scope),
- sampled directions, pdfs, and lobe choices — so gradients of parameters
  that mostly act through the *sampling distribution* (roughness at low
  variance) are one-sided.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from yart_tpu.config import RenderConfig
from yart_tpu.render.camera import CameraParams
from yart_tpu.render.integrator import render_wave
from yart_tpu.scene.types import CompiledScene, MaterialTable, SceneMeta


def render_image_diff(
    scene: CompiledScene,
    meta: SceneMeta,
    cam: CameraParams,
    sampler,
    cfg: RenderConfig,
    px,
    py,
    sample_idx,
):
    """Differentiable radiance for a lane batch; same contract as
    integrator.render_wave."""
    return render_wave(
        scene, meta, cam, sampler, cfg, px, py, sample_idx, differentiable=True
    )


def material_grads(
    scene: CompiledScene,
    meta: SceneMeta,
    cam: CameraParams,
    sampler,
    cfg: RenderConfig,
    px,
    py,
    sample_idx,
    loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
    fields=None,
):
    """Gradient of loss_fn(mean radiance image) w.r.t. the material table.

    Returns (loss, MaterialTable-shaped gradients). Differentiates only the
    float-valued material fields (integer texture slots and bool flags get
    zero/None treatment by carrying them as non-diff aux). `fields` selects
    a subset (e.g. ["roughness"]) so the backward pass only builds cotangents
    for the parameters being optimized.
    """

    diff_fields = fields or [
        "base_color", "metallic", "roughness", "transmission", "ior",
        "anisotropic", "aniso_rotation", "clearcoat", "cc_roughness",
        "emission", "normal_scale", "volume_color", "volume_density",
    ]

    def split(mats: MaterialTable):
        diff = {k: getattr(mats, k) for k in diff_fields}
        aux = {
            k: getattr(mats, k)
            for k in MaterialTable._fields
            if k not in diff_fields
        }
        return diff, aux

    diff0, aux = split(scene.materials)

    def loss(diff):
        mats = MaterialTable(**{**aux, **diff})
        s = scene._replace(materials=mats)
        radiance, _ = render_image_diff(
            s, meta, cam, sampler, cfg, px, py, sample_idx
        )
        return loss_fn(radiance)

    val, grads = jax.value_and_grad(loss)(diff0)
    zeros = {
        k: None for k in MaterialTable._fields if k not in diff_fields
    }
    return val, {**zeros, **grads}


def env_grads(
    scene: CompiledScene,
    meta: SceneMeta,
    cam: CameraParams,
    sampler,
    cfg: RenderConfig,
    px,
    py,
    sample_idx,
    loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
):
    """Gradient of loss_fn(radiance) w.r.t. the environment image (its
    sampling alias table stays fixed — only Le lookups differentiate).
    Radiance fetches go through the packed env rows, so the rows are
    rebuilt from the differentiable image inside the loss."""
    from yart_tpu.render.lights import env_rows_from_image

    def loss(env_image):
        s = scene._replace(
            env_image=env_image,
            env_rows=env_rows_from_image(env_image, scene.env_pdf_cells),
        )
        radiance, _ = render_image_diff(
            s, meta, cam, sampler, cfg, px, py, sample_idx
        )
        return loss_fn(radiance)

    return jax.value_and_grad(loss)(scene.env_image)


def geometry_grads(
    scene: CompiledScene,
    meta: SceneMeta,
    cam: CameraParams,
    sampler,
    cfg: RenderConfig,
    px,
    py,
    sample_idx,
    loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
):
    """Gradient of loss_fn(radiance) w.r.t. vertex positions [V, 3].

    Interior-derivative estimator: visibility (which triangle each ray
    hits, shadow-ray occlusion) is detached; the hit parameters (t, u, v)
    are re-solved differentiably from the positions (integrator._refit_hit)
    so hit points, NEE geometry terms, volume path lengths and interpolated
    shading attributes all carry gradients. Silhouette terms are NOT
    estimated — gradients of a vertex moving across an occlusion boundary
    are one-sided, same stance as the sampled-direction detachment above.

    Vertex NORMALS are independent parameters (shade_pack rows interpolate
    asset normals, which are not derived from positions at render time);
    differentiate them via the shade_pack columns if needed.
    """
    import dataclasses

    cfg = dataclasses.replace(cfg, diff_geometry=True)

    if meta.n_instances:
        # Instanced: differentiate the shared OBJECT-space prototype
        # vertices (scene.proto_pos); gradients accumulate across every
        # instance of each prototype (integrator._refit_hit).
        def loss(proto_pos):
            s = scene._replace(proto_pos=proto_pos)
            radiance, _ = render_image_diff(
                s, meta, cam, sampler, cfg, px, py, sample_idx
            )
            return loss_fn(radiance)

        return jax.value_and_grad(loss)(scene.proto_pos)

    def loss(positions):
        s = scene._replace(positions=positions)
        radiance, _ = render_image_diff(
            s, meta, cam, sampler, cfg, px, py, sample_idx
        )
        return loss_fn(radiance)

    return jax.value_and_grad(loss)(scene.positions)


def texture_grads(
    scene: CompiledScene,
    meta: SceneMeta,
    cam: CameraParams,
    sampler,
    cfg: RenderConfig,
    px,
    py,
    sample_idx,
    loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
    kind: str = "rgba",
):
    """Gradient of loss_fn(radiance) w.r.t. one texture atlas's texel data
    (render/texture.py bilinear fetches are smooth in the texel values;
    BASELINE config 3). `kind` picks the channel class: rgba (base color +
    alpha), rgb (normal/emission), 2ch (metallic-roughness), mono
    (transmission/clearcoat). Returns (loss, d/d(atlas data [H, W, C]));
    note sRGB-class textures are stored gamma-2 encoded, so these are
    gradients w.r.t. the STORED encoding (chain through value**2 included).
    """
    field = {
        "rgba": "tex_rgba", "rgb": "tex_rgb", "2ch": "tex_2ch",
        "mono": "tex_mono",
    }[kind]
    stack = getattr(scene, field)

    from yart_tpu.render.texture import qrows_from_data

    def loss(data):
        s = scene._replace(**{field: stack._replace(
            data=data, qrows=qrows_from_data(data))})
        radiance, _ = render_image_diff(
            s, meta, cam, sampler, cfg, px, py, sample_idx
        )
        return loss_fn(radiance)

    return jax.value_and_grad(loss)(stack.data)
