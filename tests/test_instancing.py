"""Instancing (scene/builder.py add_prototype/add_instance): instanced
scenes must render like the equivalent baked scene (the reference shares one
Mesh across Nodes and transforms rays per node, scene.hpp:48-66 +
ray-integrator.cpp:20-54; round 1 baked every instance into world space,
duplicating the heavy per-tri data)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yart_tpu.config import CameraConfig, RenderConfig
from yart_tpu.render.intersect import intersect
from yart_tpu.render.renderer import Renderer
from yart_tpu.scene.builder import SceneBuilder
from yart_tpu.scene.procedural import uv_sphere, _quad


def _transforms():
    t1 = np.eye(4)
    t1[:3, 3] = (-0.9, 0.7, 0.0)
    t2 = np.eye(4)
    # rotation about y + nonuniform scale + translation
    c, s = np.cos(0.7), np.sin(0.7)
    t2[:3, :3] = np.asarray(
        [[c, 0, s], [0, 1, 0], [-s, 0, c]]
    ) @ np.diag([0.6, 1.3, 0.8])
    t2[:3, 3] = (1.0, 0.9, -0.4)
    return t1, t2


def _scene(instanced: bool):
    b = SceneBuilder()
    m_diff = b.add_material(base_color=(0.7, 0.4, 0.3, 1.0), roughness=0.7)
    m_emit = b.add_material(base_color=(0, 0, 0, 1), emission=(6, 5, 4))
    m_floor = b.add_material(roughness=0.9)

    pos, nrm, tri = uv_sphere((0.0, 0.0, 0.0), 0.6, n_theta=10, n_phi=16)
    t1, t2 = _transforms()
    if instanced:
        pid = b.add_prototype(pos, tri, m_diff, normals=nrm)
        pe = b.add_prototype(pos, tri, m_emit, normals=nrm)
        b.add_instance(pid, t1)
        b.add_instance(pid, t2)
        b.add_instance(pe, np.diag([0.3, 0.3, 0.3, 1.0]) + np.asarray(
            [[0, 0, 0, 0], [0, 0, 0, 1.6], [0, 0, 0, 0], [0, 0, 0, 0.0]]))
    else:
        b.add_mesh(pos, tri, m_diff, normals=nrm, transform=t1)
        b.add_mesh(pos, tri, m_diff, normals=nrm, transform=t2)
        te = np.diag([0.3, 0.3, 0.3, 1.0])
        te[1, 3] = 1.6
        b.add_mesh(pos, tri, m_emit, normals=nrm, transform=te)
    # floor quad stays a plain (legacy) mesh in BOTH builds — mixing baked
    # meshes and instances must compile.
    fp, ft = _quad(
        (-3, -0.61, -3), (3, -0.61, -3), (3, -0.61, 3), (-3, -0.61, 3)
    )
    b.add_mesh(fp, ft, m_floor)
    b.set_env_uniform((0.4, 0.4, 0.45))
    return b.compile()


def test_instanced_compile_shares_prototypes():
    scene, meta = _scene(True)
    assert meta.n_instances == 4  # 3 spheres + the floor as identity inst
    assert len(scene.protos) == 3  # sphere-diff, sphere-emit, floor
    # The two diffuse sphere instances SHARE one prototype's packs.
    assert meta.inst_proto[0] == meta.inst_proto[1]
    assert meta.n_lights > 0  # emissive instance registered area lights


def test_instanced_closest_hit_matches_baked():
    scene_i, meta_i = _scene(True)
    scene_b, meta_b = _scene(False)
    rng = np.random.default_rng(3)
    n = 512
    o = jnp.asarray(rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    hi = jax.jit(
        lambda o, d: intersect(scene_i, meta_i, o, d, 100.0)
    )(o, d)
    hb = jax.jit(
        lambda o, d: intersect(scene_b, meta_b, o, d, 100.0)
    )(o, d)
    mi, mb = np.asarray(hi.mask), np.asarray(hb.mask)
    # Transform-at-trace vs baked-vertices round the same math differently;
    # grazing rays may disagree at the float edge.
    assert (mi == mb).mean() > 0.99
    both = mi & mb
    np.testing.assert_allclose(
        np.asarray(hi.t)[both], np.asarray(hb.t)[both], rtol=1e-3, atol=1e-3
    )
    # Same surfaces: compare material ids through each build's mapping.
    mat_i = np.asarray(scene_i.tri_aux)[np.asarray(hi.tri)[both], 3]
    srow_b = np.asarray(scene_b.shade_pack)[np.asarray(hb.tri)[both], 27]
    mat_b = srow_b.view(np.int32)
    assert (mat_i == mat_b).mean() > 0.995


def test_instanced_nee_occlusion_matches_baked():
    scene_i, meta_i = _scene(True)
    scene_b, meta_b = _scene(False)
    rng = np.random.default_rng(4)
    n = 256
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    hi = jax.jit(
        lambda o, d: intersect(scene_i, meta_i, o, d, 3.0, nee=True)
    )(o, d)
    hb = jax.jit(
        lambda o, d: intersect(scene_b, meta_b, o, d, 3.0, nee=True)
    )(o, d)
    assert (np.asarray(hi.mask) == np.asarray(hb.mask)).mean() > 0.99


def test_instanced_render_matches_baked():
    """Full MIS render (env + instanced emissive light + shading with
    instance-rotated normals) agrees with the baked build."""
    scene_i, meta_i = _scene(True)
    scene_b, meta_b = _scene(False)
    cam = CameraConfig(image_size=(24, 24), focal_length=26.0,
                       position=(0, 0.6, 4.0), forward=(0, -0.05, -1))
    cfg = RenderConfig(samples=16, max_depth=4, estimator="mean",
                       first_wave_samples=16, max_wave_samples=16)
    img_i = np.asarray(Renderer(scene_i, meta_i, cam, cfg).render().hdr)
    img_b = np.asarray(Renderer(scene_b, meta_b, cam, cfg).render().hdr)
    assert np.isfinite(img_i).all()
    # Identical sample streams; differences come only from float rounding
    # of transform-at-trace vs baked vertices (rare ulp flips at edges).
    close = np.isclose(img_i, img_b, rtol=2e-2, atol=2e-2).mean()
    assert close > 0.98
    np.testing.assert_allclose(img_i.mean(), img_b.mean(), rtol=5e-3)


def test_mirrored_instance_rejected():
    b = SceneBuilder()
    m = b.add_material()
    pos, nrm, tri = uv_sphere((0, 0, 0), 1.0, n_theta=6, n_phi=8)
    pid = b.add_prototype(pos, tri, m, normals=nrm)
    with pytest.raises(ValueError):
        b.add_instance(pid, np.diag([-1.0, 1.0, 1.0, 1.0]))


def test_instanced_blocktrace_matches_instance_loop():
    """The single-pass instanced fused kernel (interpret mode) agrees with
    the per-instance traversal loop."""
    from yart_tpu.render.blocktrace import intersect_blocktrace
    from yart_tpu.render.intersect import _intersect_instanced

    scene, meta = _scene(True)
    assert 0 < meta.n_inst_clusters <= 4096
    rng = np.random.default_rng(7)
    n = 384
    o = jnp.asarray(rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)

    hk = intersect_blocktrace(
        scene, meta, o, d, 100.0, interpret=True
    )
    hl = _intersect_instanced(scene, meta, o, d, 100.0)
    mk, ml = np.asarray(hk.mask), np.asarray(hl.mask)
    np.testing.assert_array_equal(mk, ml)
    np.testing.assert_allclose(
        np.asarray(hk.t)[mk], np.asarray(hl.t)[mk], rtol=2e-5, atol=2e-5
    )
    same = (np.asarray(hk.tri) == np.asarray(hl.tri)) & mk
    assert same.sum() >= 0.999 * mk.sum()

    # NEE any-hit agreement.
    hk2 = intersect_blocktrace(
        scene, meta, o, d, 4.0, nee=True, interpret=True
    )
    hl2 = _intersect_instanced(scene, meta, o, d, 4.0, nee=True)
    np.testing.assert_array_equal(
        np.asarray(hk2.mask), np.asarray(hl2.mask)
    )
