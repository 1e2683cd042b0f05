"""GLB exporter (io/glb_export.py) round-trip: export a SceneBuilder
scene to .glb, reload it with scene/gltf.py, and verify the compiled
scenes render identically. Texture values are chosen on the u8 grid so
storage -> sRGB8 -> storage is exact and the comparison can be strict."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from yart_tpu.config import CameraConfig, RenderConfig
from yart_tpu.io.glb_export import export_env_hdr, export_glb
from yart_tpu.ops.color import gamma2_encode_np, srgb_decode_np
from yart_tpu.render.renderer import Renderer
from yart_tpu.scene.builder import SceneBuilder
from yart_tpu.scene.gltf import load as gltf_load
from yart_tpu.scene.procedural import uv_sphere


def _u8_storage_rgba(rng, h, w, alpha=False):
    """Random texture whose storage values round-trip EXACTLY through the
    sRGB8 PNG: storage = gamma2(srgb_decode(u8/255))."""
    u8 = rng.integers(0, 256, size=(h, w, 4)).astype(np.float32) / 255.0
    out = u8.copy()
    out[..., :3] = gamma2_encode_np(srgb_decode_np(u8[..., :3]))
    if not alpha:
        out[..., 3] = 1.0
    return out


def _build_scene():
    rng = np.random.default_rng(3)
    b = SceneBuilder()
    t_base = b.add_texture("rgba", _u8_storage_rgba(rng, 16, 16))
    t_cut = b.add_texture("rgba", _u8_storage_rgba(rng, 8, 8, alpha=True))
    m_tex = b.add_material(roughness=0.6, tex_base=t_base)
    m_gold = b.add_material(
        base_color=(0.9, 0.7, 0.3, 1.0), metallic=1.0, roughness=0.3
    )
    m_glass = b.add_material(
        base_color=(1, 1, 1, 1), transmission=1.0, roughness=0.05, ior=1.45
    )
    m_cut = b.add_material(roughness=0.8, tex_base=t_cut, has_alpha=True)
    m_lamp = b.add_material(emission=(4.0, 3.0, 2.0), emission_strength=2.0)
    m_coat = b.add_material(
        base_color=(0.6, 0.05, 0.05, 1.0), roughness=0.4, clearcoat=0.8,
        cc_roughness=0.1,
    )
    m_vol = b.add_material(
        base_color=(1, 1, 1, 1), transmission=1.0, roughness=0.02,
        ior=1.5, thin=False, volume_color=(0.9, 0.6, 0.3),
        volume_density=2.0,
    )

    quad = np.asarray(
        [[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]], np.float32
    )
    quv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    qidx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    b.add_mesh(quad, qidx, m_tex, uvs=quv)

    pos, nrm, tri = uv_sphere((0.0, 0.8, 0.0), 0.5, n_theta=8, n_phi=12)
    b.add_mesh(pos, tri, m_gold, normals=nrm)
    pos, nrm, tri = uv_sphere((1.0, 0.6, 0.6), 0.35, n_theta=8, n_phi=12)
    b.add_mesh(pos, tri, m_glass, normals=nrm)

    cut = quad * 0.4 + np.asarray([[-1.0, 0.9, 0.5]], np.float32)
    b.add_mesh(cut, qidx, m_cut, uvs=quv)
    lamp = quad * 0.25 + np.asarray([[0.0, 2.2, 0.0]], np.float32)
    b.add_mesh(lamp, qidx[:, ::-1], m_lamp, uvs=quv)
    pos, nrm, tri = uv_sphere((-1.2, 0.5, -0.5), 0.3, n_theta=6, n_phi=8)
    b.add_mesh(pos, tri, m_coat, normals=nrm)
    pos, nrm, tri = uv_sphere((1.2, 0.5, -0.8), 0.3, n_theta=6, n_phi=8)
    b.add_mesh(pos, tri, m_vol, normals=nrm)
    return b


def test_roundtrip_geometry_and_materials(tmp_path):
    b = _build_scene()
    path = str(tmp_path / "scene.glb")
    stats = export_glb(b, path)
    assert stats["tris"] > 0 and stats["textures"] == 2

    b2 = gltf_load(path)
    # geometry identical (exporter and loader both keep f32 world space)
    p1 = np.concatenate([p for p in b._positions])
    p2 = np.concatenate([p for p in b2._positions])
    np.testing.assert_array_equal(p1, p2)
    n1 = np.concatenate([n for n in b._normals])
    n2 = np.concatenate([n for n in b2._normals])
    np.testing.assert_allclose(n1, n2, atol=2e-7)
    # textures round-trip exactly (u8-aligned storage)
    for ta, tb in zip(b.textures_rgba, b2.textures_rgba):
        np.testing.assert_allclose(ta, tb, atol=1e-6)
    # material scalars survive
    for ma, mb in zip(b._materials, b2._materials):
        np.testing.assert_allclose(
            ma.base_color, mb.base_color, atol=1e-6
        )
        assert abs(ma.metallic - mb.metallic) < 1e-6
        assert abs(ma.roughness - mb.roughness) < 1e-6
        assert abs(ma.transmission - mb.transmission) < 1e-6
        assert abs(ma.ior - mb.ior) < 1e-6
        assert ma.has_alpha == mb.has_alpha
        ea = np.asarray(ma.emission) * ma.emission_strength
        eb = np.asarray(mb.emission) * mb.emission_strength
        np.testing.assert_allclose(ea, eb, rtol=1e-5, atol=1e-6)
        assert abs(ma.clearcoat - mb.clearcoat) < 1e-6
        if ma.clearcoat > 0:  # cc_roughness inert (loader floors it) else
            assert abs(ma.cc_roughness - mb.cc_roughness) < 1e-6
        np.testing.assert_allclose(
            ma.volume_color, mb.volume_color, atol=1e-6
        )
        np.testing.assert_allclose(
            ma.volume_density, mb.volume_density, rtol=1e-6, atol=1e-9
        )
        if ma.volume_density > 0:
            assert not mb.thin  # volume implies solid transmission


def test_roundtrip_render_matches(tmp_path):
    b = _build_scene()
    path = str(tmp_path / "scene.glb")
    export_glb(b, path)
    b2 = gltf_load(path)

    cam = CameraConfig(
        image_size=(24, 24), focal_length=30.0, position=(0, 1.2, 4.0),
        forward=(0, -0.2, -1),
    )
    cfg = RenderConfig(samples=4, max_depth=4, tonemap="none",
                       estimator="mean", first_wave_samples=4)
    s1, m1 = b.compile()
    s2, m2 = b2.compile()
    r1 = Renderer(s1, m1, cam, cfg).render()
    r2 = Renderer(s2, m2, cam, cfg).render()
    np.testing.assert_allclose(r1.hdr, r2.hdr, rtol=1e-5, atol=1e-5)


def test_env_hdr_export(tmp_path):
    from yart_tpu.io.image import load_hdr

    b = _build_scene()
    env = np.abs(
        np.random.default_rng(5).normal(size=(16, 16, 3))
    ).astype(np.float32)
    b.set_env(env, scale=2.0)
    path = str(tmp_path / "env.hdr")
    assert export_env_hdr(b, path)
    back = load_hdr(path)
    # RGBE shares one exponent across channels: error is bounded relative
    # to each pixel's MAX channel (~1/256), not per channel.
    bound = env.max(axis=-1, keepdims=True) / 128.0 + 1e-4
    assert np.all(np.abs(back - env) <= bound)
