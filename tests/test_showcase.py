"""Flagship showcase scenes (scene/showcase.py) compile to reference-scale
scene data: triangle counts, texture atlas population, light registration,
env sky, and the feature flags that route the renderer through the gated
big-scene traversal (alpha ivy) and volume/clearcoat BSDF paths."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def atrium_scene():
    from yart_tpu.scene.showcase import atrium

    return atrium(ivy=True, tex_res=128).compile()


def test_atrium_scale_and_features(atrium_scene):
    scene, meta = atrium_scene
    assert meta.n_tris > 100_000  # Sponza-class (BASELINE.md flagship)
    assert meta.has_env  # octahedral sky HDRI
    assert meta.any_textures
    assert meta.any_alpha  # ivy routes through the gated traversal
    assert meta.n_lights >= 0
    assert scene.tex_rgb.data.size > 0  # atlas is populated
    # Big-scene dispatch: clusters within the fused-kernel id budget.
    from yart_tpu.render.blocktrace import MAX_CLUSTERS

    assert 8 < meta.n_clusters <= MAX_CLUSTERS


def test_atrium_camera_ray_hits(atrium_scene):
    """Camera-like rays from the CLI viewpoint actually see geometry (the
    flagship render is not a void)."""
    import jax.numpy as jnp

    from yart_tpu.render.intersect import intersect_bvh8

    scene, meta = atrium_scene
    rng = np.random.default_rng(3)
    n = 256
    o = np.tile(np.asarray([[-10.0, 1.8, 0.0]], np.float32), (n, 1))
    to = np.asarray([8.0, 2.6, 0.0], np.float32) - o
    d = to + rng.normal(size=(n, 3)).astype(np.float32) * 1.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    h = intersect_bvh8(scene, meta, jnp.asarray(o), jnp.asarray(d), 1e4)
    assert float(np.asarray(h.mask).mean()) > 0.6


def test_roadster_materials():
    from yart_tpu.scene.showcase import roadster

    scene, meta = roadster().compile()
    assert meta.n_tris > 10_000
    m = scene.materials
    # clearcoat paint, dielectric glass with volume, chrome metal
    assert float(np.asarray(m.clearcoat).max()) > 0.5
    assert float(np.asarray(m.transmission).max()) > 0.5
    assert float(np.asarray(m.volume_density).max()) > 0.0
    assert float(np.asarray(m.metallic).max()) > 0.9
    assert meta.has_env


def test_atrium_instanced_matches_baked():
    """atrium(instanced=True) shares column/planter prototypes (the
    per-tri tables drop ~2.7x) and intersects identically to the baked
    build."""
    import jax
    import jax.numpy as jnp
    from yart_tpu.render.intersect import intersect
    from yart_tpu.scene.showcase import atrium

    s_b, m_b = atrium(tex_res=64).compile()
    s_i, m_i = atrium(tex_res=64, instanced=True).compile()
    assert m_i.n_instances > 50 and len(s_i.protos) < m_i.n_instances
    assert m_i.n_tris == m_b.n_tris  # identical virtual geometry

    rng = np.random.default_rng(2)
    n = 256
    o = jnp.asarray(
        np.stack([rng.uniform(-10, 10, n), rng.uniform(0.2, 5.5, n),
                  rng.uniform(-4, 4, n)], -1).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    hb = jax.jit(lambda o, d: intersect(s_b, m_b, o, d, 100.0))(o, d)
    hi = jax.jit(lambda o, d: intersect(s_i, m_i, o, d, 100.0))(o, d)
    mb, mi = np.asarray(hb.mask), np.asarray(hi.mask)
    assert (mb == mi).mean() > 0.99
    both = mb & mi
    np.testing.assert_allclose(
        np.asarray(hb.t)[both], np.asarray(hi.t)[both], rtol=2e-4, atol=2e-4
    )


def test_luxball_scene():
    """LuxBall analog (src/main.cpp:37): smooth glass shell + metal core
    on a pedestal; a small render must be finite and show the bright env
    through-glass paths (transmission > 0 pixels)."""
    import jax.numpy as jnp
    import numpy as np

    from yart_tpu.config import CameraConfig, RenderConfig
    from yart_tpu.render.renderer import Renderer
    from yart_tpu.scene.showcase import luxball

    scene, meta = luxball().compile()
    assert meta.n_tris > 10_000
    m = scene.materials
    trans = np.asarray(m.transmission)
    metal = np.asarray(m.metallic)
    assert (trans > 0.99).any() and (metal > 0.99).any()
    cam = CameraConfig(image_size=(32, 32), focal_length=45.0,
                       position=(0.12, 0.28, 0.35),
                       forward=(-0.12, -0.22, -0.35), exposure=1.0)
    cfg = RenderConfig(samples=8, max_depth=6, tonemap="none",
                       estimator="mean", first_wave_samples=8,
                       max_wave_samples=8)
    img = Renderer(scene, meta, cam, cfg).render().hdr
    assert np.isfinite(img).all()
    assert float(jnp.mean(jnp.asarray(img))) > 0.01
