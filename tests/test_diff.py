"""Gradient checks: AD vs finite differences (SURVEY.md §4.4 / BASELINE
north star). Deterministic rendering makes central differences exact for
parameters that don't alter sampling decisions (base_color, emission)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yart_tpu.config import CameraConfig, RenderConfig
from yart_tpu.ops.qmc import make_sampler
from yart_tpu.render.camera import build_camera
from yart_tpu.render.diff import env_grads, material_grads, render_image_diff
from yart_tpu.render.integrator import render_wave
from yart_tpu.scene.procedural import cornell_box


@pytest.fixture(scope="module")
def setup():
    scene, meta = cornell_box().compile()
    size = (12, 12)
    cam = build_camera(
        CameraConfig(image_size=size, focal_length=28.0,
                     position=(0, 1.0, 3.4), forward=(0, 0, -1))
    )
    # rr_start_depth > max_depth disables roulette: its kill decision is a
    # discontinuity that central differences see but detached AD does not.
    cfg = RenderConfig(samples=4, max_depth=3, rr_start_depth=99)
    sampler = make_sampler(cfg.sampler, cfg.samples, size, cfg.seed)
    yy, xx = np.meshgrid(np.arange(12), np.arange(12), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), 4), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), 4), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(4), 144), jnp.uint32)
    return scene, meta, cam, sampler, cfg, px, py, sidx


def test_diff_forward_matches_primal(setup):
    """differentiable=True must not change the rendered values."""
    scene, meta, cam, sampler, cfg, px, py, sidx = setup
    a, _ = jax.jit(
        lambda: render_wave(scene, meta, cam, sampler, cfg, px, py, sidx)
    )()
    b, _ = jax.jit(
        lambda: render_wave(
            scene, meta, cam, sampler, cfg, px, py, sidx, differentiable=True
        )
    )()
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_base_color_grad_matches_fd(setup):
    """d(mean image)/d(white-wall albedo) by AD vs central differences."""
    scene, meta, cam, sampler, cfg, px, py, sidx = setup

    def loss_of_base(delta):
        mats = scene.materials
        base = mats.base_color.at[0, 0].add(delta)  # red channel of wall mat
        s = scene._replace(materials=mats._replace(base_color=base))
        radiance, _ = render_image_diff(s, meta, cam, sampler, cfg, px, py, sidx)
        return jnp.mean(radiance)

    f = jax.jit(loss_of_base)
    g_ad = float(jax.jit(jax.grad(loss_of_base))(0.0))
    h = 0.02
    g_fd = (float(f(h)) - float(f(-h))) / (2 * h)
    assert g_ad > 0.0  # brighter walls -> brighter image
    np.testing.assert_allclose(g_ad, g_fd, rtol=0.08)


def test_emission_grad_matches_fd(setup):
    scene, meta, cam, sampler, cfg, px, py, sidx = setup
    light_mat = 3  # cornell_box registers the light material fourth

    def loss_of_emission(scale):
        mats = scene.materials
        em = mats.emission.at[light_mat].mul(1.0 + scale)
        s = scene._replace(materials=mats._replace(emission=em))
        radiance, _ = render_image_diff(s, meta, cam, sampler, cfg, px, py, sidx)
        return jnp.mean(radiance)

    f = jax.jit(loss_of_emission)
    g_ad = float(jax.jit(jax.grad(loss_of_emission))(0.0))
    h = 0.05
    g_fd = (float(f(h)) - float(f(-h))) / (2 * h)
    assert g_ad > 0.0
    np.testing.assert_allclose(g_ad, g_fd, rtol=0.08)


def test_texture_grad_matches_fd():
    """d(mean image)/d(texel red channel) through the bilinear atlas fetch
    (BASELINE config 3: texture-content gradients), AD vs central FD."""
    from yart_tpu.render.diff import texture_grads
    from yart_tpu.scene.procedural import textured_box_scene

    scene, meta = textured_box_scene().compile()
    size = (10, 10)
    cam = build_camera(
        CameraConfig(image_size=size, focal_length=26.0,
                     position=(0.0, 1.2, 4.0), forward=(0, -0.15, -1))
    )
    cfg = RenderConfig(samples=2, max_depth=3, rr_start_depth=99)
    sampler = make_sampler(cfg.sampler, cfg.samples, size, cfg.seed)
    yy, xx = np.meshgrid(np.arange(10), np.arange(10), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), 2), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), 2), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(2), 100), jnp.uint32)

    val, g = texture_grads(
        scene, meta, cam, sampler, cfg, px, py, sidx,
        loss_fn=lambda img: jnp.mean(img), kind="rgba",
    )
    g = np.asarray(g)
    assert np.isfinite(float(val))
    assert g.shape == scene.tex_rgba.data.shape
    assert np.isfinite(g).all() and np.abs(g).sum() > 0.0

    # FD against a global red-channel shift of the atlas (sum of texel
    # grads = directional derivative along that shift).
    def loss_of_shift(delta):
        from yart_tpu.render.texture import qrows_from_data

        data = scene.tex_rgba.data.at[..., 0].add(delta)
        s = scene._replace(tex_rgba=scene.tex_rgba._replace(
            data=data, qrows=qrows_from_data(data)))
        radiance, _ = render_image_diff(s, meta, cam, sampler, cfg, px, py, sidx)
        return jnp.mean(radiance)

    f = jax.jit(loss_of_shift)
    h = 0.02
    g_fd = (float(f(h)) - float(f(-h))) / (2 * h)
    g_ad = float(g[..., 0].sum())
    assert g_ad > 0.0  # brighter albedo -> brighter image
    np.testing.assert_allclose(g_ad, g_fd, rtol=0.08)


def _plane_light_scene():
    """Huge diffuse receiver plane at z=0 lit by a small area light at z=3
    (behind the camera): every camera ray hits the plane's interior and
    every shadow ray is unoccluded, so moving the plane along z changes the
    image smoothly — the clean fixture for interior geometry derivatives."""
    from yart_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    white = b.add_material(base_color=(0.7, 0.7, 0.7, 1.0), roughness=1.0)
    light = b.add_material(
        base_color=(0.0, 0.0, 0.0, 1.0), roughness=1.0,
        emission=(1.0, 1.0, 1.0), emission_strength=20.0,
    )
    s = 50.0
    recv = np.asarray(
        [[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]], np.float32
    )
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    b.add_mesh(recv, idx, white)
    lamp = np.asarray(
        [[-0.5, -0.5, 3], [-0.5, 0.5, 3], [0.5, 0.5, 3], [0.5, -0.5, 3]],
        np.float32,
    )
    b.add_mesh(lamp, idx, light)
    return b.compile()


def test_geometry_grad_matches_fd():
    """d(mean image)/d(receiver plane z) through the differentiable
    Moller-Trumbore refit (cfg.diff_geometry), AD vs central FD. Moving the
    plane towards the light shortens every NEE distance -> brighter."""
    import dataclasses

    scene, meta = _plane_light_scene()
    size = (8, 8)
    cam = build_camera(
        CameraConfig(image_size=size, focal_length=35.0,
                     position=(0, 0, 2.0), forward=(0, 0, -1))
    )
    cfg = dataclasses.replace(
        RenderConfig(samples=4, max_depth=3, rr_start_depth=99),
        diff_geometry=True,
    )
    sampler = make_sampler(cfg.sampler, cfg.samples, size, cfg.seed)
    yy, xx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), 4), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), 4), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(4), 64), jnp.uint32)

    recv_verts = jnp.arange(4)  # builder order: receiver mesh first

    def loss_of_dz(dz):
        pos = scene.positions.at[recv_verts, 2].add(dz)
        s = scene._replace(positions=pos)
        radiance, _ = render_image_diff(s, meta, cam, sampler, cfg, px, py, sidx)
        return jnp.mean(radiance)

    f = jax.jit(loss_of_dz)
    g_ad = float(jax.jit(jax.grad(loss_of_dz))(0.0))
    h = 0.02
    g_fd = (float(f(h)) - float(f(-h))) / (2 * h)
    assert g_ad > 0.0  # plane closer to the light -> brighter
    np.testing.assert_allclose(g_ad, g_fd, rtol=0.08)


def test_geometry_grads_api():
    from yart_tpu.render.diff import geometry_grads

    scene, meta = _plane_light_scene()
    size = (6, 6)
    cam = build_camera(
        CameraConfig(image_size=size, focal_length=35.0,
                     position=(0, 0, 2.0), forward=(0, 0, -1))
    )
    cfg = RenderConfig(samples=2, max_depth=3, rr_start_depth=99)
    sampler = make_sampler(cfg.sampler, cfg.samples, size, cfg.seed)
    yy, xx = np.meshgrid(np.arange(6), np.arange(6), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), 2), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), 2), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(2), 36), jnp.uint32)

    val, g = geometry_grads(
        scene, meta, cam, sampler, cfg, px, py, sidx,
        loss_fn=lambda img: jnp.mean(img),
    )
    g = np.asarray(g)
    assert np.isfinite(float(val))
    assert g.shape == scene.positions.shape
    assert np.isfinite(g).all() and np.abs(g).sum() > 0.0


def test_diff_geometry_forward_close_to_primal(setup):
    """The MT refit re-derives t/u/v from raw vertices; forward radiance
    must agree with the traversal-parameter path to float tolerance."""
    import dataclasses

    scene, meta, cam, sampler, cfg, px, py, sidx = setup
    a, _ = jax.jit(
        lambda: render_wave(scene, meta, cam, sampler, cfg, px, py, sidx)
    )()
    cfg_g = dataclasses.replace(cfg, diff_geometry=True)
    b, _ = jax.jit(
        lambda: render_wave(
            scene, meta, cam, sampler, cfg_g, px, py, sidx,
            differentiable=True,
        )
    )()
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_material_grads_api(setup):
    scene, meta, cam, sampler, cfg, px, py, sidx = setup
    val, grads = material_grads(
        scene, meta, cam, sampler, cfg, px, py, sidx,
        loss_fn=lambda img: jnp.mean(img),
    )
    assert np.isfinite(float(val))
    g_base = np.asarray(grads["base_color"])
    assert g_base.shape == scene.materials.base_color.shape
    assert np.isfinite(g_base).all()
    # Wall albedo must matter; metallic of pure-diffuse walls shouldn't be NaN.
    assert np.abs(g_base).sum() > 0.0


def test_geometry_grads_glass_scene_finite():
    """Geometry gradients through specular glass + metal (cornell-mat):
    reverse mode must stay finite through refract/TIR, _safe_div and the
    GGX phi-term divisions (each was a 0-cotangent * inf NaN source)."""
    from yart_tpu.render.diff import geometry_grads

    scene, meta = cornell_box(extra_materials=True).compile()
    size = (8, 8)
    cam = build_camera(
        CameraConfig(image_size=size, focal_length=28.0,
                     position=(0, 1.0, 3.4), forward=(0, 0, -1))
    )
    cfg = RenderConfig(samples=2, max_depth=4, rr_start_depth=99)
    sampler = make_sampler(cfg.sampler, cfg.samples, size, cfg.seed)
    yy, xx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), 2), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), 2), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(2), 64), jnp.uint32)

    val, g = geometry_grads(
        scene, meta, cam, sampler, cfg, px, py, sidx,
        loss_fn=lambda img: jnp.mean(img),
    )
    g = np.asarray(g)
    assert np.isfinite(float(val))
    assert np.isfinite(g).all() and np.abs(g).sum() > 0.0


# ---- round 4: differentiable fused shade path (shade_kernel="xla") ------

def test_shade_xla_diff_forward_matches(setup):
    """differentiable + shade_kernel='xla' must render the same image."""
    import dataclasses

    scene, meta, cam, sampler, cfg, px, py, sidx = setup
    cfg_x = dataclasses.replace(cfg, shade_kernel="xla")
    a, _ = jax.jit(
        lambda: render_wave(scene, meta, cam, sampler, cfg, px, py, sidx,
                            differentiable=True)
    )()
    b, _ = jax.jit(
        lambda: render_wave(scene, meta, cam, sampler, cfg_x, px, py, sidx,
                            differentiable=True)
    )()
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_shade_xla_grads_match_classic_and_fd():
    """Material grads through the fused shade math (detach=True) agree
    with the classic detached-sampling path AND with central differences,
    on a scene exercising metal + glass lobes."""
    import dataclasses

    from yart_tpu.scene.procedural import cornell_box

    scene, meta = cornell_box(extra_materials=True).compile()
    size = (12, 12)
    cam = build_camera(CameraConfig(
        image_size=size, focal_length=28.0, position=(0, 1.0, 3.4),
        forward=(0, 0, -1),
    ))
    cfg0 = RenderConfig(samples=4, max_depth=3, rr_start_depth=99)
    cfg_x = dataclasses.replace(cfg0, shade_kernel="xla")
    sampler = make_sampler(cfg0.sampler, cfg0.samples, size, cfg0.seed)
    yy, xx = np.meshgrid(np.arange(12), np.arange(12), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), 4), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), 4), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(4), 144), jnp.uint32)

    def make_loss(cfg):
        def loss(bc):
            s = scene._replace(
                materials=scene.materials._replace(base_color=bc)
            )
            rad, _ = render_wave(s, meta, cam, sampler, cfg, px, py, sidx,
                                 differentiable=True)
            return jnp.mean(rad)
        return loss

    bc = scene.materials.base_color
    g_classic = np.asarray(jax.jit(jax.grad(make_loss(cfg0)))(bc))
    g_xla = np.asarray(jax.jit(jax.grad(make_loss(cfg_x)))(bc))
    assert np.isfinite(g_xla).all()
    np.testing.assert_allclose(g_xla, g_classic, rtol=2e-4, atol=1e-6)

    # FD spot check: white-wall red channel
    f = jax.jit(make_loss(cfg_x))
    h = 0.02
    up = bc.at[0, 0].add(h)
    dn = bc.at[0, 0].add(-h)
    g_fd = (float(f(up)) - float(f(dn))) / (2 * h)
    np.testing.assert_allclose(float(g_xla[0, 0]), g_fd, rtol=0.08)


def test_geometry_grads_instanced():
    """Instanced diff_geometry (round 4): gradients flow to the SHARED
    object-space prototype vertices, accumulate across instances, and
    match central differences on proto_pos."""
    import dataclasses

    from yart_tpu.render.diff import geometry_grads
    from yart_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    white = b.add_material(base_color=(0.7, 0.7, 0.7, 1.0), roughness=1.0)
    light = b.add_material(
        base_color=(0.0, 0.0, 0.0, 1.0), roughness=1.0,
        emission=(1.0, 1.0, 1.0), emission_strength=20.0,
    )
    s = 25.0
    quad = np.asarray(
        [[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]], np.float32
    )
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    # TWO instances of one receiver prototype (side by side at z=0).
    p_recv = b.add_prototype(quad, idx, white)
    t1 = np.eye(4); t1[0, 3] = -s
    t2 = np.eye(4); t2[0, 3] = s
    b.add_instance(p_recv, t1)
    b.add_instance(p_recv, t2)
    lamp = np.asarray(
        [[-0.5, -0.5, 3], [-0.5, 0.5, 3], [0.5, 0.5, 3], [0.5, -0.5, 3]],
        np.float32,
    )
    p_lamp = b.add_prototype(lamp, idx, light)
    b.add_instance(p_lamp)
    scene, meta = b.compile()
    assert meta.n_instances == 3 and scene.proto_pos is not None

    size = (8, 8)
    cam = build_camera(
        CameraConfig(image_size=size, focal_length=35.0,
                     position=(0, 0, 2.0), forward=(0, 0, -1))
    )
    cfg = RenderConfig(samples=4, max_depth=3, rr_start_depth=99)
    cfg_g = dataclasses.replace(cfg, diff_geometry=True)
    sampler = make_sampler(cfg.sampler, cfg.samples, size, cfg.seed)
    yy, xx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), 4), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), 4), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(4), 64), jnp.uint32)

    val, g = geometry_grads(
        scene, meta, cam, sampler, cfg, px, py, sidx,
        loss_fn=lambda img: jnp.mean(img),
    )
    g = np.asarray(g)
    assert g.shape == scene.proto_pos.shape
    assert np.isfinite(g).all()
    # receiver proto verts are rows [0:4]; moving them toward the light
    # (z+) shortens NEE distances for BOTH instances -> positive grads.
    recv_gz = g[0:4, 2]
    assert np.all(recv_gz > 0)

    # AD of the proto-z shift equals the per-vertex grad sum.
    def loss_of_dz(dz):
        pp = scene.proto_pos.at[0:4, 2].add(dz)
        s2 = scene._replace(proto_pos=pp)
        from yart_tpu.render.diff import render_image_diff

        radiance, _ = render_image_diff(
            s2, meta, cam, sampler, cfg_g, px, py, sidx
        )
        return jnp.mean(radiance)

    g_ad = float(jax.jit(jax.grad(loss_of_dz))(0.0))
    np.testing.assert_allclose(g_ad, float(recv_gz.sum()), rtol=1e-4)

    # FD must move traversal AND refit together (perturbing proto_pos
    # alone puts refit points below the DETACHED traversal plane, whose
    # self-shadowing is a half-moved-geometry artifact, not a
    # derivative): rebuild the scene with the shifted prototype.
    def rebuilt_loss(dz):
        b2 = SceneBuilder()
        w2 = b2.add_material(base_color=(0.7, 0.7, 0.7, 1.0),
                             roughness=1.0)
        l2 = b2.add_material(
            base_color=(0.0, 0.0, 0.0, 1.0), roughness=1.0,
            emission=(1.0, 1.0, 1.0), emission_strength=20.0,
        )
        q2 = quad.copy()
        q2[:, 2] += dz
        pr = b2.add_prototype(q2, idx, w2)
        b2.add_instance(pr, t1)
        b2.add_instance(pr, t2)
        pl = b2.add_prototype(lamp, idx, l2)
        b2.add_instance(pl)
        s2, m2 = b2.compile()
        from yart_tpu.render.diff import render_image_diff

        radiance, _ = render_image_diff(
            s2, m2, cam, sampler, cfg_g, px, py, sidx
        )
        return float(jnp.mean(radiance))

    h = 0.02
    g_fd = (rebuilt_loss(h) - rebuilt_loss(-h)) / (2 * h)
    np.testing.assert_allclose(g_ad, g_fd, rtol=0.08)


# ---- round 5: staged compaction for the DIFFERENTIABLE scan -------------

def _env_setup():
    from yart_tpu.scene.procedural import material_test_spheres

    scene, meta = material_test_spheres().compile()
    size = (16, 16)
    cam = build_camera(
        CameraConfig(image_size=size, focal_length=26.0,
                     position=(0.0, 1.6, 5.0), forward=(0, -0.2, -1))
    )
    sampler_args = ("zsobol", 2, size, 0)
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), 2), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), 2), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(2), 256), jnp.uint32)
    return scene, meta, cam, sampler_args, px, py, sidx


def _diff_radiance_and_grad(scene, meta, cam, cfg, px, py, sidx,
                            sampler_args):
    sampler = make_sampler(*sampler_args)

    def loss(base_color):
        s = scene._replace(
            materials=scene.materials._replace(base_color=base_color)
        )
        radiance, _ = render_wave(
            s, meta, cam, sampler, cfg, px, py, sidx, differentiable=True
        )
        return jnp.mean(radiance), radiance

    (val, rad), g = jax.jit(
        jax.value_and_grad(loss, has_aux=True)
    )(scene.materials.base_color)
    return np.asarray(rad), np.asarray(g)


def test_diff_compact_bit_identical_env_scene():
    """The staged differentiable scan (full-width stage -> compaction ->
    compacted stage -> gated drain) must render the SAME radiance and the
    SAME gradients as the plain full-width scan. 512 lanes with factor 4
    -> cap=128; env escape retires most lanes so the drain stays empty."""
    scene, meta, cam, sargs, px, py, sidx = _env_setup()
    base = dict(samples=2, max_depth=4, rr_start_depth=99)
    cfg_off = RenderConfig(compact_depth=None, **base)
    cfg_on = RenderConfig(compact_depth=1, compact_factor=4, **base)
    rad0, g0 = _diff_radiance_and_grad(
        scene, meta, cam, cfg_off, px, py, sidx, sargs)
    rad1, g1 = _diff_radiance_and_grad(
        scene, meta, cam, cfg_on, px, py, sidx, sargs)
    np.testing.assert_allclose(rad0, rad1, atol=2e-6)
    assert np.abs(g0).sum() > 0
    np.testing.assert_allclose(g0, g1, rtol=2e-4, atol=1e-7)


def test_diff_compact_overflow_drain_exact(setup):
    """Closed scene (cornell: no lanes retire early) + a tiny cap forces
    REAL overflow lanes through the cond-gated drain scan: radiance and
    gradients must still match the uncompacted scan exactly."""
    scene, meta, cam, sampler, cfg, px, py, sidx = setup
    # 576 lanes; factor 4 -> cap=max(128, 144//128*128)=128 < 576 with
    # every lane still active at split=1 -> 448 overflow lanes drain.
    base = dict(samples=4, max_depth=3, rr_start_depth=99)
    cfg_off = RenderConfig(compact_depth=None, **base)
    cfg_on = RenderConfig(compact_depth=1, compact_factor=4, **base)
    sargs = ("zsobol", 4, (12, 12), 0)
    rad0, g0 = _diff_radiance_and_grad(
        scene, meta, cam, cfg_off, px, py, sidx, sargs)
    rad1, g1 = _diff_radiance_and_grad(
        scene, meta, cam, cfg_on, px, py, sidx, sargs)
    np.testing.assert_allclose(rad0, rad1, atol=2e-6)
    assert np.abs(g0).sum() > 0
    np.testing.assert_allclose(g0, g1, rtol=2e-4, atol=1e-7)


def test_diff_compact_fd_check_env_scene():
    """FD check THROUGH the compacted path itself (not just equality with
    the uncompacted one): d(mean)/d(floor red albedo).

    All evaluations go through ONE jitted value_and_grad (the FD values
    are its value outputs) — one trace, one executable. (This also kept
    the test alive while the round-5 tracer-leak bug was live: lazily
    imported module-level jnp constants leaked tracers across traces —
    root-caused and fixed, tools/diag_bufrepro.py.)"""
    scene, meta, cam, sargs, px, py, sidx = _env_setup()
    cfg = RenderConfig(samples=2, max_depth=4, rr_start_depth=99,
                       compact_depth=1, compact_factor=4)
    sampler = make_sampler(*sargs)

    def loss_of(delta):
        mats = scene.materials
        base = mats.base_color.at[0, 0].add(delta)
        s = scene._replace(materials=mats._replace(base_color=base))
        radiance, _ = render_wave(
            s, meta, cam, sampler, cfg, px, py, sidx, differentiable=True
        )
        return jnp.mean(radiance)

    vg = jax.jit(jax.value_and_grad(loss_of))
    _, g_ad = vg(0.0)
    g_ad = float(g_ad)
    h = 0.02
    vp, _ = vg(h)
    vm, _ = vg(-h)
    g_fd = (float(vp) - float(vm)) / (2 * h)
    assert g_ad > 0.0
    np.testing.assert_allclose(g_ad, g_fd, rtol=0.08)


def test_texture_grad_through_gated_alpha_traversal(monkeypatch):
    """VERDICT r4 weak #8: differentiate through an ALPHA-TESTED scene
    where the gated traversal's detached alpha stream reads the SAME
    rgba atlas that receives texture gradients. The gated blocktrace
    (interpret mode) is forced into the integrator's intersect calls;
    FD perturbs only the COLOR channels (alpha untouched, so the
    stochastic accept decisions are identical on both sides)."""
    import yart_tpu.render.integrator as integ
    from yart_tpu.render.blocktrace import intersect_blocktrace_gated
    from yart_tpu.render.diff import render_image_diff, texture_grads
    from yart_tpu.scene.procedural import textured_box_scene

    scene, meta = textured_box_scene().compile()
    assert meta.any_alpha

    def gated_intersect(scene, meta, o, d, t_max, t_min=1e-3, nee=False,
                        alpha_seed=None, **kw):
        return intersect_blocktrace_gated(
            scene, meta, o, d, t_max, t_min=t_min, nee=nee,
            alpha_seed=alpha_seed, interpret=True,
        )

    monkeypatch.setattr(integ, "intersect", gated_intersect)

    size = (8, 8)
    cam = build_camera(
        CameraConfig(image_size=size, focal_length=26.0,
                     position=(0.0, 1.2, 4.0), forward=(0, -0.15, -1))
    )
    cfg = RenderConfig(samples=2, max_depth=3, rr_start_depth=99)
    sampler = make_sampler(cfg.sampler, cfg.samples, size, cfg.seed)
    yy, xx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), 2), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), 2), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(2), 64), jnp.uint32)

    val, g = texture_grads(
        scene, meta, cam, sampler, cfg, px, py, sidx,
        loss_fn=lambda img: jnp.mean(img), kind="rgba",
    )
    g = np.asarray(g)
    assert np.isfinite(float(val))
    assert np.isfinite(g).all() and np.abs(g).sum() > 0.0

    def loss_of_shift(delta):
        from yart_tpu.render.texture import qrows_from_data

        data = scene.tex_rgba.data.at[..., :3].add(delta)
        s = scene._replace(tex_rgba=scene.tex_rgba._replace(
            data=data, qrows=qrows_from_data(data)))
        radiance, _ = render_image_diff(
            s, meta, cam, sampler, cfg, px, py, sidx)
        return jnp.mean(radiance)

    f = jax.jit(loss_of_shift)
    h = 0.02
    g_fd = (float(f(h)) - float(f(-h))) / (2 * h)
    g_ad = float(g[..., :3].sum())
    assert g_ad > 0.0
    np.testing.assert_allclose(g_ad, g_fd, rtol=0.08)


def test_rr_on_grads_unbiased(setup):
    """Roulette in diff mode (round 5): the kill probability and its
    1/(1-q) reweight are DETACHED (differentiating the reweight without
    the invisible kill-indicator boundary term adds a spurious
    f*q'/(1-q) bias). The RR-on gradient is then an unbiased estimator
    of the RR-off one: at matched seeds and enough samples the two must
    agree to Monte-Carlo noise."""
    scene, meta, cam, sampler_, cfg_, px, py, sidx = setup
    size = (12, 12)
    spp = 16
    sampler = make_sampler("zsobol", spp, size, 0)
    yy, xx = np.meshgrid(np.arange(12), np.arange(12), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), spp), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), spp), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(spp), 144), jnp.uint32)

    def grad_for(rr_start):
        cfg = RenderConfig(samples=spp, max_depth=5,
                           rr_start_depth=rr_start)

        def loss(base_color):
            s = scene._replace(
                materials=scene.materials._replace(base_color=base_color)
            )
            radiance, _ = render_wave(
                s, meta, cam, sampler, cfg, px, py, sidx,
                differentiable=True,
            )
            return jnp.mean(radiance)

        return np.asarray(jax.jit(jax.grad(loss))(
            scene.materials.base_color))

    g_rr = grad_for(2)
    g_off = grad_for(99)
    assert np.isfinite(g_rr).all()
    # Same estimator in expectation; RR adds variance only in the deep
    # bounces, so matched-seed agreement is tight on the dominant rows.
    big = np.abs(g_off) > 0.05 * np.abs(g_off).max()
    np.testing.assert_allclose(g_rr[big], g_off[big], rtol=0.25)


def test_env_grads_fd_and_compact_equality():
    """Environment-image gradients: AD (env_grads) vs central FD on a
    uniform env shift, plus equality between the uncompacted and staged-
    compaction diff scans (round-5 coverage for the env backward path —
    previously a single smoke test)."""
    from yart_tpu.render.diff import env_grads
    from yart_tpu.render.lights import env_rows_from_image

    scene, meta, cam, sargs, px, py, sidx = _env_setup()
    sampler = make_sampler(*sargs)

    def run(cfg):
        val, g = env_grads(
            scene, meta, cam, sampler, cfg, px, py, sidx,
            loss_fn=lambda img: jnp.mean(img),
        )
        return float(val), np.asarray(g)

    cfg_off = RenderConfig(samples=2, max_depth=4, rr_start_depth=99,
                           compact_depth=None)
    cfg_on = RenderConfig(samples=2, max_depth=4, rr_start_depth=99,
                          compact_depth=1, compact_factor=4)
    v0, g0 = run(cfg_off)
    v1, g1 = run(cfg_on)
    assert np.isfinite(g0).all() and np.abs(g0).sum() > 0
    np.testing.assert_allclose(v0, v1, rtol=1e-6)
    np.testing.assert_allclose(g0, g1, rtol=2e-4, atol=1e-7)

    # FD along a uniform brightness shift of the env image (alias table /
    # sampling decisions are detached and unchanged by the shift).
    def loss_of(delta):
        img = scene.env_image + delta
        s = scene._replace(
            env_image=img,
            env_rows=env_rows_from_image(img, scene.env_pdf_cells),
        )
        from yart_tpu.render.diff import render_image_diff

        radiance, _ = render_image_diff(
            s, meta, cam, sampler, cfg_off, px, py, sidx
        )
        return jnp.mean(radiance)

    f = jax.jit(loss_of)
    h = 0.02
    g_fd = (float(f(h)) - float(f(-h))) / (2 * h)
    g_ad = float(g0.sum())
    assert g_ad > 0.0  # brighter sky -> brighter image
    np.testing.assert_allclose(g_ad, g_fd, rtol=0.08)


def test_diff_auto_compaction_rr_on_env_scene():
    """The production fwd+bwd shape (atrium_fwdbwd_rr bench row): env
    scene + roulette ON + compact_depth='auto' resolves to (2, factor)
    in diff mode. Forward must match the primal render bit-for-bit and
    gradients must be finite and match the explicitly-uncompacted scan."""
    scene, meta, cam, sargs, px, py, sidx = _env_setup()
    base = dict(samples=2, max_depth=6, rr_start_depth=2)
    cfg_auto = RenderConfig(compact_depth="auto", compact_factor=4, **base)
    cfg_off = RenderConfig(compact_depth=None, **base)
    sampler = make_sampler(*sargs)

    prim, _ = jax.jit(
        lambda s: render_wave(s, meta, cam, sampler, cfg_auto, px, py,
                              sidx)
    )(scene)
    rad_a, g_a = _diff_radiance_and_grad(
        scene, meta, cam, cfg_auto, px, py, sidx, sargs)
    rad_o, g_o = _diff_radiance_and_grad(
        scene, meta, cam, cfg_off, px, py, sidx, sargs)
    np.testing.assert_allclose(np.asarray(prim), rad_a, atol=2e-5)
    assert np.isfinite(g_a).all() and np.abs(g_a).sum() > 0
    np.testing.assert_allclose(g_a, g_o, rtol=2e-4, atol=1e-7)
