"""Mesh-shape invariance: the image must be identical for ANY device mesh
because samplers are pure functions of (pixel, sample, dim) (SURVEY.md §2.6,
§4.5). Runs on the 8-device virtual CPU mesh from conftest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yart_tpu.config import CameraConfig, RenderConfig
from yart_tpu.ops.qmc import make_sampler
from yart_tpu.parallel.sharding import (
    device_put_lanes,
    make_mesh,
    shard_lanes,
)
from yart_tpu.render.camera import build_camera
from yart_tpu.render.integrator import render_wave
from yart_tpu.scene.procedural import cornell_box


@pytest.fixture(scope="module")
def setup():
    scene, meta = cornell_box().compile()
    size = (16, 16)
    cam = build_camera(
        CameraConfig(image_size=size, focal_length=28.0,
                     position=(0, 1.0, 3.4), forward=(0, 0, -1))
    )
    cfg = RenderConfig(samples=4, max_depth=4)
    sampler = make_sampler(cfg.sampler, cfg.samples, size, cfg.seed)

    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    px = jnp.asarray(xx.reshape(-1), jnp.int32)
    py = jnp.asarray(yy.reshape(-1), jnp.int32)
    sidx = jnp.zeros_like(px).astype(jnp.uint32)

    def step(px, py, sidx):
        return render_wave(scene, meta, cam, sampler, cfg, px, py, sidx)

    return step, (px, py, sidx)


def test_multi_device_available():
    assert len(jax.devices()) >= 8, jax.devices()


def test_image_invariant_under_mesh_shape(setup):
    step, (px, py, sidx) = setup

    ref, rays_ref = jax.jit(step)(px, py, sidx)
    ref = np.asarray(ref)

    for n_dev in (2, 8):
        mesh = make_mesh(n_dev)
        pxs, pys, sidxs = device_put_lanes(mesh, px, py, sidx)
        fn = jax.jit(step, in_shardings=(shard_lanes(mesh),) * 3)
        out, rays = fn(pxs, pys, sidxs)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)
        np.testing.assert_allclose(float(rays), float(rays_ref), rtol=1e-6)


def test_renderer_product_sharding():
    """The Renderer's --devices path (not just raw render_wave): a mesh
    renderer must produce the same image as the single-device one, counters
    included."""
    from yart_tpu.render.renderer import Renderer

    scene, meta = cornell_box().compile()
    cam = CameraConfig(image_size=(16, 16), focal_length=28.0,
                       position=(0, 1.0, 3.4), forward=(0, 0, -1))
    cfg = RenderConfig(samples=4, max_depth=4, first_wave_samples=4)

    r1 = Renderer(scene, meta, cam, cfg)
    r8 = Renderer(scene, meta, cam, cfg, devices=8)
    assert r8.n_devices == 8
    a = r1.render()
    b = r8.render()
    np.testing.assert_allclose(b.hdr, a.hdr, atol=1e-6)
    np.testing.assert_allclose(b.total_rays, a.total_rays, rtol=1e-6)


def test_graft_entry_dryrun():
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out, rays = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
    ge.dryrun_multichip(8)


def test_material_grads_mesh_invariant():
    """The DIFFERENTIABLE path under a device mesh (round 4): grads of a
    lane-sharded render w.r.t. the replicated material table are
    all-reduced by an XLA-inserted psum (the BASELINE.json north star:
    'parameter gradients all-reduced via psum overlapped with backward').
    Loss and grads must agree across mesh shapes; exact bit-equality is
    not guaranteed because the cross-shard psum reassociates the f32 lane
    reduction, hence tight allclose."""
    from yart_tpu.parallel.sharding import replicate

    scene, meta = cornell_box(extra_materials=True).compile()
    size = (16, 16)
    cam = build_camera(
        CameraConfig(image_size=size, focal_length=28.0,
                     position=(0, 1.0, 3.4), forward=(0, 0, -1))
    )
    cfg = RenderConfig(samples=4, max_depth=4, rr_start_depth=99)
    sampler = make_sampler(cfg.sampler, cfg.samples, size, cfg.seed)
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    px = jnp.asarray(xx.reshape(-1), jnp.int32)
    py = jnp.asarray(yy.reshape(-1), jnp.int32)
    sidx = jnp.zeros_like(px).astype(jnp.uint32)

    def loss(bc, px, py, sidx):
        s = scene._replace(
            materials=scene.materials._replace(base_color=bc)
        )
        rad, _ = render_wave(
            s, meta, cam, sampler, cfg, px, py, sidx, differentiable=True
        )
        return jnp.mean(rad)

    bc = scene.materials.base_color
    vg = jax.value_and_grad(loss)
    l_ref, g_ref = jax.jit(vg)(bc, px, py, sidx)
    l_ref, g_ref = float(l_ref), np.asarray(g_ref)
    assert np.isfinite(g_ref).all() and np.abs(g_ref).max() > 0

    for n_dev in (2, 8):
        mesh = make_mesh(n_dev)
        pxs, pys, sidxs = device_put_lanes(mesh, px, py, sidx)
        bcr = jax.device_put(bc, replicate(mesh))
        fn = jax.jit(
            vg,
            in_shardings=(replicate(mesh),) + (shard_lanes(mesh),) * 3,
        )
        l, g = fn(bcr, pxs, pys, sidxs)
        np.testing.assert_allclose(float(l), l_ref, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g), g_ref, rtol=2e-5, atol=1e-7
        )
        # The grad of a replicated parameter must come back replicated
        # (the psum happened inside the compiled graph).
        assert g.sharding.is_fully_replicated


def test_image_invariant_with_compaction():
    """Mesh-shape invariance THROUGH the staged wavefront compaction
    (cfg.compact_depth engages for env-lit scenes): the in-graph argsort
    + gathers must not break the bit-identical-images property."""
    import dataclasses

    from yart_tpu.scene.procedural import furnace

    scene, meta = furnace(env_value=0.5).compile()
    assert meta.has_env
    size = (16, 16)
    cam = build_camera(CameraConfig(
        image_size=size, focal_length=30.0, position=(0, 0, 3.5),
        forward=(0, 0, -3.5),
    ))
    cfg = dataclasses.replace(
        RenderConfig(samples=4, max_depth=6),
        compact_depth=2, compact_factor=4,
    )
    sampler = make_sampler(cfg.sampler, cfg.samples, size, cfg.seed)
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    px = jnp.asarray(xx.reshape(-1), jnp.int32)
    py = jnp.asarray(yy.reshape(-1), jnp.int32)
    sidx = jnp.zeros_like(px).astype(jnp.uint32)

    def step(px, py, sidx):
        return render_wave(scene, meta, cam, sampler, cfg, px, py, sidx)

    ref, rays_ref = jax.jit(step)(px, py, sidx)
    ref = np.asarray(ref)
    assert np.isfinite(ref).all()
    for n_dev in (2, 8):
        mesh = make_mesh(n_dev)
        pxs, pys, sidxs = device_put_lanes(mesh, px, py, sidx)
        fn = jax.jit(step, in_shardings=(shard_lanes(mesh),) * 3)
        out, rays = fn(pxs, pys, sidxs)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)
        np.testing.assert_allclose(float(rays), float(rays_ref), rtol=1e-6)
