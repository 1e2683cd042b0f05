"""End-to-end inverse rendering (yart_tpu/tools/inverse_render.py): the
differentiable path as a product feature. A perturbed cornell wall color
must optimize back to the target image's true color — the BASELINE.json
north-star capability exercised as a user would."""

import numpy as np
import jax
import jax.numpy as jnp

from yart_tpu.config import CameraConfig, RenderConfig
from yart_tpu.ops.qmc import make_sampler
from yart_tpu.render.camera import build_camera
from yart_tpu.render.integrator import render_wave
from yart_tpu.scene.procedural import cornell_box
from yart_tpu.tools.inverse_render import optimize_materials


def test_recover_wall_albedo():
    scene, meta = cornell_box().compile()
    size = (16, 16)
    spp = 2
    cam = build_camera(CameraConfig(
        image_size=size, focal_length=28.0, position=(0, 1.0, 3.4),
        forward=(0, 0, -1),
    ))
    cfg = RenderConfig(samples=spp, max_depth=3, rr_start_depth=99)
    sampler = make_sampler(cfg.sampler, cfg.samples, size, cfg.seed)
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), spp), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), spp), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(spp), 256), jnp.uint32)

    target, _ = jax.jit(
        lambda: render_wave(scene, meta, cam, sampler, cfg, px, py, sidx)
    )()

    bc_true = np.asarray(scene.materials.base_color)
    bc_bad = bc_true.copy()
    bc_bad[1, :3] = (0.3, 0.3, 0.6)  # red wall -> wrong blue-gray
    scene_bad = scene._replace(
        materials=scene.materials._replace(base_color=jnp.asarray(bc_bad))
    )
    # Optimize ONLY the perturbed row (known-good rows frozen).
    mask = np.zeros((bc_true.shape[0],), bool)
    mask[1] = True
    res = optimize_materials(
        scene_bad, meta, cam, sampler, cfg, px, py, sidx, target,
        steps=60, lr=0.05, mask=mask,
    )
    assert res.losses[-1] < res.losses[0] * 0.05  # >95% loss reduction
    got = np.asarray(res.base_color)[1, :3]
    np.testing.assert_allclose(got, bc_true[1, :3], atol=0.05)
    # frozen rows untouched
    np.testing.assert_array_equal(
        np.asarray(res.base_color)[0], bc_bad[0]
    )
