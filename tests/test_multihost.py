"""Multi-host (multi-process) rendering: 2 CPU processes x 2 virtual devices
form one 4-device mesh; the image must be BIT-IDENTICAL to a single-process
render because samplers are pure functions of (pixel, sample, dim)
(SURVEY.md §2.6 — the property that makes sharding a pure refactor).

The reference's parallelism is one shared-memory node (std::thread over a
tile queue, src/cpu/tile-renderer.hpp:150-197); this is the capability it
never had, tested without a cluster.
"""

import os
import socket
import subprocess
import sys

import numpy as np


from yart_tpu.config import CameraConfig, RenderConfig
from yart_tpu.render.renderer import Renderer
from yart_tpu.scene.procedural import cornell_box

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_render_matches_single(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mh.npz")
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_HERE, "multihost_worker.py"),
             str(port), str(pid), out],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    with np.load(out) as z:
        hdr_mh = z["hdr"]
        rays_mh = float(z["rays"])
        grad_mh = z["grad"]
        loss_mh = float(z["loss"])

    scene, meta = cornell_box().compile()
    cam = CameraConfig(image_size=(16, 16))
    cfg = RenderConfig(samples=4, max_depth=3, estimator="mean")
    res = Renderer(scene, meta, cam, cfg).render()

    np.testing.assert_array_equal(hdr_mh, res.hdr)
    assert rays_mh == res.total_rays

    # Cross-process grad psum equals the single-process gradient.
    import jax
    import jax.numpy as jnp

    from yart_tpu.ops.qmc import make_sampler
    from yart_tpu.render.camera import build_camera
    from yart_tpu.render.integrator import render_wave

    cfg_d = RenderConfig(samples=2, max_depth=3, rr_start_depth=99)
    cam_p = build_camera(cam)
    sampler = make_sampler(cfg_d.sampler, cfg_d.samples, (16, 16),
                           cfg_d.seed)
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), 2), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), 2), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(2), 256), jnp.uint32)

    def loss(bc):
        s = scene._replace(
            materials=scene.materials._replace(base_color=bc)
        )
        rad, _ = render_wave(
            s, meta, cam_p, sampler, cfg_d, px, py, sidx,
            differentiable=True,
        )
        return jnp.mean(rad)

    l1, g1 = jax.jit(jax.value_and_grad(loss))(
        scene.materials.base_color
    )
    np.testing.assert_allclose(loss_mh, float(l1), rtol=1e-6)
    np.testing.assert_allclose(
        grad_mh, np.asarray(g1), rtol=2e-5, atol=1e-7
    )
