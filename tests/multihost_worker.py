"""One process of the 2-process CPU 'cluster' in tests/test_multihost.py.

Usage: python multihost_worker.py <port> <process_id> <out.npz>

Each process owns 2 virtual CPU devices; jax.distributed wires them into one
4-device mesh. Renders cornell 16x16 @ 4spp with the product Renderer
(devices="all") and saves the hdr image + ray counter (process 0 only).
This is the multi-host analog the reference never had (its parallelism is
one shared-memory node, src/cpu/tile-renderer.hpp:150-197).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
_cache = os.path.join(_repo, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    port, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    from yart_tpu.parallel.distributed import init_distributed

    ok = init_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2,
        process_id=pid,
    )
    assert ok, "distributed init failed"
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # global
    assert len(jax.local_devices()) == 2

    import numpy as np

    from yart_tpu.config import CameraConfig, RenderConfig
    from yart_tpu.render.renderer import Renderer
    from yart_tpu.scene.procedural import cornell_box

    scene, meta = cornell_box().compile()
    cam = CameraConfig(image_size=(16, 16))
    cfg = RenderConfig(samples=4, max_depth=3, estimator="mean")
    r = Renderer(scene, meta, cam, cfg, devices="all")
    assert r.n_devices == 4
    res = r.render()

    # Cross-process material grads: lane-sharded loss over the 2-process
    # mesh, replicated parameter — XLA inserts the grad psum across
    # processes (the DCN analog of the BASELINE.json north star).
    import jax.numpy as jnp

    from yart_tpu.ops.qmc import make_sampler
    from yart_tpu.parallel.sharding import (
        device_put_lanes,
        device_put_replicated,
        make_mesh,
        replicate,
        shard_lanes,
    )
    from yart_tpu.render.camera import build_camera
    from yart_tpu.render.integrator import render_wave

    mesh = make_mesh()
    cfg_d = RenderConfig(samples=2, max_depth=3, rr_start_depth=99)
    cam_p = build_camera(cam)
    sampler = make_sampler(cfg_d.sampler, cfg_d.samples, (16, 16),
                           cfg_d.seed)
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    px = np.repeat(xx.reshape(-1), 2).astype(np.int32)
    py = np.repeat(yy.reshape(-1), 2).astype(np.int32)
    sidx = np.tile(np.arange(2), 256).astype(np.uint32)
    pxs, pys, sidxs = device_put_lanes(mesh, px, py, sidx)
    host_scene = jax.tree_util.tree_map(np.asarray, scene)
    scene_r = device_put_replicated(mesh, host_scene)
    bc = jax.device_put(
        np.asarray(scene.materials.base_color), replicate(mesh)
    )

    def loss(bc, s, px, py, sidx):
        s = s._replace(materials=s.materials._replace(base_color=bc))
        rad, _ = render_wave(
            s, meta, cam_p, sampler, cfg_d, px, py, sidx,
            differentiable=True,
        )
        return jnp.mean(rad)

    vg = jax.jit(
        jax.value_and_grad(loss),
        in_shardings=(replicate(mesh), replicate(mesh))
        + (shard_lanes(mesh),) * 3,
    )
    val, g = vg(bc, scene_r, pxs, pys, sidxs)
    assert g.sharding.is_fully_replicated
    g_np = np.asarray(g)

    if pid == 0:
        np.savez(out, hdr=res.hdr, rays=res.total_rays,
                 grad=g_np, loss=float(val))
    # Keep the coordinator alive until everyone is done.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
