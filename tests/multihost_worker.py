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
    if pid == 0:
        np.savez(out, hdr=res.hdr, rays=res.total_rays)
    # Keep the coordinator alive until everyone is done.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
