"""Wall-clock scaling of the product Renderer over a virtual CPU device
mesh (1 vs N devices), on a compute-bound scene. Without multi-chip
hardware this measures the sharded execution path end-to-end (the
bit-identity across meshes is asserted separately in tests/test_sharding.py
and tests/test_multihost.py); the SPEEDUP ceiling on virtual devices is set
by how XLA:CPU schedules per-device work onto the host's cores.

    python -u tools/scaling_virtual.py [devices] [side] [spp]
"""

from __future__ import annotations

import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count="
    + (sys.argv[1] if len(sys.argv) > 1 else "8")
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from yart_tpu.config import CameraConfig, RenderConfig
    from yart_tpu.render.renderer import Renderer
    from yart_tpu.scene.procedural import cornell_box

    print(f"devices: {jax.device_count()}", flush=True)
    scene, meta = cornell_box(extra_materials=True).compile()
    cam = CameraConfig(image_size=(side, side), focal_length=28.0,
                       position=(0, 1.0, 3.4), forward=(0, 0, -1))
    cfg = RenderConfig(samples=spp, max_depth=6, first_wave_samples=spp,
                       max_wave_samples=spp)

    results = {}
    for ndev in (1, jax.device_count()):
        r = Renderer(scene, meta, cam, cfg, devices=ndev)
        res = r.render()  # warm (compile)
        t0 = time.time()
        res = r.render()
        dt = time.time() - t0
        results[ndev] = (dt, np.asarray(res.hdr))
        print(f"  {ndev} device(s): {dt*1e3:8.1f} ms "
              f"({res.total_rays/dt/1e6:.2f} Mrays/s)", flush=True)
    n = jax.device_count()
    if n > 1:
        sp = results[1][0] / results[n][0]
        print(f"speedup {n} vs 1: {sp:.2f}x "
              f"(efficiency {sp/n*100:.0f}%)", flush=True)
        ok = np.array_equal(results[1][1], results[n][1])
        print(f"images bit-identical across meshes: {ok}", flush=True)


if __name__ == "__main__":
    main()
