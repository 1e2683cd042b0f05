"""Chunk-pipeline overlap check (VERDICT round-3 #5): wave wall-clock with
multiple chunks should approach pure compute, not compute + per-chunk
dispatch/transfer latency (~26 ms on the axon runtime).

Renders one cornell wave split into 8 chunks with chunk_inflight=1
(serialized: block on each chunk before dispatching the next) vs the
default 2 (pipelined), and prints both wall-clocks. Run on the chip.

    python tools/diag_overlap.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)


def main():
    from yart_tpu.cache import enable_compile_cache
    from yart_tpu.config import CameraConfig, RenderConfig
    from yart_tpu.render.renderer import Renderer
    from yart_tpu.scene.procedural import cornell_box

    enable_compile_cache()
    scene, meta = cornell_box(extra_materials=True).compile()
    size = 256
    cam = CameraConfig(image_size=(size, size), focal_length=28.0,
                       position=(0, 1.0, 3.4), forward=(0, 0, -1))
    base = RenderConfig(samples=8, max_depth=8, first_wave_samples=8,
                        estimator="mean", tonemap="none")
    chunk = size * size // 8

    out = {}
    for inflight in (1, 2, 3):
        cfg = dataclasses.replace(base, chunk_inflight=inflight)
        r = Renderer(scene, meta, cam, cfg)
        r.render(chunk_pixels=chunk)  # warm compile
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            res = r.render(chunk_pixels=chunk)
        dt = (time.time() - t0) / reps
        out[inflight] = dt
        print(f"inflight={inflight}: wave wall {dt*1e3:7.1f} ms "
              f"({res.total_rays/1e6:.1f} Mrays per render)")
    saved = out[1] - out[min(out)]
    best = min(out, key=out.get)
    print(f"pipelining saves {out[1]-out[best]:.3f}s/render "
          f"({(out[1]/out[best]-1)*100:.0f}% over serialized) at "
          f"inflight={best}")


if __name__ == "__main__":
    main()
