"""Benchmark: Mrays/s of the MIS wavefront integrator on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md) — its runtime perf print is
Mrays/s (src/frontend/metal-sdl2/main.cpp:223-255), so that is the metric.
``vs_baseline`` compares against BASELINE_LOCAL.json if a previous run
recorded one (self-relative trend), else 0.0.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

BASELINE_LOCAL = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BASELINE_LOCAL.json"
)


def main():
    import jax
    import jax.numpy as jnp

    from yart_tpu.config import CameraConfig, RenderConfig
    from yart_tpu.ops.qmc import make_sampler
    from yart_tpu.render.camera import build_camera
    from yart_tpu.render.integrator import render_wave
    from yart_tpu.scene.procedural import cornell_box

    size = (256, 256)
    spp = 8
    scene, meta = cornell_box(extra_materials=True).compile()
    cam = build_camera(
        CameraConfig(
            image_size=size, focal_length=28.0, position=(0, 1.0, 3.4),
            forward=(0, 0, -1),
        )
    )
    cfg = RenderConfig(samples=spp, max_depth=8)
    sampler = make_sampler(cfg.sampler, cfg.samples, size, cfg.seed)

    w, h = size
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), spp), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), spp), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(spp), h * w), jnp.uint32)

    fn = jax.jit(
        lambda px, py, sidx: render_wave(scene, meta, cam, sampler, cfg, px, py, sidx)
    )
    # Warmup/compile
    radiance, rays = fn(px, py, sidx)
    radiance.block_until_ready()

    t0 = time.time()
    reps = 3
    total_rays = 0.0
    for _ in range(reps):
        radiance, rays = fn(px, py, sidx)
        radiance.block_until_ready()
        total_rays += float(rays)
    dt = time.time() - t0

    mrays = total_rays / dt / 1e6

    prev = 0.0
    if os.path.exists(BASELINE_LOCAL):
        try:
            prev = json.load(open(BASELINE_LOCAL)).get("mrays_per_s", 0.0)
        except Exception:
            prev = 0.0
    vs = mrays / prev if prev > 0 else 0.0
    try:
        json.dump({"mrays_per_s": mrays}, open(BASELINE_LOCAL, "w"))
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "cornell_mis_rays",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
