"""Chained atrium-wave throughput vs cluster_size (the flagship metric's
traversal shape knob).

    python -u tools/diag_atrium_csize.py [csize ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(sizes):
    from yart_tpu.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from yart_tpu.config import CameraConfig, RenderConfig
    from yart_tpu.ops.qmc import make_sampler
    from yart_tpu.render.camera import build_camera
    from yart_tpu.render.integrator import render_wave
    from yart_tpu.scene.showcase import atrium

    size = (256, 256)
    spp = 8
    cam = build_camera(CameraConfig(
        image_size=size, focal_length=28.0, position=(-10.0, 1.8, 0.0),
        forward=(18.0, 0.8, 0.0), exposure=3.0,
    ))
    cfg = RenderConfig(samples=spp, max_depth=8)
    sampler = make_sampler(cfg.sampler, cfg.samples, size, cfg.seed)
    w, h = size
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), spp), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), spp), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(spp), h * w), jnp.uint32)

    for csize in sizes:
        scene, meta = atrium().compile(cluster_size=csize)

        def chained(k):
            @jax.jit
            def f(s, px, py, sidx):
                total = jnp.zeros((), jnp.float32)
                rad = None
                for i in range(k):
                    si = sidx if rad is None else (
                        sidx + total.astype(jnp.uint32) + jnp.uint32(i)
                    ) % jnp.uint32(spp)
                    rad, rays = render_wave(s, meta, cam, sampler, cfg,
                                            px, py, si)
                    total = total + rays.astype(jnp.float32)
                return rad, total
            return f

        fk = chained(3)
        out, total = fk(scene, px, py, sidx)
        float(jnp.sum(out[:8]))
        t0 = time.time()
        rays_total = 0.0
        for r in range(3):
            out, total = fk(scene, px, py, sidx)
            float(jnp.sum(out[:8]))
            rays_total += float(total)
        mrs = rays_total / (time.time() - t0) / 1e6
        print(f"csize {csize:4d}: {mrs:6.3f} Mrays/s (mean radiance "
              f"{float(jnp.mean(out)):.4f})", flush=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [64, 256]
    main(sizes)
