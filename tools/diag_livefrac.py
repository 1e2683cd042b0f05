"""Per-depth live-lane fractions for a scene/config (round 5).

The staged-compaction decision — both the static "auto" resolution and
the renderer's per-wave autotune — is a function of how fast lanes
retire. This probe runs the forward integrator with return_live=True and
prints live[k]/n per bounce for (a) the production wave config (RR on)
and (b) the differentiable-bench config (max_depth=6, roulette off),
which retires far fewer lanes and therefore needs a more conservative
compaction cap.

Usage: python tools/diag_livefrac.py [cornell|atrium|ivy|roadster|spheres] [--cpu]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)

import numpy as np


def main():
    args = sys.argv[1:]
    if "--cpu" in args:
        args.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    name = args[0] if args else "atrium"

    import jax
    import jax.numpy as jnp

    from yart_tpu.cache import enable_compile_cache
    from yart_tpu.config import CameraConfig, RenderConfig
    from yart_tpu.ops.qmc import make_sampler
    from yart_tpu.render.camera import build_camera
    from yart_tpu.render.integrator import render_wave

    enable_compile_cache()

    side, spp = 64, 2
    if name == "cornell":
        from yart_tpu.scene.procedural import cornell_box

        scene, meta = cornell_box().compile()
        cam_cfg = CameraConfig(image_size=(side, side), focal_length=28.0,
                               position=(0, 1.0, 3.4), forward=(0, 0, -1))
    elif name == "spheres":
        from yart_tpu.scene.procedural import material_test_spheres

        scene, meta = material_test_spheres().compile()
        cam_cfg = CameraConfig(image_size=(side, side), focal_length=26.0,
                               position=(0.0, 1.6, 5.0),
                               forward=(0, -0.2, -1))
    elif name in ("atrium", "ivy"):
        from yart_tpu.scene.showcase import atrium

        scene, meta = atrium(ivy=(name == "ivy")).compile()
        cam_cfg = CameraConfig(image_size=(side, side), focal_length=28.0,
                               position=(-10.0, 1.8, 0.0),
                               forward=(18.0, 0.8, 0.0), exposure=3.0)
    else:
        from yart_tpu.scene.showcase import roadster

        scene, meta = roadster().compile()
        cam_cfg = CameraConfig(image_size=(side, side), focal_length=35.0,
                               position=(4.4, 1.7, 5.0),
                               forward=(-4.4, -1.2, -5.0), exposure=1.0)

    cam = build_camera(cam_cfg)
    yy, xx = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), spp), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), spp), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(spp), side * side), jnp.uint32)
    n = side * side * spp

    for label, cfg in (
        ("production d8 RR-on", RenderConfig(
            samples=spp, max_depth=8, compact_depth=None)),
        ("diff-bench d6 RR-off", RenderConfig(
            samples=spp, max_depth=6, rr_start_depth=99,
            compact_depth=None)),
    ):
        sampler = make_sampler(cfg.sampler, cfg.samples, (side, side),
                               cfg.seed)
        _, _, live = jax.jit(
            lambda s, px, py, sidx, cfg=cfg, sampler=sampler: render_wave(
                s, meta, cam, sampler, cfg, px, py, sidx, return_live=True
            )
        )(scene, px, py, sidx)
        live = np.asarray(live)
        fr = live / n
        print(f"{name} [{label}] n={n}")
        print("  live frac by depth:",
              " ".join(f"{f:.3f}" for f in fr))


if __name__ == "__main__":
    main()
