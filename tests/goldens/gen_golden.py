"""Regenerate the golden regression images (tests/test_golden.py) after an
INTENTIONAL rendering change. Configs must mirror the tests exactly.

    python tests/goldens/gen_golden.py

History:
- v1 round 1: initial.
- round 2: furnace regenerated — env NEE sampling moved from 2-step CDF
  inversion to alias-table draws (sample placement changes, estimator
  unbiased; BASELINE.md round-2 notes).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from yart_tpu.config import CameraConfig, RenderConfig
    from yart_tpu.render.renderer import Renderer
    from yart_tpu.scene.procedural import cornell_box, furnace

    out = {}
    scene, meta = cornell_box(extra_materials=True).compile()
    cam = CameraConfig(image_size=(16, 16), focal_length=28.0,
                      position=(0, 1.0, 3.4), forward=(0, 0, -1))
    cfg = RenderConfig(samples=16, max_depth=6, tonemap="none",
                      estimator="gmon", first_wave_samples=16,
                      max_wave_samples=16)
    out["cornell_mat"] = np.asarray(Renderer(scene, meta, cam, cfg).render().hdr)

    scene, meta = furnace(env_value=0.5).compile()
    cam = CameraConfig(image_size=(16, 16), focal_length=30.0,
                      position=(0, 0, 3.5), forward=(0, 0, -3.5))
    cfg = RenderConfig(samples=16, max_depth=8, tonemap="none",
                      estimator="mean", first_wave_samples=16,
                      max_wave_samples=16)
    out["furnace"] = np.asarray(Renderer(scene, meta, cam, cfg).render().hdr)

    # v2 (round 3): image-scale goldens — the 16x16 pair is a determinism
    # canary, these are the regression net (VERDICT round-1 weak #4).
    from yart_tpu.scene.procedural import (
        material_test_spheres, textured_box_scene,
    )

    scene, meta = cornell_box(extra_materials=True).compile()
    cam = CameraConfig(image_size=(64, 64), focal_length=28.0,
                      position=(0, 1.0, 3.4), forward=(0, 0, -1))
    cfg = RenderConfig(samples=16, max_depth=6, tonemap="none",
                      estimator="gmon", first_wave_samples=16,
                      max_wave_samples=16)
    out["cornell_mat_64"] = np.asarray(
        Renderer(scene, meta, cam, cfg).render().hdr
    )

    # Glossy-metallic MIS + depth of field (BASELINE config-2 shape).
    scene, meta = material_test_spheres().compile()
    cam = CameraConfig(image_size=(48, 48), focal_length=40.0, f_number=2.8,
                      position=(0, 2.2, 5.5), forward=(0, -1.8, -6.1),
                      aperture_sides=6)
    cfg = RenderConfig(samples=16, max_depth=6, tonemap="none",
                      estimator="mean", first_wave_samples=16,
                      max_wave_samples=16)
    out["spheres_dof"] = np.asarray(
        Renderer(scene, meta, cam, cfg).render().hdr
    )

    # Every texture channel class + alpha cutout + thin-glass NEE shadows.
    scene, meta = textured_box_scene().compile()
    cam = CameraConfig(image_size=(48, 48), focal_length=26.0,
                      position=(0, 1.6, 3.2), forward=(0, -0.9, -3.0))
    cfg = RenderConfig(samples=16, max_depth=5, tonemap="none",
                      estimator="mean", first_wave_samples=16,
                      max_wave_samples=16)
    out["textured"] = np.asarray(
        Renderer(scene, meta, cam, cfg).render().hdr
    )

    path = os.path.join(os.path.dirname(__file__), "golden_v1.npz")
    np.savez_compressed(path, **out)
    print("wrote", path, {k: (v.shape, float(v.mean())) for k, v in out.items()})


if __name__ == "__main__":
    main()
