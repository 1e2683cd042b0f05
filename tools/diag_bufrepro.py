"""Recorded repro: jax-0.9.0 XLA:CPU re-invocation buffer mismatch.

A plain-jit FORWARD of the staged-compaction differentiable scan
(render/integrator.py li(differentiable=True) with compact_depth set)
over a big scene (>4096 tris -> the bintrace traversal on CPU) executes
correctly on its FIRST call and fails on every subsequent call with

    ValueError: INVALID_ARGUMENT: Execution supplied 72 buffers but
    compiled program expected 125 buffers

i.e. the re-invocation fast path drops the executable's hoisted closure
constants (125 - 72 = 53 of them: LUT tables, sampler constants, ...).
Findings from the round-5 bisect (all on jax 0.9.0, CPU backend):

- value_and_grad of the SAME function re-invokes fine (4+ calls) — the
  production/bench path is unaffected.
- cornell (36 tris, brute traversal) + compaction: fine. Small env
  scenes: fine. Big scene WITHOUT compaction: fine. Synthetic
  checkpointed staged scans with closure constants: fine. The trigger
  needs the big-scene traversal instantiated at TWO widths inside the
  checkpointed scans.
- Not the persistent compile cache (reproduces with it disabled), not
  the cond-gated drain (reproduces unga­ted), not the thunk runtime
  (--xla_cpu_use_thunk_runtime=false unchanged);
  jax_use_simplified_jaxpr_constants=True changes the counts
  (44 vs 50) but still fails.

ROOT CAUSE (found round 5, fixed): OUR OWN tracer leak, not jax.
render/bintrace.py and render/blocktrace.py defined module-level
constants as `_BIG = jnp.float32(3.0e38)` — and those modules are
imported LAZILY inside the intersect() dispatch, i.e. INSIDE an ambient
jit trace for big scenes. A jnp constant constructed under a trace is a
Tracer; stored as a module global it outlives its trace and is captured
as a (foreign-tracer!) constant by every LATER trace, corrupting the
executable's constant table — hence first-call-works / re-invocation
fails, and only for scenes big enough to import bintrace. Fixed by
making every module-level constant numpy (np.float32 / np.asarray) in
bintrace, blocktrace, intersect, pallas_intersect, estimator, tonemap,
integrator. This script is kept as the regression canary: it must print
BUG FIXED.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "") == "axon":
    # Allow running the repro on the TPU too (drop --cpu to test there).
    if "--cpu" in sys.argv or not os.environ.get("YART_TPU"):
        jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    from yart_tpu.config import CameraConfig, RenderConfig
    from yart_tpu.ops.qmc import make_sampler
    from yart_tpu.render.camera import build_camera
    from yart_tpu.render.integrator import render_wave
    from yart_tpu.scene.procedural import material_test_spheres

    scene, meta = material_test_spheres().compile()
    size = (16, 16)
    cam = build_camera(CameraConfig(
        image_size=size, focal_length=26.0, position=(0.0, 1.6, 5.0),
        forward=(0, -0.2, -1)))
    cfg = RenderConfig(samples=2, max_depth=4, rr_start_depth=99,
                       compact_depth=1, compact_factor=4)
    sampler = make_sampler("zsobol", 2, size, 0)
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), 2), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), 2), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(2), 256), jnp.uint32)

    @jax.jit
    def f(scene, delta):
        mats = scene.materials
        base = mats.base_color.at[0, 0].add(delta)
        s = scene._replace(materials=mats._replace(base_color=base))
        radiance, _ = render_wave(s, meta, cam, sampler, cfg, px, py,
                                  sidx, differentiable=True)
        return jnp.mean(radiance)

    print("call 1:", float(f(scene, 0.02)))
    try:
        print("call 2:", float(f(scene, -0.02)))
        print("BUG FIXED: plain-jit re-invocation works on this jax")
    except ValueError as e:
        print(f"BUG PRESENT: {e}")


if __name__ == "__main__":
    main()
