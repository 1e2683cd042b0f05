"""Grad-psum / backward overlap evidence (VERDICT round-4 #10).

Compiles the sharded textured fwd+bwd training step over an 8-device
mesh (the driver-dryrun shape) and inspects the OPTIMIZED HLO for how
the material-gradient all-reduce is scheduled:

- `all-reduce-start` / `all-reduce-done` pairs = XLA chose the ASYNC
  collective form, the precondition for overlapping the reduction with
  backward compute. The distance between start and done in the
  instruction sequence (how many non-collective instructions sit
  between them) is the overlap window the scheduler created.
- a plain `all-reduce` = the collective is synchronous (no overlap).

Run on CPU (8 virtual devices) this reports the structural facts for
the portable SPMD program; on real multi-chip TPU the latency-hiding
scheduler additionally moves compute into the start/done window — the
BASELINE.md paragraph quotes both the structure found here and that
caveat honestly.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/diag_overlap_hlo.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "XLA_FLAGS",
    "--xla_force_host_platform_device_count=8",
)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)

import jax

# Force CPU before ANY backend query (the axon plugin is pinned via
# sitecustomize and hangs/errors when the tunnel is down); pass --tpu to
# analyze the TPU-scheduled HLO instead.
if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    from yart_tpu.config import CameraConfig, RenderConfig
    from yart_tpu.ops.qmc import make_sampler
    from yart_tpu.parallel.sharding import (
        make_mesh, replicate, shard_lanes,
    )
    from yart_tpu.render.camera import build_camera
    from yart_tpu.render.integrator import render_wave
    from yart_tpu.scene.procedural import textured_box_scene

    scene, meta = textured_box_scene().compile()
    size = (16, 16)
    spp = 2
    cam = build_camera(CameraConfig(
        image_size=size, focal_length=26.0, position=(0.0, 1.2, 4.0),
        forward=(0, -0.15, -1)))
    cfg = RenderConfig(samples=spp, max_depth=3, rr_start_depth=99)
    sampler = make_sampler(cfg.sampler, spp, size, cfg.seed)
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), spp), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), spp), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(spp), 256), jnp.uint32)

    mesh = make_mesh(8)
    lanes = shard_lanes(mesh)
    rep = replicate(mesh)

    def loss(base_color, scene, px, py, sidx):
        s = scene._replace(
            materials=scene.materials._replace(base_color=base_color)
        )
        radiance, rays = render_wave(
            s, meta, cam, sampler, cfg, px, py, sidx, differentiable=True
        )
        return jnp.mean(radiance), rays

    vg = jax.jit(
        jax.value_and_grad(loss, has_aux=True),
        in_shardings=(rep, rep, lanes, lanes, lanes),
        out_shardings=((rep, rep), rep),
    )
    compiled = vg.lower(
        scene.materials.base_color, scene, px, py, sidx
    ).compile()
    hlo = compiled.as_text()

    lines = hlo.splitlines()
    starts = [i for i, l in enumerate(lines) if "all-reduce-start" in l]
    dones = [i for i, l in enumerate(lines) if "all-reduce-done" in l]
    plain = [
        i for i, l in enumerate(lines)
        if re.search(r"\ball-reduce\b", l) and "start" not in l
        and "done" not in l
    ]
    print(f"optimized HLO: {len(lines)} lines")
    print(f"async all-reduce-start sites: {len(starts)}")
    print(f"async all-reduce-done  sites: {len(dones)}")
    print(f"synchronous all-reduce sites: {len(plain)}")
    for s in starts:
        # window = instructions between the start and its matching done
        after = [d for d in dones if d > s]
        if after:
            win = after[0] - s - 1
            print(f"  start@{s}: {win} instruction(s) inside the "
                  f"start/done window")
            print("   ", lines[s].strip()[:140])
    for p in plain[:4]:
        print("  sync:", lines[p].strip()[:140])

    out = "/tmp/overlap_hlo.txt"
    with open(out, "w") as f:
        f.write(hlo)
    print(f"full optimized HLO written to {out}")


if __name__ == "__main__":
    main()
