"""Backward-sweep profile (VERDICT round-3 #4): where does fwd+bwd time go?

Decomposition on the chip, chained in-graph (3 reps x K inner):
  fwd        non-differentiable forward (while_loop, production path)
  fwd_scan   differentiable-mode forward only (lax.scan + checkpoint,
             no grad) — the scan's fixed-depth cost vs the while_loop
  vg_trace   value_and_grad, remat policy saves traversal outputs
  vg_lut     + LUT/texture fetches saved ("trace_lut")
  vg_all     everything saved (no re-forward) — isolates the pure-VJP
             cost; memory-bound, run at the same small shape

backward overhead = vg_* - fwd_scan = re-forward + VJP;
vg_all - fwd_scan ~ pure VJP; vg_trace - vg_all ~ re-forward cost.

Usage: python tools/diag_bwd.py [cornell|atrium|both]
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
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    ),
)

import numpy as np


def run(name):
    import jax
    import jax.numpy as jnp

    from yart_tpu.cache import enable_compile_cache
    from yart_tpu.config import CameraConfig, RenderConfig
    from yart_tpu.ops.qmc import make_sampler
    from yart_tpu.render.camera import build_camera
    from yart_tpu.render.integrator import render_wave

    enable_compile_cache()

    side, spp = 128, 4
    if name == "cornell":
        from yart_tpu.scene.procedural import cornell_box

        scene, meta = cornell_box(extra_materials=True).compile()
        cam = build_camera(CameraConfig(
            image_size=(side, side), focal_length=28.0,
            position=(0, 1.0, 3.4), forward=(0, 0, -1),
        ))
    else:
        from yart_tpu.scene.showcase import atrium

        scene, meta = atrium().compile()
        cam = build_camera(CameraConfig(
            image_size=(side, side), focal_length=28.0,
            position=(-10.0, 1.8, 0.0), forward=(18.0, 0.8, 0.0),
            exposure=3.0,
        ))
    cfg = RenderConfig(samples=spp, max_depth=6, rr_start_depth=99)
    sampler = make_sampler(cfg.sampler, cfg.samples, (side, side), cfg.seed)
    yy, xx = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), spp), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), spp), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(spp), side * side), jnp.uint32)
    lanes = px.shape[0]
    K = 3

    def timed(fn, *args):
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:8].sum())
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
            float(np.asarray(
                jax.tree_util.tree_leaves(out)[0]
            ).reshape(-1)[:8].sum())
        return (time.time() - t0) / reps / K

    results = {}

    def fwd_fn(differentiable, c):
        @jax.jit
        def f(s, px, py, sidx):
            acc = jnp.zeros((), jnp.float32)
            for i in range(K):
                si = (sidx + acc.astype(jnp.uint32) + jnp.uint32(i)) % jnp.uint32(spp)
                rad, rays = render_wave(
                    s, meta, cam, sampler, c, px, py, si,
                    differentiable=differentiable,
                )
                acc = acc + jnp.sum(rad[:4]) * 1e-30 + rays
            return acc
        return f

    results["fwd"] = timed(fwd_fn(False, cfg), scene, px, py, sidx)
    results["fwd_scan"] = timed(fwd_fn(True, cfg), scene, px, py, sidx)

    def vg_fn(c):
        def loss(bc, s, px, py, sidx):
            s = s._replace(materials=s.materials._replace(base_color=bc))
            rad, rays = render_wave(
                s, meta, cam, sampler, c, px, py, sidx, differentiable=True
            )
            return jnp.mean(rad), rays

        vg = jax.value_and_grad(loss, has_aux=True)

        @jax.jit
        def f(bc, s, px, py, sidx):
            acc = jnp.zeros((), jnp.float32)
            g = None
            for i in range(K):
                bci = bc if g is None else bc + g * 1e-30
                (val, rays), g = vg(bci, s, px, py, sidx)
                acc = acc + rays
            return g
        return f

    for remat in ("trace", "trace_lut", "all"):
        c = dataclasses.replace(cfg, remat=remat)
        try:
            results[f"vg_{remat}"] = timed(
                vg_fn(c), scene.materials.base_color, scene, px, py, sidx
            )
        except Exception as e:
            results[f"vg_{remat}"] = float("nan")
            print(f"  vg_{remat} failed: {type(e).__name__}: {e}")

    mr = lambda t: lanes / t / 1e6
    print(f"== {name} ({side}x{side}x{spp}spp, d6, {lanes} lanes)")
    for k, t in results.items():
        print(f"  {k:>10}: {t*1e3:8.2f} ms  ({mr(t):6.2f} Mrays-eq/s lanes/t)")
    f, fs = results["fwd"], results["fwd_scan"]
    for k in ("vg_trace", "vg_trace_lut", "vg_all"):
        if not np.isnan(results.get(k, float("nan"))):
            print(f"  {k}: bwd overhead vs fwd_scan = "
                  f"{(results[k]-fs)*1e3:7.2f} ms "
                  f"({results[k]/fs:.2f}x fwd_scan, {results[k]/f:.2f}x fwd)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    for n in (["cornell", "atrium"] if which == "both" else [which]):
        run(n)
