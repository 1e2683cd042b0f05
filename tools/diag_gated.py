"""Gated (alpha) traversal cost on the flagship ivy scene (round 3).

The atrium-ivy render measured ~12x slower per ray than the non-ivy
atrium wave (0.16 vs 2.13 Mrays/s at 1024^2): alpha routes every
traversal through intersect_blocktrace_gated, whose while-loop re-runs
the FULL pipeline (presort kernel + two-key sort + argsort + gathers +
fused kernel) over all lanes per cast, as long as ANY lane is still
pass-through. This measures, at wave scale:

  1. ivy vs non-ivy wave throughput (chained render_wave)
  2. cast-count distribution (host-unrolled gated loop: active lanes/cast)
  3. chained cost of one gated call vs one ungated call

    python -u tools/diag_gated.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 4


def main():
    from yart_tpu.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from yart_tpu.config import CameraConfig, RenderConfig
    from yart_tpu.ops.qmc import make_sampler
    from yart_tpu.render.camera import build_camera, generate_rays
    from yart_tpu.render.integrator import render_wave
    from yart_tpu.scene.showcase import atrium

    size = (256, 256)
    spp = 8
    w, h = size
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), spp), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), spp), jnp.int32)
    sidxs = [
        jnp.asarray(np.roll(np.tile(np.arange(spp), h * w), r), jnp.uint32)
        for r in range(1 + K)
    ]
    cam = build_camera(CameraConfig(
        image_size=size, focal_length=28.0, position=(-10.0, 1.8, 0.0),
        forward=(18.0, 0.8, 0.0), exposure=3.0,
    ))
    cfg = RenderConfig(samples=spp, max_depth=8)
    sampler = make_sampler(cfg.sampler, cfg.samples, size, cfg.seed)

    def wave_rate(scene, meta, tag):
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

        f1, fk = chained(1), chained(K)
        for f in (f1, fk):
            out, total = f(scene, px, py, sidxs[0])
            float(jnp.sum(out[:8]))
        reps = 2
        rays_total = 0.0
        t0 = time.time()
        for r in range(reps):
            out, total = fk(scene, px, py, sidxs[1 + r])
            float(jnp.sum(out[:8]))
            rays_total += float(total)
        tk = (time.time() - t0) / reps
        rays_k = rays_total / reps
        t0 = time.time()
        rays_total = 0.0
        for r in range(reps):
            out, total = f1(scene, px, py, sidxs[1 + r])
            float(jnp.sum(out[:8]))
            rays_total += float(total)
        t1 = (time.time() - t0) / reps
        rays_1 = rays_total / reps
        rate = (rays_k - rays_1) / max(tk - t1, 1e-9) / 1e6
        print(f"  {tag} wave: {rate:6.2f} Mrays/s chained "
              f"({rays_k/1e6:.1f} Mrays/K-call)", flush=True)

    print("building scenes...", flush=True)
    sc_plain, meta_plain = atrium().compile()
    sc_ivy, meta_ivy = atrium(ivy=True).compile()
    print(f"plain: {meta_plain.n_tris} tris; "
          f"ivy: {meta_ivy.n_tris} tris, any_alpha={meta_ivy.any_alpha}",
          flush=True)

    wave_rate(sc_plain, meta_plain, "plain")
    wave_rate(sc_ivy, meta_ivy, "ivy  ")

    # ---- cast-count profile: host-unrolled gated loop on primary rays ----
    from yart_tpu.render.blocktrace import _hit_gates, intersect_blocktrace

    n = w * h * spp
    lane_state = sampler.init_lanes(
        px.astype(jnp.uint32), py.astype(jnp.uint32), sidxs[0]
    )
    u_film = sampler.get2d(lane_state, jnp.uint32(0))
    u_lens = sampler.get2d(lane_state, jnp.uint32(2))
    o, d = generate_rays(cam, px, py, u_film, u_lens)
    seed = sampler.lane_seed(lane_state)

    from functools import partial

    @partial(jax.jit, static_argnames=("amask",))
    def one_cast(scene, o, d, act, floor, amask=False):
        tm = jnp.where(act, 1e9, -1.0)
        h = intersect_blocktrace(sc_ivy, meta_ivy, o, d, tm, floor=floor,
                                 amask=amask)
        hit = h.mask & act
        alpha_ok, transparent, factor = _hit_gates(
            sc_ivy, meta_ivy, h, d, False, seed
        )
        passthru = hit & (transparent | ~alpha_ok)
        return passthru, jnp.where(passthru, h.t, floor)

    for amask in (False, True):
        act = jnp.ones((n,), bool)
        floor = jnp.zeros((n,), jnp.float32)
        print(f"  primary-ray gated casts, amask={int(amask)} "
              "(active lanes per cast):", flush=True)
        for cast in range(12):
            n_act = int(jnp.sum(act))
            print(f"    cast {cast}: {n_act} active", flush=True)
            if n_act == 0:
                break
            act, floor = one_cast(sc_ivy, o, d, act, floor, amask=amask)


if __name__ == "__main__":
    main()
