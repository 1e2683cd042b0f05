"""Isolate the fused-trace per-unit cost: a kernel that tests a FIXED
number of sequential clusters per block with no extraction, no while_loop,
no termination — the pure [B rays x C tris] unit floor. Also reports
clusters-entered per ray at FULL t_max (sizing for a ray-major pair
pipeline). Run on the real chip."""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from yart_tpu.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tools.perf_trace import build_scene, make_rays
    from yart_tpu.kernels.pallas_fusedtrace import _proj, _t_only

    csize = 128
    scene, meta = build_scene(60, csize)
    lanes = 262144
    block = 128
    o_np, d_np = make_rays(lanes, False)

    def dense_kernel(n_units, c, rays_ref, pack_ref, out_ref):
        rays = rays_ref[...]
        o = rays[:, 0:3]
        d = rays[:, 3:6]
        t0 = rays[:, 6:7]
        floor = rays[:, 7:8]
        b = pl.program_id(0)

        def body(i, t_best):
            cid = (b * 37 + i * 13) % pack_ref.shape[0]  # defeat hoisting
            tri = pack_ref[cid]
            ro, rd = _proj(o, d, tri, False)
            bt = _t_only(ro, rd, t_best, tri, c, 1e-3, floor)
            return jnp.minimum(t_best, bt)

        t = lax.fori_loop(0, n_units, body, t0)
        out_ref[...] = jnp.broadcast_to(t, out_ref.shape)

    def run_dense(n_units):
        rays = np.concatenate(
            [o_np, d_np, np.full((lanes, 1), 100.0, np.float32),
             np.zeros((lanes, 1), np.float32)], axis=1,
        )
        rays = jnp.asarray(rays)
        nb = lanes // block
        fn = pl.pallas_call(
            functools.partial(dense_kernel, n_units, csize),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((block, 8), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(scene.clus_pack.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block, 8), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((lanes, 8), jnp.float32),
        )
        jf = jax.jit(lambda r: fn(r, scene.clus_pack))
        out = jf(rays)
        float(jnp.sum(out[:8, 0]))
        reps = 3
        t0 = time.time()
        for r in range(reps):
            out = jf(rays + np.float32(1e-6 * r))
            float(jnp.sum(out[:8, 0]))
        dt = (time.time() - t0) / reps
        per_unit = dt / (lanes // block) / n_units * 1e6
        print(f"dense n_units={n_units:3d}: {dt*1e3:7.2f} ms "
              f"-> {per_unit:.3f} us/unit "
              f"({lanes/dt/1e6:.2f} 'Mrays/s' equiv)", flush=True)

    for n_units in (16, 32, 96):
        run_dense(n_units)

    # Clusters entered per ray at FULL t_max (pair-pipeline sizing).
    def entered(scene, o, d):
        lo = scene.clus_box[0:3].T[None]
        hi = scene.clus_box[3:6].T[None]
        safe = jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
        ia = (1.0 / safe)[:, None, :]
        oo = o[:, None, :]
        x0 = (lo - oo) * ia
        x1 = (hi - oo) * ia
        e = jnp.max(jnp.minimum(x0, x1), axis=-1)
        x = jnp.min(jnp.maximum(x0, x1), axis=-1)
        okc = (x >= jnp.maximum(e, 1e-3)) & (e < 100.0)
        okc = okc & (jnp.arange(lo.shape[1])[None, :] < meta.n_clusters)
        return jnp.sum(okc, axis=1)

    sub = 32768
    cnt = np.asarray(jax.jit(entered)(
        scene, jnp.asarray(o_np[:sub]), jnp.asarray(d_np[:sub])
    ))
    print(f"entered/ray @ t_max=100: mean {cnt.mean():.2f} "
          f"p50 {np.percentile(cnt, 50):.0f} p95 {np.percentile(cnt, 95):.0f} "
          f"max {cnt.max()}  total pairs ~ {cnt.mean()*lanes/1e6:.2f}M",
          flush=True)


if __name__ == "__main__":
    main()
