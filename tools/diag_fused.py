"""Diagnose the fused-trace gap: clusters tested per block vs the per-ray
ideal, across cluster size / kbatch. Run on the real chip:

    python tools/diag_fused.py [--lanes 262144]

Interpreting: `tested/blk` = clusters actually swept by the phase-2 t-loop
per 128-ray block (n_it * kbatch); `entered/ray` = clusters whose AABB a ray
enters before its final hit t (the amount a perfect per-ray traversal would
test). tested/blk >> entered/ray means block union + weak termination is the
gap; tested/blk ~ entered/ray means granularity (tris per cluster) is.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(lanes: int):
    from yart_tpu.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tools.perf_trace import build_scene, make_rays
    from yart_tpu.kernels.pallas_fusedtrace import fused_trace_pallas
    from yart_tpu.render.blocktrace import _pad_sorted

    block = 128

    for csize in (128, 64, 32):
        scene, meta = build_scene(60, csize)
        n_clus = int(meta.n_clusters)
        print(f"\n=== cluster_size={csize}: {meta.n_tris} tris, "
              f"{n_clus} clusters ===", flush=True)

        for coh in (False, True):
            o_np, d_np = make_rays(lanes, coh)
            o = jnp.asarray(o_np)
            d = jnp.asarray(d_np)

            for kbatch in (8, 16):
                def full(scene, o, d, kbatch=kbatch):
                    n = o.shape[0]
                    tm = jnp.full((n,), 100.0, jnp.float32)
                    fl = jnp.zeros((n,), jnp.float32)
                    o_s, d_s, t_s, fl_s, inv, blive = _pad_sorted(
                        scene, o, d, tm, fl, block
                    )
                    rays = jnp.concatenate(
                        [o_s, d_s, t_s[:, None], fl_s[:, None]], axis=1
                    )
                    res = fused_trace_pallas(
                        rays, scene.clus_box, scene.clus_pack, block,
                        csize, 1e-3, kbatch=kbatch,
                    )
                    return res, inv

                fn = jax.jit(full)
                res, inv = fn(scene, o, d)
                float(jnp.sum(res[:8, 0]))  # force
                reps = 4
                t0 = time.time()
                for r in range(reps):
                    res, inv = fn(scene, o + np.float32(1e-5 * r), d)
                    float(jnp.sum(res[:8, 0]))
                dt = (time.time() - t0) / reps
                res_np = np.asarray(res)
                nb = res_np.shape[0] // block
                trips = res_np.reshape(nb, block, 8)[:, 0, 5]
                wins = res_np.reshape(nb, block, 8)[:, 0, 6]
                tag = "coh" if coh else "inc"
                print(
                    f"  {tag} kbatch={kbatch:2d}: {lanes/dt/1e6:6.2f} Mrays/s"
                    f"  trips/blk mean {trips.mean():6.1f} p95 "
                    f"{np.percentile(trips, 95):6.1f}"
                    f"  tested/blk {trips.mean()*kbatch:7.1f}"
                    f"  winners/blk {wins.mean():5.1f}",
                    flush=True,
                )

            # Per-ray ideal: clusters entered before the final hit t.
            def entered(scene, o, d, t_hit):
                lo = scene.clus_box[0:3].T[None]   # [1, C, 3]
                hi = scene.clus_box[3:6].T[None]
                safe = jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
                ia = (1.0 / safe)[:, None, :]       # [N, 1, 3]
                oo = o[:, None, :]
                x0 = (lo - oo) * ia
                x1 = (hi - oo) * ia
                e = jnp.max(jnp.minimum(x0, x1), axis=-1)
                x = jnp.min(jnp.maximum(x0, x1), axis=-1)
                okc = (x >= jnp.maximum(e, 1e-3)) & (e < t_hit[:, None])
                okc = okc & (
                    jnp.arange(lo.shape[1])[None, :] < n_clus
                )
                return jnp.sum(okc, axis=1)

            sub = 8192
            t_hit = res_np[np.asarray(inv)][:sub, 0]
            cnt = jax.jit(entered)(
                scene, o[:sub], d[:sub], jnp.asarray(t_hit)
            )
            cnt = np.asarray(cnt)
            print(
                f"  {tag if False else ('coh' if coh else 'inc')} ideal: "
                f"entered/ray mean {cnt.mean():5.1f} p95 "
                f"{np.percentile(cnt, 95):5.1f} max {cnt.max()}",
                flush=True,
            )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=262144)
    args = ap.parse_args()
    main(args.lanes)
