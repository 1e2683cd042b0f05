"""Measure the cluster-presort block key vs the octant+Morton coherence key
on the 132k-tri scene (real chip):

    python -u tools/diag_presort.py > /tmp/diag_presort.txt 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(lanes: int = 262144):
    from yart_tpu.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tools.perf_trace import build_scene, make_rays
    from yart_tpu.kernels.pallas_fusedtrace import fused_trace_pallas
    from yart_tpu.render.blocktrace import _pad_sorted

    block = 128
    csize = 128
    scene, meta = build_scene(60, csize)
    print(f"{meta.n_tris} tris, {meta.n_clusters} clusters", flush=True)

    for coh in (False, True):
        o_np, d_np = make_rays(lanes, coh)
        o = jnp.asarray(o_np)
        d = jnp.asarray(d_np)
        for mode in ("morton", "cluster"):
            for kbatch in (4, 8):
                def full(scene, o, d, kbatch=kbatch, mode=mode):
                    n = o.shape[0]
                    tm = jnp.full((n,), 100.0, jnp.float32)
                    fl = jnp.zeros((n,), jnp.float32)
                    o_s, d_s, t_s, fl_s, inv, blive = _pad_sorted(
                        scene, o, d, tm, fl, block,
                        meta=meta if mode == "cluster" else None,
                    )
                    rays = jnp.concatenate(
                        [o_s, d_s, t_s[:, None], fl_s[:, None]], axis=1
                    )
                    res = fused_trace_pallas(
                        rays, scene.clus_box, scene.clus_pack, block,
                        csize, 1e-3, kbatch=kbatch, blive=blive,
                    )
                    return res, inv

                fn = jax.jit(full)
                res, inv = fn(scene, o, d)
                float(jnp.sum(res[:8, 0]))
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
                    f"  {tag} {mode:7s} kbatch={kbatch:2d}: "
                    f"{lanes/dt/1e6:6.2f} Mrays/s"
                    f"  trips/blk mean {trips.mean():6.1f} p95 "
                    f"{np.percentile(trips, 95):6.1f}"
                    f"  tested/blk {trips.mean()*kbatch:7.1f}"
                    f"  winners/blk {wins.mean():5.1f}"
                    f"  zero-trip blocks {np.mean(trips == 0):.2f}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
