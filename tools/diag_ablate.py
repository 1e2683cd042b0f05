"""Ablate the fused kernel stages on cluster-sorted rays (chained in-graph
timing): ablate=1 sweep only, 2 sweep+t-loop, 0 full. Sizes where the
per-live-block cost goes.

    python -u tools/diag_ablate.py > /tmp/diag_ablate.txt 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 5


def main(lanes: int = 262144):
    from yart_tpu.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tools.perf_trace import build_scene, make_rays
    from yart_tpu.kernels.pallas_fusedtrace import (
        SKEY_NOTHING, fused_trace_pallas, presort_keys_pallas,
    )

    block = 128
    csize = 128
    scene, meta = build_scene(60, csize)

    for coh in (False, True):
        o_np, d_np = make_rays(lanes, coh)
        o = jnp.asarray(o_np)
        d = jnp.asarray(d_np)
        tm = jnp.full((lanes,), 100.0, jnp.float32)
        fl = jnp.zeros((lanes,), jnp.float32)
        rays = jnp.concatenate([o, d, tm[:, None], fl[:, None]], axis=1)
        keys = jax.jit(lambda r: presort_keys_pallas(
            r, scene.clus_box, int(meta.n_clusters), 1e-3, block=block
        ))(rays)[:, 0].astype(jnp.uint32)
        order = jnp.argsort(keys)
        rays_s = rays[order]
        lane_live = keys[order] < SKEY_NOTHING
        blive = jnp.any(lane_live.reshape(-1, block), axis=1).astype(
            jnp.int32)
        tag = "coh" if coh else "inc"
        n_live = int(jnp.sum(blive != 0))
        print(f"{tag}: live blocks {n_live}/{blive.shape[0]}", flush=True)

        for ablate, kb in ((1, 8), (2, 8), (2, 16), (0, 8)):
            def mk(k, ablate=ablate, kb=kb):
                @jax.jit
                def f(r, bl):
                    out = None
                    for i in range(k):
                        ri = r if out is None else r + out[:, :1] * 1e-30
                        out = fused_trace_pallas(
                            ri, scene.clus_box, scene.clus_pack, block,
                            csize, 1e-3, kbatch=kb, blive=bl,
                            ablate=ablate,
                        )
                    return out
                return f

            f1, fk = mk(1), mk(K)
            for f in (f1, fk):
                out = f(rays_s, blive)
                float(jnp.sum(out.reshape(-1)[:8]))
            ts = []
            for f in (f1, fk):
                t0 = time.time()
                for r in range(3):
                    out = f(rays_s, blive)
                    float(jnp.sum(out.reshape(-1)[:8]))
                ts.append((time.time() - t0) / 3)
            per = (ts[1] - ts[0]) / (K - 1)
            print(f"  ablate={ablate} kbatch={kb:2d}: {per*1e3:7.2f} ms "
                  f"({per/max(n_live,1)*1e6:6.1f} us/live-blk)", flush=True)


if __name__ == "__main__":
    main()
