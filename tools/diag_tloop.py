"""Measure fused-trace t-loop variants on the chip (chained in-graph).

Variants:
  - kbatch sweep (current independent-chain batching)
  - mxu_test=True (MXU projections per cluster, exists but unmeasured)
  - future: wide-fused kbatch (one op chain over K clusters' lanes)

    python -u tools/diag_tloop.py > /tmp/diag_tloop.txt 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 5  # chained copies


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
    print(f"{meta.n_tris} tris, {meta.n_clusters} clusters", flush=True)

    def measure(name, make_fn, *args):
        f1 = make_fn(1)
        fk = make_fn(K)
        for f in (f1, fk):
            out = f(*args)
            float(jnp.sum(out.reshape(-1)[:8].astype(jnp.float32)))
        reps = 3
        ts = []
        for f in (f1, fk):
            t0 = time.time()
            for r in range(reps):
                out = f(*args)
                float(jnp.sum(out.reshape(-1)[:8].astype(jnp.float32)))
            ts.append((time.time() - t0) / reps)
        per = (ts[1] - ts[0]) / (K - 1)
        print(f"  {name}: {per*1e3:7.2f} ms", flush=True)
        return per

    for coh in (False, True):
        o_np, d_np = make_rays(lanes, coh)
        o = jnp.asarray(o_np)
        d = jnp.asarray(d_np)
        tm = jnp.full((lanes,), 100.0, jnp.float32)
        fl = jnp.zeros((lanes,), jnp.float32)
        rays = jnp.concatenate([o, d, tm[:, None], fl[:, None]], axis=1)
        tag = "coh" if coh else "inc"

        keys = jax.jit(lambda r: presort_keys_pallas(
            r, scene.clus_box, int(meta.n_clusters), 1e-3, block=block
        ))(rays)[:, 0].astype(jnp.uint32)
        order = jnp.argsort(keys)
        rays_s = rays[order]
        lane_live = keys[order] < SKEY_NOTHING
        blive = jnp.any(lane_live.reshape(-1, block), axis=1).astype(
            jnp.int32)

        def mk_fused(k, kb=8, mxu=False, tf=False):
            @jax.jit
            def f(r, bl):
                out = None
                for i in range(k):
                    ri = r if out is None else r + out[:, :1] * 1e-30
                    out = fused_trace_pallas(
                        ri, scene.clus_box, scene.clus_pack, block, csize,
                        1e-3, kbatch=kb, blive=bl, mxu_test=mxu, tfuse=tf,
                    )
                return out
            return f

        for kb, mxu, tf in (
            (4, False, False), (8, False, False),
            (2, False, True), (4, False, True), (8, False, True),
            (16, False, True),
            (4, True, False), (8, True, False),
        ):
            measure(f"{tag} fused kb={kb} mxu={int(mxu)} tfuse={int(tf)}",
                    lambda k, kb=kb, mxu=mxu, tf=tf: mk_fused(k, kb, mxu, tf),
                    rays_s, blive)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 262144)
