"""Time each stage of the blocktrace pipeline by chaining K copies inside
one jit (with a data dependence between copies so nothing hoists) and
differencing against a 1-copy run — the per-call axon dispatch/transfer
overhead (~27 ms) cancels out.

    python -u tools/diag_pipeline.py > /tmp/diag_pipeline.txt 2>&1
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
        """make_fn(k) -> jitted fn chaining k copies."""
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
        print(f"  {name}: {per*1e3:7.2f} ms  (1-copy call {ts[0]*1e3:.1f})",
              flush=True)
        return per

    for coh in (False, True):
        o_np, d_np = make_rays(lanes, coh)
        o = jnp.asarray(o_np)
        d = jnp.asarray(d_np)
        tm = jnp.full((lanes,), 100.0, jnp.float32)
        fl = jnp.zeros((lanes,), jnp.float32)
        rays = jnp.concatenate([o, d, tm[:, None], fl[:, None]], axis=1)
        tag = "coh" if coh else "inc"

        def chain(stage, k):
            @jax.jit
            def f(x):
                out = None
                for i in range(k):
                    xi = x if out is None else x + out * 1e-30
                    out = stage(xi)
                return out
            return f

        # presort kernel
        def mk_presort(k):
            return chain(
                lambda r: presort_keys_pallas(
                    r, scene.clus_box, int(meta.n_clusters), 1e-3,
                    block=block,
                ).astype(jnp.float32),
                k,
            )
        measure(f"{tag} presort", mk_presort, rays)

        keys = jax.jit(lambda r: presort_keys_pallas(
            r, scene.clus_box, int(meta.n_clusters), 1e-3, block=block
        ))(rays)[:, 0].astype(jnp.uint32)

        # argsort
        def mk_sort(k):
            return chain(
                lambda kk: jnp.argsort(kk.astype(jnp.uint32)).astype(
                    jnp.float32),
                k,
            )
        measure(f"{tag} argsort", mk_sort, keys.astype(jnp.float32))

        order = jax.jit(lambda k: jnp.argsort(k))(keys)

        # inverse permutation: second argsort vs elementwise scatter
        def mk_inv_sort(k):
            return chain(
                lambda o: jnp.argsort(o.astype(jnp.int32)).astype(
                    jnp.float32),
                k,
            )
        measure(f"{tag} inv argsort", mk_inv_sort, order.astype(jnp.float32))

        n_ = order.shape[0]

        def mk_inv_scatter(k):
            iota = jnp.arange(n_, dtype=jnp.int32)

            @jax.jit
            def f(o):
                out = o.astype(jnp.int32)
                for i in range(k):
                    out = jnp.zeros((n_,), jnp.int32).at[out].set(iota)
                return out.astype(jnp.float32)
            return f
        measure(f"{tag} inv scatter", mk_inv_scatter, order.astype(jnp.float32))

        # result row scatter [N, 8] (the res[inv] alternative: scatter
        # sorted-order rows back through `order` instead of gathering
        # through `inv`)
        def mk_row_scatter(k):
            @jax.jit
            def f(r, idx):
                out = r
                for i in range(k):
                    out = jnp.zeros_like(r).at[idx].set(out)
                return out
            return f
        measure(f"{tag} row scatter", mk_row_scatter, rays, order)

        # row gather [N, 8]
        def mk_gather(k):
            @jax.jit
            def f(r, idx):
                out = r
                for i in range(k):
                    out = out[idx]
                return out
            return f
        measure(f"{tag} row gather", mk_gather, rays, order)

        # fused kernel on sorted rays
        rays_s = rays[order]
        lane_live = keys[order] < SKEY_NOTHING
        blive = jnp.any(lane_live.reshape(-1, block), axis=1).astype(
            jnp.int32)
        print(f"  {tag} live blocks: {float(jnp.mean(blive)):.2f}",
              flush=True)

        def mk_fused(k, kb=8):
            @jax.jit
            def f(r, bl):
                out = None
                for i in range(k):
                    ri = r if out is None else r + out[:, :1] * 1e-30
                    out = fused_trace_pallas(
                        ri, scene.clus_box, scene.clus_pack, block, csize,
                        1e-3, kbatch=kb, blive=bl,
                    )
                return out
            return f
        for kb in (4, 8):
            measure(f"{tag} fused kb={kb}",
                    lambda k, kb=kb: mk_fused(k, kb), rays_s, blive)


if __name__ == "__main__":
    import sys as _sys

    main(int(_sys.argv[1]) if len(_sys.argv) > 1 else 262144)
