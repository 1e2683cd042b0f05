"""Sweep the fused-kernel sub-group count on the 132k-tri scene (chained
in-graph timing, dispatch-free). Round-3 heavy-tail fix: groups=G runs G
independent t-loops over block/G-row slices.

    python -u tools/diag_groups.py
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
    from yart_tpu.render.blocktrace import intersect_blocktrace

    scene, meta = build_scene(60, 128)
    print(f"{meta.n_tris} tris, {meta.n_clusters} clusters", flush=True)

    def chained(k, kbatch, groups):
        @jax.jit
        def f(s, o, d):
            h = None
            for _ in range(k):
                oi = o if h is None else o + h.t[:, None] * 1e-30
                h = intersect_blocktrace(
                    s, meta, oi, d, 100.0, kbatch=kbatch, groups=groups
                )
            return h
        return f

    for coh in (False, True):
        o_np, d_np = make_rays(lanes, coh)
        o, d = jnp.asarray(o_np), jnp.asarray(d_np)
        tag = "coh" if coh else "inc"
        for groups, kbatch in ((1, 4), (4, 4), (8, 4), (8, 2), (16, 2)):
            f1, fk = chained(1, kbatch, groups), chained(K, kbatch, groups)
            sync = lambda h: float(jnp.sum(h.t[:8]))
            for f in (f1, fk):
                sync(f(scene, o, d))
            ts = []
            for f in (f1, fk):
                t0 = time.time()
                for _ in range(3):
                    sync(f(scene, o, d))
                ts.append((time.time() - t0) / 3)
            per = (ts[1] - ts[0]) / (K - 1)
            print(
                f"  {tag} groups={groups:2d} kbatch={kbatch}: "
                f"{per*1e3:7.2f} ms/copy -> {lanes/per/1e6:6.2f} Mrays/s "
                f"(1call {ts[0]*1e3:.0f} ms)",
                flush=True,
            )


if __name__ == "__main__":
    main()
