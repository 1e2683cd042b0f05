"""Per-ray entered-cluster count distribution on the 132k-tri scene.

Sizes the pair-expansion traversal (round 3): if most rays enter <= S
clusters, testing exact (ray, cluster) pairs sorted by cluster id bounds
the work by the TRUE entered count instead of the per-block union.

    python -u tools/diag_pairs.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(lanes: int = 262144):
    from yart_tpu.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tools.perf_trace import build_scene, make_rays
    from yart_tpu.kernels.pallas_fusedtrace import (
        N_SLOTS,
        presort_keys_pallas,
    )

    block = 128
    scene, meta = build_scene(60, 128)
    print(f"{meta.n_tris} tris, {meta.n_clusters} clusters", flush=True)

    for coh in (False, True):
        o_np, d_np = make_rays(lanes, coh)
        rays = np.concatenate(
            [
                o_np,
                d_np,
                np.full((lanes, 1), 100.0, np.float32),
                np.zeros((lanes, 1), np.float32),
            ],
            axis=1,
        ).astype(np.float32)
        out = np.asarray(
            presort_keys_pallas(
                jnp.asarray(rays), scene.clus_box, meta.n_clusters, 1e-3,
                block=block,
            )
        )
        count = out[:, 1 + N_SLOTS]
        tag = "coh" if coh else "inc"
        qs = np.percentile(count, [50, 90, 95, 99, 99.9])
        print(
            f"  {tag}: entered mean {count.mean():.2f} "
            f"p50/p90/p95/p99/p99.9 {qs.astype(int)} max {count.max()}",
            flush=True,
        )
        for s in (2, 3, 4, 6, 8, 12, 16):
            frac = float(np.mean(count > s))
            tail = float(np.sum(np.maximum(count - s, 0)))
            print(
                f"    S={s:2d}: frac(count>S) {frac:7.4f}  "
                f"pairs(count<=S rays) {np.sum(np.minimum(count, s)):9.0f}"
                f"  excess-pairs beyond S {tail:9.0f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
