"""Microbenchmark TPU gather forms at wavefront scale (chained in-graph
timing; per-call dispatch cancels). Decides the texture/env table layouts.

    python -u tools/diag_gather.py > /tmp/diag_gather.txt 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 6
N = 524288


def main():
    from yart_tpu.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    H = W = 512
    img = jnp.asarray(rng.random((H, W, 3), np.float32))
    img_flat3 = img.reshape(H * W, 3)
    img_flat8 = jnp.concatenate(
        [img_flat3, jnp.zeros((H * W, 5), jnp.float32)], axis=1)
    y = jnp.asarray(rng.integers(0, H, N, dtype=np.int32))
    x = jnp.asarray(rng.integers(0, W, N, dtype=np.int32))
    flat = y * W + x
    small = jnp.asarray(rng.random(513, np.float32))
    small_rows = jnp.concatenate(
        [jnp.tile(small[:512, None], (1, 8))], axis=1)
    idx513 = jnp.asarray(rng.integers(0, 512, N, dtype=np.int32))
    tbl = jnp.asarray(rng.random((124972, 32), np.float32))
    idxT = jnp.asarray(rng.integers(0, 124972, N, dtype=np.int32))
    vecN = jnp.asarray(rng.random(N, np.float32))

    def measure(name, stage, *args):
        def mk(k):
            @jax.jit
            def f(*a):
                out = None
                for i in range(k):
                    out = stage(*a, out)
                return out
            return f
        f1, fk = mk(1), mk(K)
        for f in (f1, fk):
            out = f(*args)
            float(jnp.sum(out.reshape(-1)[:8].astype(jnp.float32)))
        ts = []
        for f in (f1, fk):
            t0 = time.time()
            for r in range(3):
                out = f(*args)
                float(jnp.sum(out.reshape(-1)[:8].astype(jnp.float32)))
            ts.append((time.time() - t0) / 3)
        per = (ts[1] - ts[0]) / (K - 1)
        print(f"  {name:42s} {per*1e3:8.3f} ms", flush=True)

    def dep(idx, out):
        # data-dependence between chained copies without changing indices
        if out is None:
            return idx
        return idx + (out.reshape(-1)[:1] * 0).astype(idx.dtype)

    measure("2D gather img[y,x] -> [N,3]",
            lambda y, x, out: img[dep(y, out), x], y, x)
    measure("flat row gather [HW,3][i] -> [N,3]",
            lambda i, out: img_flat3[dep(i, out)], flat)
    measure("flat row gather [HW,8][i] -> [N,8]",
            lambda i, out: img_flat8[dep(i, out)], flat)
    measure("1D gather [513][i] -> [N]",
            lambda i, out: small[dep(i, out)], idx513)
    measure("row gather [512,8][i] -> [N,8]",
            lambda i, out: small_rows[dep(i, out)], idx513)
    measure("row gather [125k,32][i] -> [N,32]",
            lambda i, out: tbl[dep(i, out)], idxT)
    measure("1D gather [N][i] -> [N]",
            lambda i, out: vecN[dep(i, out)], flat % N)
    measure("compare-sum search [513] -> [N]",
            lambda u, out: jnp.sum(
                (small[None, :] < (u + (0 if out is None else
                 out.reshape(-1)[:1] * 0))[:, None]).astype(jnp.int32),
                axis=-1), vecN)


if __name__ == "__main__":
    main()
