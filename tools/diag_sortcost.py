"""Primitive-cost microbench for the pair-expansion traversal design:
big sorts, row gathers, scatters at pair scale (N rays x S slots).

    python -u tools/diag_sortcost.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, reps=4):
    import jax.numpy as jnp

    out = fn(*args)
    first = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(first.astype(jnp.float32)[:8].reshape(-1)[:8]))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        first = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(first.astype(jnp.float32)[:8].reshape(-1)[:8]))
    return (time.time() - t0) / reps * 1e3


def main():
    from yart_tpu.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(3)
    N = 262144
    for S in (8, 16):
        P = N * S
        keys = jnp.asarray(rng.integers(0, 1 << 24, P), jnp.uint32)
        vals = jnp.asarray(np.arange(P, dtype=np.int32))
        rows2 = jnp.asarray(rng.normal(size=(P, 2)), jnp.float32)
        rows8 = jnp.asarray(rng.normal(size=(P, 8)), jnp.float32)

        f = jax.jit(lambda k, v: lax.sort_key_val(k, v))
        print(f"S={S} P={P}: sort_key_val u32+i32      {timeit(f, keys, vals):7.2f} ms", flush=True)

        f2 = jax.jit(lambda k, r: lax.sort((k,) + tuple(r[:, i] for i in range(r.shape[1])), num_keys=1))
        print(f"S={S} P={P}: sort 1key+2payload        {timeit(f2, keys, rows2):7.2f} ms", flush=True)
        f8 = jax.jit(lambda k, r: lax.sort((k,) + tuple(r[:, i] for i in range(r.shape[1])), num_keys=1))
        print(f"S={S} P={P}: sort 1key+8payload        {timeit(f8, keys, rows8):7.2f} ms", flush=True)

        perm = jnp.asarray(rng.permutation(P).astype(np.int32))
        g = jax.jit(lambda r, p: r[p])
        print(f"S={S} P={P}: gather [P,2] rows          {timeit(g, rows2, perm):7.2f} ms", flush=True)
        print(f"S={S} P={P}: gather [P,8] rows          {timeit(g, rows8, perm):7.2f} ms", flush=True)

        # permutation scatter: rows2 back to original positions
        sc = jax.jit(lambda r, p: jnp.zeros_like(r).at[p].set(r, unique_indices=True, indices_are_sorted=False))
        print(f"S={S} P={P}: scatter-set [P,2] uniq     {timeit(sc, rows2, perm):7.2f} ms", flush=True)

        # segment-min via scatter-min into N bins
        ray = jnp.asarray(rng.integers(0, N, P), jnp.int32)
        sm = jax.jit(lambda v, r: jnp.full((N,), 3e38, jnp.float32).at[r].min(v))
        print(f"S={S} P={P}: scatter-min [P]->[N]       {timeit(sm, rows2[:, 0], ray):7.2f} ms", flush=True)

    # N-scale ops for reference
    permN = jnp.asarray(rng.permutation(N).astype(np.int32))
    rowsN = jnp.asarray(rng.normal(size=(N, 8)), jnp.float32)
    g = jax.jit(lambda r, p: r[p])
    print(f"N={N}: gather [N,8] rows              {timeit(g, rowsN, permN):7.2f} ms", flush=True)
    kN = jnp.asarray(rng.integers(0, 1 << 24, N), jnp.uint32)
    f = jax.jit(lambda k, v: lax.sort_key_val(k, v))
    print(f"N={N}: sort_key_val u32+i32           {timeit(f, kN, permN):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
