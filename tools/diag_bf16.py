"""Is the VPU 2x on bf16 for the t-loop's op mix? (round 3)

The fused traversal's floor is ~1.3 us per distinct cluster per 128-block:
a ~20-op f32 chain at [128, 3C] (48 vregs/op). bf16 halves vregs/op; if
the VPU retires bf16 vregs at the f32 rate, the chain costs half and a
conservative bf16 phase-2 becomes the next traversal lever. This kernel
times the EXACT op mix of _t_only (div, 4 fma-ish, 9 compares, selects,
lane-min) iterated in VMEM, f32 vs bf16. Methodology: the ~26 ms per-call
axon dispatch overhead dwarfs the kernel, so each dtype is timed at two
iteration counts and differenced (same recipe as the chained benches).
Scalar bf16 arithmetic does not legalize in Mosaic — the iteration
dependency rides through a VECTOR accumulator instead.

RESULT (round 3, v5e via axon): the bf16 chain DOES NOT COMPILE — Mosaic
fails to legalize bf16 vector compares (`arith.cmpf` on
vector<8x128x2xbf16>), so the half-vreg lever is unavailable on this
toolchain regardless of ALU rates. The f32 chain at [128, 128] thirds
measures below this harness's resolution (< ~0.3 us per 22-op chain at
IT_HI=4096 against +-1 ms dispatch noise), consistent with the real
kernel's 1.3 us/cluster being dominated by the [B, 3C] projection width
plus the min-extraction sync, not the [B, C] validity chain.

    python -u tools/diag_bf16.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np

B, C = 128, 128
IT_LO, IT_HI = 512, 4096


def main():
    from yart_tpu.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def chain_kernel(dtype, iters, ro_ref, rd_ref, out_ref):
        ro = ro_ref[...].astype(dtype)
        rd = rd_ref[...].astype(dtype)
        c = C
        no, uo, vo = ro[:, :c], ro[:, c : 2 * c], ro[:, 2 * c :]
        nd, ud, vd = rd[:, :c], rd[:, c : 2 * c], rd[:, 2 * c :]
        one = jnp.asarray(1.0, dtype)
        zero = jnp.asarray(0.0, dtype)
        big = jnp.asarray(3e4, dtype)
        tmin = jnp.asarray(1e-3, dtype)

        def body(i, acc):
            # Same mix as _t_only: 1 div, 4 mul/add, 9 cmp/and, select,
            # lane-min. `acc` (vector) feeds the inputs so no iteration
            # can hoist or CSE; it stays tiny so values remain sane.
            no_i = no + acc
            t = (one - no_i) / nd
            u = uo + t * ud
            v = vo + t * vd
            valid = (
                (jnp.abs(nd) >= tmin)
                & (u >= zero) & (u <= one)
                & (v >= zero) & (u + v <= one)
                & (t > tmin) & (t < big) & (t > acc)
            )
            tm = jnp.where(valid, t, big)
            bt = jnp.min(tm, axis=1, keepdims=True)
            return acc + bt * jnp.asarray(1e-7, dtype)

        acc = lax.fori_loop(0, iters, body, jnp.zeros((B, 1), dtype))
        out_ref[...] = acc.astype(jnp.float32)

    def run(dtype, name):
        rng = np.random.default_rng(0)
        ro = jnp.asarray(rng.standard_normal((B, 3 * C)), jnp.float32)
        rd = jnp.asarray(
            rng.standard_normal((B, 3 * C)) + 0.5, jnp.float32
        )
        ts = []
        for iters in (IT_LO, IT_HI):
            f = pl.pallas_call(
                functools.partial(chain_kernel, dtype, iters),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
            )
            g = jax.jit(f)
            out = g(ro, rd)
            float(jnp.sum(out))
            reps = 5
            t0 = time.time()
            for _ in range(reps):
                out = g(ro, rd)
                float(jnp.sum(out))
            ts.append((time.time() - t0) / reps)
        per = (ts[1] - ts[0]) / (IT_HI - IT_LO) * 1e9
        print(f"  {name}: {per:7.1f} ns/chain "
              f"(lo {ts[0]*1e3:.2f} ms, hi {ts[1]*1e3:.2f} ms)", flush=True)
        return per

    f32 = run(jnp.float32, "f32 ")
    bf16 = run(jnp.bfloat16, "bf16")
    print(f"  bf16/f32 ratio: {bf16/f32:.2f}")


if __name__ == "__main__":
    main()
