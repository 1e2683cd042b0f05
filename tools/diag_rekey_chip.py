"""On-chip sweep of the per-ray re-key period (kernels/pallas_fusedtrace.py
`rekey`): chained in-graph Mrays/s on the 132k-tri field, incoherent +
coherent, vs the rekey=0 baseline. Usage: python tools/diag_rekey_chip.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    ),
)


def main():
    import jax
    import jax.numpy as jnp

    from perf_trace import build_scene, make_rays
    from yart_tpu.cache import enable_compile_cache
    from yart_tpu.render.blocktrace import intersect_blocktrace

    enable_compile_cache()
    scene, meta = build_scene(60, 128)
    lanes = 262144
    K = 10

    from yart_tpu.kernels import pallas_fusedtrace as pf

    def chained(k, rekey, minleft):
        import functools
        @jax.jit
        def f(s, o, d):
            h = None
            for _ in range(k):
                oi = o if h is None else o + h.t[:, None] * 1e-30
                from yart_tpu.render import blocktrace as bt
                h = bt.intersect_blocktrace(s, meta, oi, d, 100.0, rekey=rekey, minleft=minleft)
            return h
        return f

    sync = lambda h: float(jnp.sum(h.t[:8]))
    for coherent in (False, True):
        o_np, d_np = make_rays(lanes, coherent)
        o = jnp.asarray(o_np)
        d = jnp.asarray(d_np)
        name = "coherent" if coherent else "incoherent"
        for rekey, minleft in ((0, 8), (2, 8), (2, 16), (2, 24), (2, 32), (4, 16), (4, 24)):
            import yart_tpu.render.blocktrace as bt
            fk = chained(K, rekey, minleft)
            sync(fk(scene, o, d))
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                sync(fk(scene, o, d))
            mrays = lanes * K * reps / (time.time() - t0) / 1e6
            print(f"{name} rekey={rekey} minleft={minleft}: {mrays:6.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
