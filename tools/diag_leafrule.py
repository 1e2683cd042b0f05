"""Native leaf-rule deviation (VERDICT round-3 #10): fixed-cap leaves
(span <= max_leaf always leafs — both production builders) vs the
reference's leaf-vs-split cost test (split below the cap when SAH says
children beat testing the leaf, /root/reference/src/core/bvh.hpp:341-345).

Builds the 132k-tri bench scene both ways (numpy builder,
leaf_cost_test flag; the native builder is bypassed) and measures the
stack traversal (intersect_bvh8 — the path that visits leaves; the
block-trace cluster cut happens at span<=128, far above leaf scale, so
it is insensitive to the leaf rule by construction). Chained in-graph
timing, incoherent + coherent.

    python tools/diag_leafrule.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)

import functools

import numpy as np


def build(leaf_cost_test):
    import yart_tpu.native as native
    import yart_tpu.scene.builder as bm
    from yart_tpu.scene import bvh as bvh_mod

    orig_native = native.build_bvh_native
    orig_build = bm.build_bvh
    native.build_bvh_native = lambda *a, **k: None
    bm.build_bvh = functools.partial(
        bvh_mod.build_bvh, leaf_cost_test=leaf_cost_test
    )
    try:
        from perf_trace import build_scene

        t0 = time.time()
        scene, meta = build_scene(60, 128)
        dt = time.time() - t0
    finally:
        native.build_bvh_native = orig_native
        bm.build_bvh = orig_build
    return scene, meta, dt


def main():
    import jax
    import jax.numpy as jnp

    from perf_trace import make_rays
    from yart_tpu.cache import enable_compile_cache
    from yart_tpu.render.intersect import intersect_bvh8

    enable_compile_cache()
    lanes = 262144
    K = 4

    for name, lct in (("fixed-cap", False), ("leaf-cost-test", True)):
        scene, meta, dt = build(lct)
        print(f"{name}: built in {dt:.1f}s, wide nodes "
              f"{scene.wide_pack.shape[0]}")

        def chained(s):
            @jax.jit
            def f(s, o, d):
                h = None
                for _ in range(K):
                    oi = o if h is None else o + h.t[:, None] * 1e-30
                    h = intersect_bvh8(s, meta, oi, d, 100.0)
                return h
            return f

        fk = chained(scene)
        for coh in (False, True):
            o, d = make_rays(lanes, coh)
            o, d = jnp.asarray(o), jnp.asarray(d)
            sync = lambda h: float(jnp.sum(h.t[:8]))
            sync(fk(scene, o, d))
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                sync(fk(scene, o, d))
            mr = lanes * K * reps / (time.time() - t0) / 1e6
            print(f"  bvh8 {'coherent' if coh else 'incoherent'}: "
                  f"{mr:6.2f} Mrays/s")


if __name__ == "__main__":
    main()
