"""Sweep the fused-traversal shape knobs on the 132k-tri scene.

Grid: cluster_size x block x kbatch, end-to-end intersect_blocktrace
(presort + sort + fused kernel), coherent and incoherent rays. Each timing
forces completion with a per-rep scalar transfer and varies the input per
rep (memory/tpu-env-quirks: block_until_ready does not block on axon, and
identical (executable, args) pairs can be elided).

    python -u tools/ablate_shape.py > /tmp/ablate_shape.txt 2>&1

The winner goes into YART_TRACE_BLOCK / YART_TRACE_KBATCH env defaults
(render/blocktrace.py) and the builder's cluster_size default.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=524288)
    ap.add_argument("--spheres", type=int, default=60)
    ap.add_argument("--csizes", default="128,192,256")
    ap.add_argument("--blocks", default="128,256")
    ap.add_argument("--kbatches", default="4,8,16")
    args = ap.parse_args()

    from yart_tpu.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tools.perf_trace import build_scene, make_rays
    from yart_tpu.render.blocktrace import intersect_blocktrace

    lanes = args.lanes
    rays = {}
    for coh in (False, True):
        o_np, d_np = make_rays(lanes, coh)
        rays[coh] = (
            [jnp.asarray(o_np + np.float32(1e-5 * r)) for r in range(5)],
            jnp.asarray(d_np),
        )

    best = {False: (0.0, None), True: (0.0, None)}
    for csize in [int(x) for x in args.csizes.split(",")]:
        scene, meta = build_scene(args.spheres, csize)
        print(
            f"csize {csize}: {meta.n_tris} tris, {meta.n_clusters} clusters",
            flush=True,
        )
        for block in [int(x) for x in args.blocks.split(",")]:
            for kbatch in [int(x) for x in args.kbatches.split(",")]:
                fn = jax.jit(
                    lambda s, o, d, block=block, kbatch=kbatch: (
                        intersect_blocktrace(
                            s, meta, o, d, 100.0, block=block, kbatch=kbatch
                        )
                    )
                )
                for coh in (False, True):
                    os_, d = rays[coh]
                    sync = lambda h: float(jnp.sum(h.t[:8]))
                    t0 = time.time()
                    sync(fn(scene, os_[0], d))
                    comp = time.time() - t0
                    reps = 5
                    t0 = time.time()
                    for r in range(reps):
                        sync(fn(scene, os_[r], d))
                    dt = (time.time() - t0) / reps
                    mrays = lanes / dt / 1e6
                    tag = "coh" if coh else "inc"
                    print(
                        f"  c={csize:3d} b={block:3d} kb={kbatch:2d} {tag}: "
                        f"{mrays:7.2f} Mrays/s ({dt * 1e3:6.1f} ms, "
                        f"compile {comp:.0f}s)",
                        flush=True,
                    )
                    if mrays > best[coh][0]:
                        best[coh] = (mrays, (csize, block, kbatch))
    for coh in (False, True):
        mr, combo = best[coh]
        print(f"best {'coh' if coh else 'inc'}: {mr:.2f} Mrays/s @ {combo}",
              flush=True)


if __name__ == "__main__":
    main()
