"""Big-scene closest-hit throughput harness (the round-2 headline metric).

Builds a deterministic ~132k-triangle sphere-field scene, then measures
Mrays/s for incoherent and coherent ray batches through the selected
traversal path. Run on the real chip:

    python tools/perf_trace.py [--mode bintrace|bvh8|both] [--lanes 524288]

The reference analog is the closest-hit contract of
src/cpu/ray-integrator.cpp:84-160 (BVH traversal + Moller-Trumbore).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    ),
)

import numpy as np


def build_scene(n_spheres: int = 60, cluster_size: int = 128):
    from yart_tpu.scene.builder import SceneBuilder
    from yart_tpu.scene.procedural import uv_sphere

    rng = np.random.default_rng(7)
    b = SceneBuilder()
    m = b.add_material(roughness=0.4)
    for _ in range(n_spheres):
        c = rng.uniform(-6, 6, size=3)
        r = rng.uniform(0.4, 1.2)
        pos, nrm, tri = uv_sphere(c, r, n_theta=24, n_phi=48)
        b.add_mesh(pos, tri, m, normals=nrm)
    return b.compile(cluster_size=cluster_size)


def make_rays(n: int, coherent: bool):
    rng = np.random.default_rng(11)
    if coherent:
        # Camera-like: one origin, directions in a cone.
        o = np.tile(np.asarray([[0.0, 0.0, 20.0]], np.float32), (n, 1))
        xy = rng.uniform(-0.45, 0.45, size=(n, 2))
        d = np.concatenate([xy, -np.ones((n, 1))], axis=1).astype(np.float32)
    else:
        o = rng.uniform(-8, 8, size=(n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def run(mode: str, lanes: int, n_spheres: int, cluster_size: int, k: int):
    import jax
    import jax.numpy as jnp

    from yart_tpu.cache import enable_compile_cache

    enable_compile_cache()

    from yart_tpu.render.bintrace import intersect_bintrace
    from yart_tpu.render.intersect import intersect_bvh_sorted

    scene, meta = build_scene(n_spheres, cluster_size)
    print(
        f"scene: {meta.n_tris} tris, {meta.n_clusters} clusters of <= "
        f"{meta.cluster_size}, coarse groups {scene.coarse_pack.shape[0]} "
        f"depth {meta.coarse_depth}",
        flush=True,
    )

    fns = {}
    if mode in ("bintrace", "both", "all"):
        fns["bintrace"] = jax.jit(
            lambda s, o, d: intersect_bintrace(s, meta, o, d, 100.0, k=k)
        )
    if mode in ("bvh8", "both", "all"):
        fns["bvh8"] = jax.jit(
            lambda s, o, d: intersect_bvh_sorted(s, meta, o, d, 100.0)
        )
    if mode in ("fused", "all"):
        from yart_tpu.render.blocktrace import intersect_blocktrace

        fns["fused"] = jax.jit(
            lambda s, o, d: intersect_blocktrace(
                s, meta, o, d, 100.0, fused=True
            )
        )

    results = {}
    for coherent in (False, True):
        o_np, d_np = make_rays(lanes, coherent)
        # Distinct inputs per rep: the axon runtime can elide re-dispatch
        # of an identical (executable, args) pair, fabricating timings.
        os_ = [jnp.asarray(o_np + np.float32(1e-5 * r)) for r in range(5)]
        d = jnp.asarray(d_np)
        for name, fn in fns.items():
            # A small transfer per rep forces completion: on this runtime
            # block_until_ready() returns before the execution finishes.
            sync = lambda h: float(jnp.sum(h.t[:8]))
            t0 = time.time()
            hit = fn(scene, os_[0], d)
            sync(hit)
            compile_s = time.time() - t0
            reps = 5
            t0 = time.time()
            for r in range(reps):
                hit = fn(scene, os_[r], d)
                sync(hit)
            dt = (time.time() - t0) / reps
            mrays = lanes / dt / 1e6
            frac = float(jnp.mean(hit.mask))
            tag = "coherent" if coherent else "incoherent"
            results[f"{name}_{tag}"] = mrays
            print(
                f"{name:10s} {tag:10s}: {mrays:8.2f} Mrays/s "
                f"({dt*1e3:.1f} ms, hit {frac:.3f}, compile {compile_s:.0f}s)",
                flush=True,
            )
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode",
        default="fused",
        choices=["bintrace", "bvh8", "both", "fused", "all"],
    )
    ap.add_argument("--lanes", type=int, default=524288)
    ap.add_argument("--spheres", type=int, default=60)
    ap.add_argument("--cluster-size", type=int, default=128)
    ap.add_argument("--k", type=int, default=12)
    args = ap.parse_args()
    run(args.mode, args.lanes, args.spheres, args.cluster_size, args.k)
