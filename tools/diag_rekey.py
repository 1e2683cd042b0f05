"""Estimate the win from PER-RAY candidate pruning in the fused t-loop.

Round-3 finding (BASELINE.md): heavy blocks pay ~1.3 us per DISTINCT
cluster tested, ~75 per block, and the t-loop's termination test is
block-global — `improvable()` keeps cluster m alive if ANY ray's current
t exceeds m's BLOCK-MIN entry, even rays that never enter m's box at all
(kernels/pallas_fusedtrace.py). One miss ray (t stuck at t_max) therefore
forces the block to test its entire entered union.

The per-ray refinement: cluster m needs testing only if SOME ray r both
enters m (e_{r,m} < t_max) and can still improve (e_{r,m} < t_r current).
This script simulates three policies on the real bench workload (132k-tri
sphere field, 262k incoherent/coherent rays, real presort block order,
real final hit distances from a chip run):

  A  current kernel: nearest-entry order, block-global termination.
  B  oracle per-ray: process m only if some entering ray's CURRENT t
     can improve (upper bound for any re-key scheme).
  C  re-key every R: between re-keys behave like A over the (pruned)
     queue; at each re-key drop queue entries no entering ray can improve.

Cost model: iterations ~ 1.3 us each; a re-key ~ a box sweep (~5 us ~ 4
iteration-equivalents). Reports totals and the heavy-block tail.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    ),
)

import numpy as np

BLOCK = 128
T0 = 100.0


def block_data(scene, meta, o, d, t_final, win_clus):
    """Yield (e, hit, winner, tf) per live block under the real presort
    order (e/hit [B, n_clus] with the kernel's conservative margins)."""
    import jax.numpy as jnp

    from yart_tpu.kernels.pallas_fusedtrace import (
        SKEY_NOTHING, presort_keys_pallas,
    )
    from jax import lax

    n = o.shape[0]
    rays = np.concatenate(
        [o, d, np.full((n, 1), T0, np.float32), np.zeros((n, 1), np.float32)],
        axis=1,
    ).astype(np.float32)
    pk = np.asarray(
        presort_keys_pallas(
            jnp.asarray(rays), scene.clus_box, meta.n_clusters, 1e-3
        )
    )
    key = pk[:, 0].astype(np.uint32)
    key2 = pk[:, 6].astype(np.uint32)
    order = np.lexsort((np.arange(n), key2, key))
    key_s = key[order]
    boxes = np.asarray(scene.clus_box)  # [8, cpad]
    nc = meta.n_clusters
    lo = boxes[0:3, :nc].T[None]  # [1, nc, 3]
    hi = boxes[3:6, :nc].T[None]
    n_blocks = n // BLOCK
    for b in range(n_blocks):
        rows = order[b * BLOCK : (b + 1) * BLOCK]
        if not np.any(key_s[b * BLOCK : (b + 1) * BLOCK] < SKEY_NOTHING):
            continue
        ob, db = o[rows], d[rows]
        safe = np.where(np.abs(db) < 1e-20, np.where(db < 0, -1e-20, 1e-20), db)
        ia = (1.0 / safe)[:, None, :]  # [B, 1, 3]
        oia = (ob / safe)[:, None, :]
        x0 = lo * ia - oia
        x1 = hi * ia - oia
        ent = np.min(np.stack([x0, x1]), axis=0).max(axis=2)  # [B, nc]
        ext = np.max(np.stack([x0, x1]), axis=0).min(axis=2)
        e = np.maximum(ent - (np.abs(ent) * 1e-6 + 1e-7), 1e-3)
        xt = ext + (np.abs(ext) * 1e-6 + 1e-7)
        hitm = (xt >= e) & (e < T0) & (xt > 0.0)
        yield e, hitm, win_clus[rows], t_final[rows]


def simulate(e, hitm, winner, tf, policy, R=16):
    """Iterations (and re-keys) to traverse one block under a policy."""
    B, nc = e.shape
    emask = np.where(hitm, e, np.inf)
    entry = emask.min(axis=0)  # [nc] block-min entry
    order = np.argsort(entry)
    order = order[np.isfinite(entry[order])]
    t_cur = np.full(B, T0)
    iters = 0
    rekeys = 0
    if policy == "A":
        for m in order:
            if not np.any(t_cur > entry[m]):
                break
            iters += 1
            w = winner == m
            t_cur[w] = tf[w]
        return iters, 0
    if policy == "B":
        for m in order:
            if not np.any(t_cur > entry[m]):
                break
            if not np.any(emask[:, m] < t_cur):
                continue  # per-ray oracle skip (free)
            iters += 1
            w = winner == m
            t_cur[w] = tf[w]
        return iters, 0
    # policy C: re-key every R tested clusters
    queue = [m for m in order]
    qi = 0
    since = 0
    while qi < len(queue):
        m = queue[qi]
        qi += 1
        if not np.any(t_cur > entry[m]):
            break
        iters += 1
        since += 1
        w = winner == m
        t_cur[w] = tf[w]
        if since >= R and qi < len(queue):
            rekeys += 1
            since = 0
            queue = [m2 for m2 in queue[qi:] if np.any(emask[:, m2] < t_cur)]
            qi = 0
    return iters, rekeys


def main():
    import jax.numpy as jnp

    from perf_trace import build_scene, make_rays
    from yart_tpu.cache import enable_compile_cache
    from yart_tpu.render.blocktrace import intersect_blocktrace

    enable_compile_cache()
    scene, meta = build_scene(60, 128)
    # tri -> cluster map
    cf = np.asarray(scene.clus_first)
    cc = np.zeros(meta.n_tris, np.int32)
    counts = np.asarray(meta.cluster_counts) if hasattr(meta, "cluster_counts") else None
    # ranges are contiguous: next first in sorted order bounds each cluster
    o_sort = np.argsort(cf)
    bounds = np.concatenate([cf[o_sort], [meta.n_tris]])
    for k in range(len(cf)):
        cc[bounds[k] : bounds[k + 1]] = o_sort[k]
    lanes = 262144
    for name, coherent in (("incoherent", False), ("coherent", True)):
        o, d = make_rays(lanes, coherent)
        h = intersect_blocktrace(scene, meta, jnp.asarray(o), jnp.asarray(d), T0)
        t_final = np.asarray(h.t)
        tri = np.asarray(h.tri)
        win = np.where(tri >= 0, cc[np.clip(tri, 0, meta.n_tris - 1)], -1)
        tot = {k: 0 for k in ("A", "B", "C8", "C16", "C32")}
        rk = {k: 0 for k in tot}
        heavy = {k: 0 for k in tot}
        nblk = 0
        nheavy = 0
        for e, hitm, winner, tf in block_data(scene, meta, o, d, t_final, win):
            nblk += 1
            ia, _ = simulate(e, hitm, winner, tf, "A")
            is_heavy = ia > 8
            nheavy += is_heavy
            for key, pol, R in (
                ("A", "A", 0), ("B", "B", 0),
                ("C8", "C", 8), ("C16", "C", 16), ("C32", "C", 32),
            ):
                it, r = simulate(e, hitm, winner, tf, pol, R)
                tot[key] += it
                rk[key] += r
                if is_heavy:
                    heavy[key] += it
        print(f"== {name}: {nblk} live blocks, {nheavy} heavy (A>8 iters)")
        for key in tot:
            cost = tot[key] * 1.3 + rk[key] * 5.0
            print(
                f"  {key:>4}: iters {tot[key]:7d}  rekeys {rk[key]:5d}  "
                f"heavy-iters {heavy[key]:7d}  est-cost {cost/1e3:8.1f} ms"
            )


if __name__ == "__main__":
    main()
