"""Bin-trace: two-phase big-scene intersection (collect clusters, then test
dense (ray, cluster) pairs on the MXU).

Replaces deep per-lane BVH traversal for large scenes. The reference's
answer to scene scale is a deeper per-ray stack walk (src/cpu/
ray-integrator.cpp:84-160); on TPU that walk is bandwidth-bound — every
lockstep iteration moves whole-wavefront stack state and gathers 224-byte
node rows per lane. Bin-trace restructures the problem:

  phase 1  traverse a ~100-group coarse BVH8 over triangle *clusters*
           (scene/clusters.py), collecting per ray the ids of up to K
           clusters whose boxes it enters. Tiny tree => few lockstep
           iterations and an [N, K] id buffer instead of deep stacks.
  phase 2  sort the (ray, cluster) pairs by cluster, pad each cluster's
           pair list to 1024-pair blocks, and run the Pallas pair kernel
           (kernels/pallas_cluster.py): per block, the cluster's triangles
           are tested against all 1024 rays as two [B,3]x[3,3C] MXU
           matmuls + VPU masking. Closest hits merge back per ray.

Correctness under the K cap uses a lexicographic continuation window.
Round r collects only clusters with (entry_distance, id) >=lex window_r;
clusters that didn't fit record bound_r = lexmin of everything dropped; a
ray is done when its best hit t <= bound_r.e (every untested cluster starts
at or beyond the hit) or nothing was dropped. Otherwise window_{r+1} =
bound_r, and slot 0 of the next round is reserved for exactly the cluster
with id == bound_r.id, which guarantees the window advances strictly each
round (ties in entry distance — axis-aligned grids — cannot stall it).
Re-testing a cluster is harmless (closest-hit merge is idempotent), so the
window only needs to bound, not partition.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from yart_tpu.kernels.pallas_cluster import (
    B_PAIRS,
    F32_MAX,
    cluster_pairs_pallas,
    cluster_pairs_ref,
)
from yart_tpu.ops.gatherless import select_along

# numpy, NOT jnp: this module is lazily imported INSIDE jit traces
# (render/intersect.py dispatch), and a module-level jnp constant created
# under an ambient trace is a TRACER that leaks into every later trace —
# the round-5 "Execution supplied N buffers but compiled program expected
# M" corruption (tools/diag_bufrepro.py).
_BIG = np.float32(3.0e38)
_NOID = np.int32(1 << 30)

# Batcher odd-even mergesort network for 8 elements (19 compare-exchanges).
_SORT8 = [
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6),
    (0, 4), (1, 5), (2, 6), (3, 7),
    (2, 4), (3, 5),
    (1, 2), (3, 4), (5, 6),
]


class _Collect(NamedTuple):
    iters: jnp.ndarray
    group: jnp.ndarray  # [N] current coarse group id
    cursor: jnp.ndarray  # [N] next sorted-child index within the group
    sp: jnp.ndarray  # [N] stack pointer
    stack: jnp.ndarray  # [N, S] packed (group << 3 | cursor) entries
    slots: jnp.ndarray  # [N, K] collected cluster ids (-1 empty)
    n_col: jnp.ndarray  # [N] slots used (incl. reserved slot 0)
    bound_e: jnp.ndarray  # [N] lexmin entry over dropped candidates
    bound_id: jnp.ndarray  # [N]
    active: jnp.ndarray  # [N]


def collect_clusters(scene, meta, o, d, t_cur, t_min, w_e, w_id, active, k):
    """Phase 1: one collection pass. Returns (slots [N,K], n_col, bound_e,
    bound_id). Candidate = cluster whose box the ray enters before t_cur,
    filtered to (entry, id) >=lex (w_e, w_id).

    Group-stack traversal: per-lane state is (group, cursor) where cursor
    indexes the group's DISTANCE-SORTED children, and the stack holds one
    packed (group, cursor) word per tree level (S = depth + 1). Each
    iteration re-fetches the group row, re-sorts its children with a
    Batcher network, and visits sorted child #cursor — recomputing the sort
    on pops trades cheap VPU work for the per-lane stack traffic and XLA
    scatters (~3 ms each at 262k lanes) that dominated the deep-stack
    formulation."""
    n = o.shape[0]
    width = 8
    stack_depth = meta.coarse_depth + 2
    max_iters = int(scene.coarse_pack.shape[0]) * (width + 1) + 64

    idir = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    odir = -o * idir
    arange_s = jnp.arange(stack_depth, dtype=jnp.int32)[None, :]
    arange_k = jnp.arange(k, dtype=jnp.int32)[None, :]
    has_window = w_id >= 0

    st = _Collect(
        iters=jnp.asarray(0, jnp.int32),
        group=jnp.zeros((n,), jnp.int32),
        cursor=jnp.zeros((n,), jnp.int32),
        sp=jnp.zeros((n,), jnp.int32),
        stack=jnp.zeros((n, stack_depth), jnp.int32),
        slots=jnp.full((n, k), -1, jnp.int32),
        n_col=jnp.where(has_window, 1, 0).astype(jnp.int32),
        bound_e=jnp.full((n,), _BIG, jnp.float32),
        bound_id=jnp.full((n,), _NOID, jnp.int32),
        active=active & (t_cur > t_min),
    )

    def cond(st):
        return jnp.any(st.active) & (st.iters < max_iters)

    def body(st):
        # ---- fetch current group, test and sort its children ----
        row = scene.coarse_pack[jnp.maximum(st.group, 0)]  # [N, 56]
        boxes = row[:, :48].reshape(n, width, 6)
        enc8 = lax.bitcast_convert_type(row[:, 48:56], jnp.int32)
        lo = boxes[..., 0:3] * idir[:, None, :] + odir[:, None, :]
        hi = boxes[..., 3:6] * idir[:, None, :] + odir[:, None, :]
        tlo = jnp.minimum(lo, hi)
        thi = jnp.maximum(lo, hi)
        c0 = jnp.maximum(jnp.max(tlo, axis=-1), t_min)  # [N, 8]
        c1r = jnp.min(thi, axis=-1)
        c1 = jnp.minimum(c1r, t_cur[:, None])
        # Window prune: a child exiting before w_e holds only clusters whose
        # entry < w_e — all ineligible this round.
        chit = (c1 >= c0) & (c1r >= w_e[:, None]) & (enc8 != -1)

        dist8 = jnp.where(chit, c0, F32_MAX)
        dcols = [dist8[:, i] for i in range(width)]
        ecols = [enc8[:, i] for i in range(width)]
        for i, j in _SORT8:
            swap = dcols[i] > dcols[j]
            di, dj = dcols[i], dcols[j]
            dcols[i] = jnp.where(swap, dj, di)
            dcols[j] = jnp.where(swap, di, dj)
            ei, ej = ecols[i], ecols[j]
            ecols[i] = jnp.where(swap, ej, ei)
            ecols[j] = jnp.where(swap, ei, ej)
        n_hit = jnp.sum(chit, axis=-1).astype(jnp.int32)

        # sorted child #cursor (cursor < 8 always)
        cur_sel = st.cursor[:, None] == jnp.arange(width, dtype=jnp.int32)[None, :]
        child = jnp.sum(
            jnp.where(cur_sel, jnp.stack(ecols, axis=1), 0), axis=1
        )
        child_d = jnp.sum(
            jnp.where(cur_sel, jnp.stack(dcols, axis=1), 0.0), axis=1
        )
        has_child = st.active & (st.cursor < n_hit)
        is_leaf = has_child & (child <= -2)
        is_inner = has_child & (child >= 0)

        # ---- leaf child: up to coarse_max_leaf cluster candidates ----
        vdec = -(child + 2)
        first = jnp.where(is_leaf, vdec >> 4, 0)
        count = jnp.where(is_leaf, vdec & 15, 0)
        slots, n_col, bound_e, bound_id = (
            st.slots, st.n_col, st.bound_e, st.bound_id,
        )
        entry = child_d
        for j in range(meta.coarse_max_leaf):
            cid = first + j
            present = is_leaf & (j < count)
            elig = present & (
                (entry > w_e) | ((entry == w_e) & (cid >= w_id))
            )
            is_win = elig & (cid == w_id)
            can = elig & (is_win | (n_col < k))
            slot = jnp.where(is_win, 0, jnp.minimum(n_col, k - 1))
            # [N, K] masked write (K is small; scatters are slow on TPU)
            put = can[:, None] & (arange_k == slot[:, None])
            slots = jnp.where(put, cid[:, None], slots)
            n_col = n_col + (can & ~is_win).astype(jnp.int32)
            dropped = elig & ~can
            better = dropped & (
                (entry < bound_e) | ((entry == bound_e) & (cid < bound_id))
            )
            bound_e = jnp.where(better, entry, bound_e)
            bound_id = jnp.where(better, cid, bound_id)

        # ---- advance ----
        # inner child: push (group, cursor+1) and descend; leaf child (or a
        # pruned miss): advance cursor; exhausted: pop.
        push = is_inner & (st.cursor + 1 < n_hit)
        packed = (st.group << 3) | jnp.minimum(st.cursor + 1, 7)
        put_s = push[:, None] & (arange_s == jnp.minimum(st.sp, stack_depth - 1)[:, None])
        stack = jnp.where(put_s, packed[:, None], st.stack)
        sp = st.sp + push.astype(jnp.int32)

        need_pop = st.active & ~has_child
        can_pop = sp > 0
        sp_post = jnp.where(need_pop & can_pop, sp - 1, sp)
        popped = jnp.take_along_axis(
            stack, jnp.clip(sp_post, 0, stack_depth - 1)[:, None], axis=1
        )[:, 0]
        group = jnp.where(
            is_inner, child,
            jnp.where(need_pop & can_pop, popped >> 3, st.group),
        )
        cursor = jnp.where(
            is_inner, 0,
            jnp.where(
                need_pop & can_pop, popped & 7,
                jnp.where(is_leaf, st.cursor + 1, st.cursor),
            ),
        )
        active = st.active & ~(need_pop & ~can_pop)
        return _Collect(
            st.iters + 1, group, cursor, sp_post, stack,
            slots, n_col, bound_e, bound_id, active,
        )

    st = lax.while_loop(cond, body, st)
    return st.slots, st.n_col, st.bound_e, st.bound_id


def _cummax(x):
    return lax.associative_scan(jnp.maximum, x)


def pairs_phase(scene, meta, slots, n_col, o, d, t_cur, t_min, interpret):
    """Phase 2: group pairs by cluster into block-uniform layout, run the
    pair kernel, reduce per ray. Returns (t, u, v, back, tri) per ray with
    t == t_cur (and tri == -1) where this round found nothing closer."""
    n, k = slots.shape
    c = meta.cluster_size
    n_clus = meta.n_clusters
    p0 = n * k

    pair_cid = slots.reshape(-1)
    slot_j = jnp.tile(jnp.arange(k, dtype=jnp.int32)[None], (n, 1)).reshape(-1)
    live = (slot_j < jnp.repeat(n_col, k)) & (pair_cid >= 0)
    key = jnp.where(live, pair_cid, n_clus)  # dead pairs sort last
    order = jnp.argsort(key)
    cid_s = key[order]
    live_s = cid_s < n_clus
    ray_s = order // k

    iota = jnp.arange(p0, dtype=jnp.int32)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), cid_s[1:] != cid_s[:-1]]
    )
    first_occ = _cummax(jnp.where(boundary, iota, 0))
    rank = iota - first_occ

    cnt = jnp.bincount(cid_s, length=n_clus + 1)[:n_clus]
    blocks_per = (cnt + B_PAIRS - 1) // B_PAIRS
    blk_off = jnp.concatenate(
        [jnp.zeros((1,), blocks_per.dtype), jnp.cumsum(blocks_per)]
    )
    n_blocks = p0 // B_PAIRS + n_clus  # static upper bound on padded blocks
    pmax = n_blocks * B_PAIRS

    blk = blk_off[jnp.clip(cid_s, 0, n_clus - 1)].astype(jnp.int32) + rank // B_PAIRS
    pos = blk * B_PAIRS + rank % B_PAIRS
    pos = jnp.where(live_s, pos, pmax)  # OOB -> dropped

    # Pair rows: o(3) d(3) tmax pad. Dead slots stay 0 => tmax 0 < t_min.
    row = jnp.concatenate(
        [o[ray_s], d[ray_s], t_cur[ray_s][:, None],
         jnp.zeros((p0, 1), jnp.float32)],
        axis=1,
    )
    x = jnp.zeros((pmax, 8), jnp.float32).at[pos].set(row, mode="drop")
    src = jnp.full((pmax,), p0, jnp.int32).at[pos].set(order, mode="drop")

    blk_live = jnp.where(live_s, blk, n_blocks)  # OOB for dead pairs
    block_live = (
        jnp.zeros((n_blocks,), jnp.int32).at[blk_live].set(1, mode="drop")
    )
    block_cid = (
        jnp.zeros((n_blocks,), jnp.int32)
        .at[blk_live]
        .set(cid_s, mode="drop")
    )
    block_first = scene.clus_first[jnp.clip(block_cid, 0, n_clus - 1)]

    run = cluster_pairs_ref if (
        interpret or jax.default_backend() != "tpu"
    ) else cluster_pairs_pallas
    t_p, u_p, v_p, back_p, tri_p = run(
        scene.clus_pack, block_cid, block_first, block_live, x, c, t_min
    )

    back = lambda a, fill, dt: (
        jnp.full((p0 + 1,), fill, dt).at[src].set(a, mode="drop")[:p0]
    )
    rt = back(t_p, F32_MAX, jnp.float32).reshape(n, k)
    ru = back(u_p, 0.0, jnp.float32).reshape(n, k)
    rv = back(v_p, 0.0, jnp.float32).reshape(n, k)
    rb = back(back_p.astype(jnp.float32), 0.0, jnp.float32).reshape(n, k)
    rtri = back(tri_p, -1, jnp.int32).reshape(n, k)

    best = jnp.argmin(rt, axis=1)
    bt = select_along(rt, best)
    got = bt < t_cur
    return (
        jnp.where(got, bt, t_cur),
        select_along(ru, best),
        select_along(rv, best),
        select_along(rb, best) > 0.5,
        jnp.where(got, select_along(rtri, best), -1),
        got,
    )


class _Rounds(NamedTuple):
    rnd: jnp.ndarray
    t: jnp.ndarray
    tri: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    back: jnp.ndarray
    any_hit: jnp.ndarray
    w_e: jnp.ndarray
    w_id: jnp.ndarray
    done: jnp.ndarray


def intersect_bintrace(
    scene,
    meta,
    o,
    d,
    t_max,
    t_min: float = 1e-3,
    nee: bool = False,
    k: int = 0,
    max_rounds: int = 64,
    interpret: bool = False,
):
    """Closest-hit (or NEE any-hit) via the bin-trace pipeline. Exact versus
    the stack traversals up to floating-point formulation differences in the
    triangle test (plane/barycentric vs Moller-Trumbore cross products)."""
    from yart_tpu.render.intersect import Hit

    n = o.shape[0]
    if k <= 0:
        k = meta.bintrace_k
    t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    st = _Rounds(
        rnd=jnp.asarray(0, jnp.int32),
        t=t0,
        tri=jnp.full((n,), -1, jnp.int32),
        u=jnp.zeros((n,), jnp.float32),
        v=jnp.zeros((n,), jnp.float32),
        back=jnp.zeros((n,), jnp.bool_),
        any_hit=jnp.zeros((n,), jnp.bool_),
        w_e=jnp.full((n,), -1.0, jnp.float32),
        w_id=jnp.full((n,), -1, jnp.int32),
        done=t0 <= t_min,
    )

    def cond(st):
        return jnp.any(~st.done) & (st.rnd < max_rounds)

    def body(st):
        slots, n_col, bound_e, bound_id = collect_clusters(
            scene, meta, o, d, st.t, t_min, st.w_e, st.w_id, ~st.done, k
        )
        t2, u2, v2, b2, tri2, got = pairs_phase(
            scene, meta, slots, n_col, o, d, st.t, t_min, interpret
        )
        upd = got & ~st.done
        t = jnp.where(upd, t2, st.t)
        tri = jnp.where(upd, tri2, st.tri)
        u = jnp.where(upd, u2, st.u)
        v = jnp.where(upd, v2, st.v)
        back = jnp.where(upd, b2, st.back)
        any_hit = st.any_hit | upd

        no_drops = bound_e >= _BIG
        done = st.done | no_drops | (t <= bound_e)
        if nee:
            done = done | any_hit
        return _Rounds(
            st.rnd + 1, t, tri, u, v, back, any_hit, bound_e, bound_id, done
        )

    st = lax.while_loop(cond, body, st)
    return Hit(
        st.t, st.tri, st.u, st.v, st.back,
        jnp.ones((n, 3), jnp.float32), st.any_hit,
    )
