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
from jax import lax

from yart_tpu.kernels.pallas_cluster import (
    B_PAIRS,
    F32_MAX,
    cluster_pairs_pallas,
    cluster_pairs_ref,
)
from yart_tpu.ops.gatherless import select_along

_BIG = jnp.float32(3.0e38)
_NOID = jnp.int32(1 << 30)


class _Collect(NamedTuple):
    iters: jnp.ndarray
    cur: jnp.ndarray  # [N] encoded coarse ref
    cur_dist: jnp.ndarray  # [N]
    sp: jnp.ndarray  # [N]
    senc: jnp.ndarray  # [N, S]
    sdist: jnp.ndarray  # [N, S]
    slots: jnp.ndarray  # [N, K] collected cluster ids (-1 empty)
    n_col: jnp.ndarray  # [N] slots used (incl. reserved slot 0)
    bound_e: jnp.ndarray  # [N] lexmin entry over dropped candidates
    bound_id: jnp.ndarray  # [N]
    active: jnp.ndarray  # [N]


def collect_clusters(scene, meta, o, d, t_cur, t_min, w_e, w_id, active, k):
    """Phase 1: one collection pass. Returns (slots [N,K], n_col, bound_e,
    bound_id). Candidate = cluster whose box the ray enters before t_cur,
    filtered to (entry, id) >=lex (w_e, w_id)."""
    n = o.shape[0]
    width = 8
    stack_depth = (width - 1) * meta.coarse_depth + 2
    max_iters = int(scene.coarse_pack.shape[0]) * 2 + meta.n_clusters + 64

    idir = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    odir = -o * idir
    arange_s = jnp.arange(stack_depth, dtype=jnp.int32)[None, :]
    arange_w = jnp.arange(width, dtype=jnp.int32)[None, :]
    lanes = jnp.arange(n, dtype=jnp.int32)
    has_window = w_id >= 0

    st = _Collect(
        iters=jnp.asarray(0, jnp.int32),
        cur=jnp.zeros((n,), jnp.int32),
        cur_dist=jnp.full((n,), t_min, jnp.float32),
        sp=jnp.zeros((n,), jnp.int32),
        senc=jnp.zeros((n, stack_depth), jnp.int32),
        sdist=jnp.zeros((n, stack_depth), jnp.float32),
        slots=jnp.full((n, k), -1, jnp.int32),
        n_col=jnp.where(has_window, 1, 0).astype(jnp.int32),
        bound_e=jnp.full((n,), _BIG, jnp.float32),
        bound_id=jnp.full((n,), _NOID, jnp.int32),
        active=active & (t_cur > t_min),
    )

    def cond(st):
        return jnp.any(st.active) & (st.iters < max_iters)

    def body(st):
        is_leaf = st.cur <= -2
        near_ok = st.cur_dist < t_cur
        do_leaf = st.active & is_leaf & near_ok
        do_inner = st.active & (~is_leaf) & near_ok

        # ---- leaf: up to coarse_max_leaf cluster candidates ----
        vdec = -(st.cur + 2)
        first = jnp.where(is_leaf, vdec >> 4, 0)
        count = jnp.where(do_leaf, vdec & 15, 0)
        slots, n_col, bound_e, bound_id = (
            st.slots, st.n_col, st.bound_e, st.bound_id,
        )
        entry = st.cur_dist
        for j in range(meta.coarse_max_leaf):
            cid = first + j
            present = j < count
            elig = present & (
                (entry > w_e) | ((entry == w_e) & (cid >= w_id))
            )
            is_win = elig & (cid == w_id)
            can = elig & (is_win | (n_col < k))
            slot = jnp.where(is_win, 0, jnp.minimum(n_col, k - 1))
            write = jnp.where(can, slot, k)  # k = out of bounds -> dropped
            slots = slots.at[lanes, write].set(cid, mode="drop")
            n_col = n_col + (can & ~is_win).astype(jnp.int32)
            dropped = elig & ~can
            better = dropped & (
                (entry < bound_e) | ((entry == bound_e) & (cid < bound_id))
            )
            bound_e = jnp.where(better, entry, bound_e)
            bound_id = jnp.where(better, cid, bound_id)

        # ---- inner: one row gather, 8 box tests ----
        row = scene.coarse_pack[jnp.maximum(st.cur, 0)]  # [N, 56]
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
        chit = (
            (c1 >= c0)
            & (c1r >= w_e[:, None])
            & (enc8 != -1)
            & do_inner[:, None]
        )

        dist8 = jnp.where(chit, c0, F32_MAX)
        order = jnp.argsort(dist8, axis=-1)
        perm = (order[:, :, None] == arange_w[:, None, :]).astype(jnp.float32)
        s_enc = jnp.einsum(
            "noi,ni->no", perm, enc8.astype(jnp.float32)
        ).astype(jnp.int32)
        s_dist = jnp.einsum("noi,ni->no", perm, dist8)
        n_hit = jnp.sum(chit, axis=-1).astype(jnp.int32)

        descend = do_inner & (n_hit > 0)
        n_push = jnp.maximum(n_hit - 1, 0)
        rel = arange_s - st.sp[:, None]
        write_s = (rel >= 0) & (rel < n_push[:, None]) & descend[:, None]
        src = jnp.clip(n_hit[:, None] - 1 - rel, 0, width - 1)
        sel = src[:, :, None] == arange_w[:, None, :]
        val_enc = jnp.sum(jnp.where(sel, s_enc[:, None, :], 0), axis=-1)
        val_dist = jnp.sum(jnp.where(sel, s_dist[:, None, :], 0.0), axis=-1)
        senc = jnp.where(write_s, val_enc, st.senc)
        sdist = jnp.where(write_s, val_dist, st.sdist)
        sp = st.sp + jnp.where(descend, n_push, 0)

        # ---- pop / terminate ----
        need_pop = do_leaf | (st.active & ~near_ok) | (do_inner & ~descend)
        can_pop = sp > 0
        sp_post = jnp.where(need_pop & can_pop, sp - 1, sp)
        pop_idx = jnp.clip(sp_post, 0, stack_depth - 1)
        popped_enc = select_along(senc, pop_idx)
        popped_d = select_along(sdist, pop_idx)
        cur = jnp.where(
            descend, s_enc[:, 0], jnp.where(need_pop, popped_enc, st.cur)
        )
        cur_dist = jnp.where(
            descend, s_dist[:, 0], jnp.where(need_pop, popped_d, st.cur_dist)
        )
        active = st.active & ~(need_pop & ~can_pop)
        return _Collect(
            st.iters + 1, cur, cur_dist, sp_post, senc, sdist,
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
