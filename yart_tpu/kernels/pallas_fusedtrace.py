"""Fused one-pass block traversal: sweep + nearest-first test in ONE kernel.

The round-based block-trace (pallas_blocktrace.py) pays three structural
costs the TPU profile exposed: a fixed ~4us grid-step cost per (block, slot)
pair in the test kernel (dead slots included), a full re-sweep of every
cluster box each continuation round, and a host-level while_loop round trip.
This kernel removes all three by doing the whole traversal for a ray block
in a single grid step, in three stages:

  1. sweep    every cluster AABB against the block's B rays once, as
              broadcast FMAs over [B, cpad] (six [B,2]x[2,cpad] MXU
              contractions were tried first and measure ~3-8x slower:
              K=2 passes are MXU-latency-bound, ~74 invocations per
              block at cpad ~1.5k). Reduce to one packed (entry |
              cluster id) key per live cluster.
  2. t-loop   lax.while_loop in nearest-entry order: read the candidate
              cluster's prepacked [8, 3C] operand (VMEM-resident pack, or
              double-buffered HBM DMA for packs over VMEM_PACK_BYTES),
              compute only the per-ray closest VALID t for that cluster
              (one lane-reduction), and carry exact (t_bits, winning
              cluster id) per ray. The block retires exactly when the next
              entry bound can no longer beat any ray's current t. The
              expensive argmin/attribute extraction is NOT done here — a
              round-2 profile showed the per-iteration argmin/take chain
              (~10 lane-reductions) dominating the whole traversal.
  3. winners  a second short loop over the DISTINCT winning cluster ids,
              extracted from the per-ray cid_best vector ([B,1] sublane
              space): re-test each with the full epilogue (u, v,
              backface, triangle argmin) and keep the exact closest hit.
              Phase 2 tests every cluster some ray won, so each ray's
              final hit is bit-identical to testing everything with the
              full epilogue.

Scheduling around the kernel (render/blocktrace.py): rays are sorted by
the presort kernel's key — (nearest-entered cluster, 2nd cluster), with
long-tail rays grouped separately and empty/dead rays last — and blocks
that provably enter nothing are skipped wholesale via the scalar-prefetch
`blive` flags. Versus the octant+Morton coherence sort this cut the
per-block tested-cluster union from ~95 to ~6-47 and made 58-70% of
blocks free (tools/diag_presort.py history).

Reference contract: closest hit / NEE early-out of
src/cpu/ray-integrator.cpp:84-229; the traversal order differs (cluster
nearest-first per ray block instead of a per-ray node stack) but the result
is the exact same closest hit, which tests/test_blocktrace.py asserts
against the brute oracle.

Conservativeness: the entry/exit bounds get a 1e-6 relative margin in the
safe direction, so box culling only ever over-includes (the exact
per-triangle test decides every hit); the packed key clears ID_BITS low
mantissa bits, which only lowers the entry used for the termination bound.
The phase-1 t carry is EXACT (two i32 words per ray), so no quantization
can pick the wrong winner.

Diagnostics: out lane 0 col 5 carries the phase-1 trip count, col 6 the
phase-2 winner count, per block (tools/perf_trace.py uses them to tune
block size).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yart_tpu.kernels.pallas_blocktrace import ID_BITS, ID_MASK, KEY_DEAD

# Block sort key layout (presort): [nothing | heavy | cid0 | cid1] — two
# ID_BITS-wide cluster ids plus two flag bits above them.
SKEY_HEAVY = 1 << (2 * ID_BITS)
SKEY_NOTHING = SKEY_HEAVY << 1
from yart_tpu.kernels.pallas_cluster import (
    EPS_DET,
    F32_MAX,
    _amask_valid,
    _pair_test,
    _pair_test_mxu,
)

MAX_ITERS = 1 << ID_BITS  # safety cap == max clusters

# Cluster packs up to this size stay VMEM-resident for the whole grid
# (dynamic-slice reads instead of per-iteration DMAs); bigger scenes
# stream clusters from HBM with double-buffered copies. 88 MB covers
# Bistro-scale scenes (~900k tris at C=128; a 489k-tri atrium(density=2)
# pack is 70 MB and measured FASTER resident than streamed) while
# leaving ~40 MB of the v5e's VMEM for the kernel working set.
VMEM_PACK_BYTES = 88 << 20


def _proj(o, d, tri, mxu: bool):
    """Ray.(n|eu|ev) projections [B, 3C]. `o`/`d` are [B,3] (broadcast
    form) or [3,B] (MXU form, rays SoA-transposed)."""
    if mxu:
        dot = lambda l: lax.dot_general(
            l, tri[0:3, :], (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return dot(o), dot(d)
    ro = (
        o[:, 0:1] * tri[0, :][None, :]
        + o[:, 1:2] * tri[1, :][None, :]
        + o[:, 2:3] * tri[2, :][None, :]
    )
    rd = (
        d[:, 0:1] * tri[0, :][None, :]
        + d[:, 1:2] * tri[1, :][None, :]
        + d[:, 2:3] * tri[2, :][None, :]
    )
    return ro, rd


def _t_only(ro, rd, tmax, tri, c: int, t_min: float, floor,
            amask: bool = False):
    """Closest VALID t of the cluster per ray: [B,1], F32_MAX on miss.
    `amask` also rejects candidates whose baked alpha bitmask cell is
    certainly transparent (pallas_cluster._amask_valid)."""
    consts = tri[3, :][None, :]
    no, uo, vo = ro[:, :c], ro[:, c : 2 * c], ro[:, 2 * c :]
    nd, ud, vd = rd[:, :c], rd[:, c : 2 * c], rd[:, 2 * c :]
    cn, cu, cv = consts[:, :c], consts[:, c : 2 * c], consts[:, 2 * c :]
    t = (cn - no) / nd
    u = uo + t * ud - cu
    v = vo + t * vd - cv
    valid = (
        (jnp.abs(nd) >= EPS_DET)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min) & (t < tmax) & (t > floor)
    )
    if amask:
        valid = valid & _amask_valid(u, v, tri, c)
    return jnp.min(jnp.where(valid, t, F32_MAX), axis=1, keepdims=True)


def _t_only_fused(po, pd, t_best, floor, ms, pack_ref, c: int,
                  t_min: float, n_clus: int, mxu: bool, cid_best, t_bits):
    """One WIDE op chain testing all K batched clusters at once
    (`tfuse=True`). MEASURED A LOSS at every K — kept selectable as the
    reproducible record (tools/diag_tloop.py).

    Hypothesis: the per-cluster test chain looked op-issue-bound (a
    [16, 3C] op costs nearly as much as a [128, 3C] one), so K
    independent [B, C]-third chains would pay K fixed costs per op;
    lane-concatenating the K packs to [8, 3CK], projecting once at
    [B, 3CK], and running the ~20-op validity + min chain once at [B, CK]
    should cost ~1/K. Measured (132k tris, 262k rays, chained in-graph):
    incoherent 58.4-58.7 ms at K=4/8 (65.6 at 16, 70.9 at 2) vs 50.5 ms
    for the sequential fold; coherent 13.9-15.0 vs 12.9. Conclusion: ops
    *scale with lane width* beyond ~[128, 384] — the fixed-cost plateau
    observed on the row axis is the throughput floor of a ~48-vreg op,
    not issue latency — so a [B, 3CK] chain costs ~K x a [B, 3C] one and
    the concat/regroup moves are pure overhead. The per-distinct-cluster
    cost (~1.3 us/block) is therefore a genuine VPU-throughput floor for
    this data layout, closing the lane-fusion family of optimizations.

    Result is bit-exact vs the sequential fold (same f32 formulas,
    rounding-free min, lowest-lane tie-break == first-k-wins — asserted
    by tests/test_blocktrace.py::test_tfuse_bit_exact). Dead tail slots
    (mk == KEY_DEAD) are masked per lane group. Returns
    (t_bits, cid_best)."""
    kb = len(ms)
    cids = [jnp.minimum(mk & ID_MASK, n_clus - 1) for mk in ms]
    triw = jnp.concatenate([pack_ref[cid] for cid in cids], axis=1)
    ro, rd = _proj(po, pd, triw, mxu)  # [B, 3CK]
    cat = lambda a, j: jnp.concatenate(
        [a[:, (3 * k + j) * c : (3 * k + j + 1) * c] for k in range(kb)],
        axis=1,
    )
    no, uo, vo = cat(ro, 0), cat(ro, 1), cat(ro, 2)
    nd, ud, vd = cat(rd, 0), cat(rd, 1), cat(rd, 2)
    consts = triw[3:4, :]
    cn, cu, cv = cat(consts, 0), cat(consts, 1), cat(consts, 2)
    dead = jnp.concatenate(
        [
            jnp.full((1, c), mk == KEY_DEAD)
            for mk in ms
        ],
        axis=1,
    )
    t = (cn - no) / nd
    u = uo + t * ud - cu
    v = vo + t * vd - cv
    valid = (
        (jnp.abs(nd) >= EPS_DET)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min) & (t < t_best) & (t > floor)
        & ~dead
    )
    tm_ = jnp.where(valid, t, F32_MAX)
    bt = jnp.min(tm_, axis=1, keepdims=True)  # [B, 1]
    ck = c * kb
    lane_iota = lax.broadcasted_iota(jnp.int32, (1, ck), 1)
    lane_best = jnp.min(
        jnp.where(tm_ == bt, lane_iota, ck), axis=1, keepdims=True
    )
    kidx = lane_best // c  # [B, 1]
    cid_w = jnp.full_like(kidx, -1)
    for k in range(kb):
        cid_w = jnp.where(kidx == k, ms[k] & ID_MASK, cid_w)
    upd = bt < lax.bitcast_convert_type(t_bits, jnp.float32)
    t_bits = jnp.where(
        upd, lax.bitcast_convert_type(bt, jnp.int32), t_bits
    )
    cid_best = jnp.where(upd, cid_w, cid_best)
    return t_bits, cid_best


def _fused_kernel(c: int, t_min: float, nee: bool, n_clus: int,
                  pack_vmem: bool, mxu_test: bool, kbatch: int,
                  ablate: int, instanced: bool, groups: int,
                  tfuse: bool, amask: bool, rekey: int, minleft: int,
                  rekey_q16: bool, *refs):
    if instanced:
        (blive_ref, csrc_ref, cinst_ref, cfid_ref, itf_ref,
         rays_ref, *rest) = refs
        inst = (csrc_ref, cinst_ref, cfid_ref, itf_ref)
    else:
        (blive_ref, rays_ref, *rest) = refs
        inst = None
    # rays_t (the SoA-transposed ray view) is only an input in mxu_test
    # mode; its (8, block) BlockSpec also needs block >= 128 lanes.
    if mxu_test:
        rays_t_ref, boxes_ref, pack_ref, out_ref, *scratch = rest
    else:
        boxes_ref, pack_ref, out_ref, *scratch = rest
        rays_t_ref = None
    block = rays_ref.shape[0]

    rays = rays_ref[...]
    t0 = rays[:, 6:7]

    # Blocks whose rays enter no cluster (the presort packs them together)
    # skip everything including the box sweep — with cluster-sorted rays
    # the per-block fixed cost dominates, and most blocks are empty.
    neg1b = lax.bitcast_convert_type(
        jnp.full((block, 1), -1, jnp.int32), jnp.float32
    )
    out_ref[0] = jnp.concatenate(
        [t0, jnp.zeros((block, 3), jnp.float32), neg1b,
         jnp.zeros((block, 3), jnp.float32)],
        axis=1,
    )

    # NOTE (round 3): a slot-driven light-block path (per-ray presort slot
    # keys riding in a wide ray matrix, skipping the in-kernel sweep) was
    # built and measured a NET LOSS (~-5% on both the atrium wave and the
    # sphere field): the [B, N_SLOTS] per-iteration extraction costs about
    # the same as the [1, cpad] key-row extraction, so it only saved the
    # ~7.5 us/block sweep while adding load width and a double-body
    # kernel. The sweep path below is the measured winner.
    @pl.when(blive_ref[pl.program_id(0)] != 0)
    def _live_body():
        _fused_body(
            c, t_min, nee, n_clus, pack_vmem, mxu_test, kbatch,
            rays_ref, rays_t_ref, boxes_ref, pack_ref, out_ref,
            *scratch, ablate=ablate, inst=inst, groups=groups,
            tfuse=tfuse, amask=amask, rekey=rekey, minleft=minleft,
            rekey_q16=rekey_q16,
        )


def _fused_body(c: int, t_min: float, nee: bool, n_clus: int,
                pack_vmem: bool, mxu_test: bool, kbatch: int,
                rays_ref, rays_t_ref, boxes_ref, pack_ref, out_ref,
                *scratch, ablate: int = 0, inst=None, groups: int = 1,
                tfuse: bool = False, amask: bool = False,
                rekey: int = 0, minleft: int = 8,
                rekey_q16: bool = False):
    block = rays_ref.shape[0]
    cpad = boxes_ref.shape[1]

    rays = rays_ref[...]
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    t0 = rays[:, 6:7]
    floor = rays[:, 7:8]
    if mxu_test:
        assert inst is None, "instanced + mxu_test unsupported"
        rt = rays_t_ref[...]
        po, pd = rt[0:3, :], rt[3:6, :]
    else:
        po, pd = o, d

    if inst is not None:
        csrc_ref, cinst_ref, cfid_ref, itf_ref = inst

        def _cluster_rays(cid):
            """(o', d') in the candidate cluster's instance space: the
            UNNORMALIZED inverse transform keeps the hit parameter equal
            to the world parameter (t/floor/termination bounds compose).
            12 SMEM scalar reads + broadcast FMAs per candidate."""
            base = cinst_ref[cid] * 12
            r = [itf_ref[base + k] for k in range(12)]
            ox = o[:, 0:1] * r[0] + o[:, 1:2] * r[1] + o[:, 2:3] * r[2] + r[3]
            oy = o[:, 0:1] * r[4] + o[:, 1:2] * r[5] + o[:, 2:3] * r[6] + r[7]
            oz = (
                o[:, 0:1] * r[8] + o[:, 1:2] * r[9] + o[:, 2:3] * r[10]
                + r[11]
            )
            dx = d[:, 0:1] * r[0] + d[:, 1:2] * r[1] + d[:, 2:3] * r[2]
            dy = d[:, 0:1] * r[4] + d[:, 1:2] * r[5] + d[:, 2:3] * r[6]
            dz = d[:, 0:1] * r[8] + d[:, 1:2] * r[9] + d[:, 2:3] * r[10]
            return (
                jnp.concatenate([ox, oy, oz], axis=1),
                jnp.concatenate([dx, dy, dz], axis=1),
            )

    if rekey:
        emask_ref, *scratch = scratch

    # --- stage 1: sweep all cluster boxes ---
    ent, ext = _sweep_bounds(o, d, boxes_ref, cpad, use_dots=False)
    # Margins in the safe (over-inclusive) direction; entries are >= 0.
    e = jnp.maximum(ent - (jnp.abs(ent) * 1e-6 + 1e-7), t_min)
    xt = ext + (jnp.abs(ext) * 1e-6 + 1e-7)
    hit = (xt >= e) & (e < t0) & (xt > floor)  # [B, cpad]
    if rekey:
        # Per-(ray, cluster) masked entries cached for the re-key drop
        # test: a re-key is then ONE compare + any-reduce against the
        # rays' current t instead of a full box re-sweep.
        if rekey_q16:
            # Quantized u16 store (round 5): the eager store costs live
            # coherent blocks ~2-3% and the re-key compare runs at
            # [block, cpad] width — both halve in u16. Monotone map for
            # positive floats: the TOP 16 bits of the f32 pattern
            # (truncation = conservative round DOWN for the entry side).
            # The drop test stays over-inclusive — see rk_body — so
            # results are bit-identical to the f32 emask.
            eb = lax.bitcast_convert_type(e, jnp.int32) >> 16
            emask_ref[...] = jnp.where(hit, eb, 0xFFFF).astype(jnp.uint16)
        else:
            emask_ref[...] = jnp.where(hit, e, F32_MAX)
    cid_iota = lax.broadcasted_iota(jnp.int32, (1, cpad), 1)

    def entry_keys(rows):
        """Packed (entry | cid) per cluster over a row slice: the min entry
        across the slice's rays, KEY_DEAD where no ray enters. The pad-id
        mask guards the cluster fetch: an out-of-range read is undefined
        behavior on hardware (the builder's far-box pad sentinel already
        culls these, this is the hard guarantee)."""
        emin = jnp.min(
            jnp.where(hit[rows], e[rows], F32_MAX), axis=0, keepdims=True
        )
        bits = lax.bitcast_convert_type(emin, jnp.int32)
        return jnp.where(
            (emin < F32_MAX) & (cid_iota < n_clus),
            (bits & ~ID_MASK) | cid_iota,
            KEY_DEAD,
        )

    if groups > 1:
        # Sub-grouped traversal: independent t-loops + winners over row
        # slices of the block. A cluster test then costs [block/groups, 3C]
        # instead of [block, 3C], and each group terminates on ITS OWN
        # cluster union — the big win on "heavy" blocks (incoherent rays
        # entering many boxes), where a block-wide test serves only the
        # ~10 rays that care. Exactness is preserved: every ray still sees
        # every cluster whose entry can precede its best hit, in
        # nearest-entry order within its group.
        assert pack_vmem and not mxu_test and ablate == 0
        assert block % groups == 0
        gb = block // groups
        for g in range(groups):
            rows = slice(g * gb, (g + 1) * gb)
            best_g, n_it, n_win = _trace_rows(
                c, t_min, nee, n_clus, kbatch, pack_ref, inst,
                o[rows], d[rows], t0[rows], floor[rows],
                entry_keys(rows), gb, amask=amask,
            )
            lanecol = lax.broadcasted_iota(jnp.int32, (gb, 1), 0)
            diag5 = jnp.where(lanecol == 0, n_it, 0).astype(jnp.float32)
            diag6 = jnp.where(lanecol == 0, n_win, 0).astype(jnp.float32)
            out_ref[0, rows] = jnp.concatenate(
                [best_g[:, 0:5], diag5, diag6, best_g[:, 7:8]], axis=1
            )
        return

    key_row = entry_keys(slice(None))

    if not pack_vmem:
        buf_ref, sem_ref = scratch

        def dma(slot, cid):
            src = csrc_ref[cid] if inst is not None else cid
            return pltpu.make_async_copy(
                pack_ref.at[src], buf_ref.at[slot], sem_ref.at[slot]
            )

    # --- stage 2: nearest-first t-loop (exact t + winning cid per ray) ---
    t_bits0 = lax.bitcast_convert_type(t0, jnp.int32)  # [B,1]
    cid0 = jnp.full((block, 1), -1, jnp.int32)
    m0 = jnp.min(key_row)

    if ablate == 1:  # sweep only (tools/diag_ablate.py)
        out_ref[0] = jnp.broadcast_to(
            jnp.float32(m0).reshape(1, 1), (block, 8)
        )
        return

    if not pack_vmem:

        @pl.when(m0 != KEY_DEAD)
        def _():
            dma(0, m0 & ID_MASK).start()

    def improvable(m, t_bits, cid_best):
        # Int-domain compare (Mosaic has no scalar bitcast): positive f32
        # bit patterns are order-isomorphic, entries are >= t_min > 0, and
        # dead padded lanes carry t = -1.0 whose bits are negative.
        live = t_bits > (m & ~ID_MASK)
        if nee:
            live = live & (cid_best < 0)
        return jnp.any(live)

    def cond(st):
        i, m, key_row, t_bits, cid_best = st
        return (m != KEY_DEAD) & (i < MAX_ITERS) & improvable(
            m, t_bits, cid_best
        )

    def body(st):
        i, m, key_row, t_bits, cid_best = st
        if not pack_vmem:
            # DMA mode: one cluster per iteration, double-buffered.
            cid = m & ID_MASK
            key2 = jnp.where(key_row == m, KEY_DEAD, key_row)
            m2 = jnp.min(key2)

            @pl.when(m2 != KEY_DEAD)
            def _():
                dma((i + 1) % 2, m2 & ID_MASK).start()

            dma(i % 2, cid).wait()
            tri = buf_ref[i % 2]
            t_best = lax.bitcast_convert_type(t_bits, jnp.float32)
            if inst is not None:
                uo, ud = _cluster_rays(cid)
            else:
                uo, ud = po, pd
            ro, rd = _proj(uo, ud, tri, mxu_test)
            bt = _t_only(ro, rd, t_best, tri, c, t_min, floor, amask)
            upd = bt < t_best
            t_bits = jnp.where(
                upd, lax.bitcast_convert_type(bt, jnp.int32), t_bits
            )
            cid_best = jnp.where(upd, cid, cid_best)
            return (i + 1, m2, key2, t_bits, cid_best)

        # VMEM mode: extract a batch of K nearest keys at once (amortizes
        # the vector->scalar sync of the min-extraction), test the K
        # clusters against the PRE-BATCH t bound so the [B,C] work per
        # unit is independent (pipelines), then fold the K results.
        ms = []
        cur, row = m, key_row
        for _ in range(kbatch):
            ms.append(cur)
            row = jnp.where(row == cur, KEY_DEAD, row)
            cur = jnp.min(row)
        t_best = lax.bitcast_convert_type(t_bits, jnp.float32)
        if tfuse:
            assert inst is None
            t_bits, cid_best = _t_only_fused(
                po, pd, t_best, floor, ms, pack_ref, c, t_min,
                n_clus, mxu_test, cid_best, t_bits,
            )
            return (i + 1, cur, row, t_bits, cid_best)
        for mk in ms:
            # Dead tail slots read cluster 0 harmlessly; their t folds
            # to F32_MAX. (mk & ID_MASK of KEY_DEAD is ID_MASK -> clamp.)
            cid = jnp.minimum(mk & ID_MASK, n_clus - 1)
            if inst is not None:
                tri = pack_ref[csrc_ref[cid]]
                uo, ud = _cluster_rays(cid)
            else:
                tri = pack_ref[cid]
                uo, ud = po, pd
            ro, rd = _proj(uo, ud, tri, mxu_test)
            bt = _t_only(ro, rd, t_best, tri, c, t_min, floor, amask)
            bt = jnp.where(mk != KEY_DEAD, bt, F32_MAX)
            t_cur = lax.bitcast_convert_type(t_bits, jnp.float32)
            upd = bt < t_cur
            t_bits = jnp.where(
                upd, lax.bitcast_convert_type(bt, jnp.int32), t_bits
            )
            cid_best = jnp.where(upd, mk & ID_MASK, cid_best)
        return (i + 1, cur, row, t_bits, cid_best)

    if rekey:
        # --- per-ray re-keyed t-loop (round 4) ---
        # The plain loop's termination is BLOCK-global: cluster m stays
        # alive while ANY ray's current t exceeds m's block-min entry,
        # even rays that never enter m's box — so one miss ray (t pinned
        # at t_max) forces the block to test its whole entered union
        # (~75 distinct clusters on incoherent heavy blocks). The
        # refinement: every `rekey` inner iterations, re-sweep the boxes
        # and DROP queue entries that no ray both enters and can still
        # improve (e_{r,m} < t_r current). Exact: a dropped cluster's
        # every hit for ray r has t >= e_{r,m} >= t_r (conservative
        # entry margin), so it cannot beat any current best. Keys stay
        # the ORIGINAL packing (entries are static), so "already
        # processed" is exactly "key < next-unprocessed key" and a
        # re-key can never resurrect a tested cluster. Measured
        # (tools/diag_rekey.py, 132k-tri field): heavy-block cluster
        # visits 83.9k -> 27-30k incoherent, 8.4k -> 6.8-7.7k coherent,
        # at ~2.6 re-sweeps per heavy block.
        def inner_cond(st):
            j, m, row, t_bits, cid_best = st
            return (j < rekey) & (m != KEY_DEAD) & improvable(
                m, t_bits, cid_best
            )

        def outer_body(st):
            i, m, row, t_bits, cid_best = st
            j, m2, row2, t_bits, cid_best = lax.while_loop(
                inner_cond, body, (jnp.int32(0), m, row, t_bits, cid_best)
            )

            # Re-sweep ONLY when the queue continues and is still long
            # (>= 2 kbatch groups left): a short tail is cheaper to just
            # finish, and the final outer iteration must not pay a dead
            # sweep. The 0/1-trip while is the Mosaic-friendly "skip this
            # compute" construct (a where would evaluate the sweep
            # unconditionally).
            def rk_body(st2):
                _, _ = st2
                t_cur = lax.bitcast_convert_type(t_bits, jnp.float32)
                if nee:
                    # NEE lanes with any hit are done: remove their vote
                    # (entries are >= t_min > 0, so 0 excludes the ray).
                    t_cur2 = jnp.where(cid_best >= 0, 0.0, t_cur)
                else:
                    t_cur2 = t_cur
                if rekey_q16:
                    # u16 compare against the quantized store: the t side
                    # rounds UP one quantization step (top-16-bits + 1),
                    # so e < t always implies q_dn(e) < q_up(t) — the
                    # drop test stays over-inclusive (keeping an
                    # unimprovable cluster is slow-but-exact; dropping an
                    # improvable one would be wrong). Dead lanes carry
                    # t = -1: clamp to 0 so the monotone positive-float
                    # bit map applies (q_up(0) = 1, below every entry).
                    tb = lax.bitcast_convert_type(
                        jnp.maximum(t_cur2, 0.0), jnp.int32
                    )
                    tb16 = ((tb >> 16) + 1).astype(jnp.uint16)
                    can = jnp.any(
                        emask_ref[...] < tb16, axis=0, keepdims=True
                    )  # [1, cpad]
                else:
                    can = jnp.any(
                        emask_ref[...] < t_cur2, axis=0, keepdims=True
                    )  # [1, cpad]
                return (jnp.asarray(False), jnp.where(
                    can & (key_row >= m2), key_row, KEY_DEAD
                ))

            n_left = jnp.sum((row2 != KEY_DEAD).astype(jnp.int32))
            do_rk = (m2 != KEY_DEAD) & (n_left >= minleft)
            _, newrow = lax.while_loop(
                lambda s: s[0], rk_body, (do_rk, row2)
            )
            return (i + j, jnp.min(newrow), newrow, t_bits, cid_best)

        n_it, _, _, t_bits_f, cid_best = lax.while_loop(
            cond, outer_body, (jnp.int32(0), m0, key_row, t_bits0, cid0)
        )
    else:
        n_it, m_f, _, t_bits_f, cid_best = lax.while_loop(
            cond, body, (jnp.int32(0), m0, key_row, t_bits0, cid0)
        )
        if not pack_vmem:
            # Drain the look-ahead copy: the t-loop can exit EARLY
            # (improvable false / MAX_ITERS) right after `body` started
            # the NEXT candidate's DMA. Leaving it in flight corrupts the
            # semaphore for the winners loop / the next grid step —
            # observed as data-dependent FAILED_PRECONDITION / INTERNAL
            # TPU errors on Bistro-scale (>64 MB pack) scenes; the
            # sphere-field tests never tripped it because with t_max huge
            # their blocks always drain the queue (exit via KEY_DEAD,
            # which starts nothing). Slot (n_it % 2) is where iteration
            # n_it-1 (or the pre-loop start when n_it == 0) put it.
            @pl.when(m_f != KEY_DEAD)
            def _():
                dma(n_it % 2, m_f & ID_MASK).wait()

    if ablate == 2:  # sweep + t-loop, no winners epilogue
        out_ref[0] = jnp.concatenate(
            [
                lax.bitcast_convert_type(t_bits_f, jnp.float32),
                cid_best.astype(jnp.float32),
                jnp.broadcast_to(
                    n_it.astype(jnp.float32).reshape(1, 1), (block, 1)
                ),
                jnp.zeros((block, 5), jnp.float32),
            ],
            axis=1,
        )
        return
    # Winner extraction straight from the per-ray cid_best vector ([B,1]
    # sublane space) — building a [B, cpad] membership row just to extract
    # from it again costs more than the whole winners loop.
    wvals0 = jnp.where(cid_best >= 0, cid_best, KEY_DEAD)

    neg1f = lax.bitcast_convert_type(
        jnp.full((block, 1), -1, jnp.int32), jnp.float32
    )
    best0 = jnp.concatenate(
        [t0, jnp.zeros((block, 3), jnp.float32), neg1f,
         jnp.zeros((block, 3), jnp.float32)],
        axis=1,
    )
    w0 = jnp.min(wvals0)

    if not pack_vmem:

        @pl.when(w0 != KEY_DEAD)
        def _():
            dma(0, w0).start()

    def wcond(st):
        j, w, wvals, best = st
        return w != KEY_DEAD

    def wbody(st):
        j, w, wvals, best = st
        wkey2 = jnp.where(wvals == w, KEY_DEAD, wvals)
        w2 = jnp.min(wkey2)

        if pack_vmem:
            tri = pack_ref[csrc_ref[w]] if inst is not None else pack_ref[w]
        else:

            @pl.when(w2 != KEY_DEAD)
            def _():
                dma((j + 1) % 2, w2).start()

            dma(j % 2, w).wait()
            tri = buf_ref[j % 2]
        t_best = best[:, 0:1]
        if mxu_test:
            bt, bu, bv, bb, col, anyv = _pair_test_mxu(
                po, pd, t_best, tri, c, t_min, floor=floor
            )
        elif inst is not None:
            wo, wd = _cluster_rays(w)
            bt, bu, bv, bb, col, anyv = _pair_test(
                wo, wd, t_best, tri, c, t_min, floor=floor, amask=amask
            )
        else:
            bt, bu, bv, bb, col, anyv = _pair_test(
                o, d, t_best, tri, c, t_min, floor=floor, amask=amask
            )
        if inst is not None:
            # Global first-triangle id per INSTANCE-cluster from SMEM (the
            # pack row 4 value is the prototype-local id).
            gid = lax.bitcast_convert_type(
                cfid_ref[w] + col[:, None], jnp.float32
            )
        else:
            # First-triangle id rides in pack row 4 lane 0 (bitcast i32),
            # so no dynamic scalar-memory read is needed.
            fid = lax.bitcast_convert_type(tri[4:5, 0:1], jnp.int32)
            gid = lax.bitcast_convert_type(fid + col[:, None], jnp.float32)
        new = jnp.concatenate(
            [
                bt[:, None],
                bu[:, None],
                bv[:, None],
                bb.astype(jnp.float32)[:, None],
                gid,
                jnp.zeros((block, 3), jnp.float32),
            ],
            axis=1,
        )
        best = jnp.where(anyv[:, None], new, best)
        return (j + 1, w2, wkey2, best)

    n_win, _, _, best = lax.while_loop(
        wcond, wbody, (jnp.int32(0), w0, wvals0, best0)
    )

    lanecol = lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    diag5 = jnp.where(lanecol == 0, n_it, 0).astype(jnp.float32)
    diag6 = jnp.where(lanecol == 0, n_win, 0).astype(jnp.float32)
    out_ref[0] = jnp.concatenate(
        [best[:, 0:5], diag5, diag6, best[:, 7:8]], axis=1
    )


def _make_cluster_rays(inst, o, d):
    """Instance-space ray transform closure (or None): the UNNORMALIZED
    inverse transform keeps the hit parameter equal to the world parameter
    (t/floor/termination bounds compose). 12 SMEM reads per candidate."""
    if inst is None:
        return None
    csrc_ref, cinst_ref, cfid_ref, itf_ref = inst

    def _cluster_rays(cid):
        base = cinst_ref[cid] * 12
        r = [itf_ref[base + k] for k in range(12)]
        ox = o[:, 0:1] * r[0] + o[:, 1:2] * r[1] + o[:, 2:3] * r[2] + r[3]
        oy = o[:, 0:1] * r[4] + o[:, 1:2] * r[5] + o[:, 2:3] * r[6] + r[7]
        oz = (
            o[:, 0:1] * r[8] + o[:, 1:2] * r[9] + o[:, 2:3] * r[10]
            + r[11]
        )
        dx = d[:, 0:1] * r[0] + d[:, 1:2] * r[1] + d[:, 2:3] * r[2]
        dy = d[:, 0:1] * r[4] + d[:, 1:2] * r[5] + d[:, 2:3] * r[6]
        dz = d[:, 0:1] * r[8] + d[:, 1:2] * r[9] + d[:, 2:3] * r[10]
        return (
            jnp.concatenate([ox, oy, oz], axis=1),
            jnp.concatenate([dx, dy, dz], axis=1),
        )

    return _cluster_rays


def _winners_rows(c: int, t_min: float, pack_ref, inst, cluster_rays,
                  o, d, t0, floor, cid_best, gb: int,
                  amask: bool = False):
    """Winners epilogue over a row slice (VMEM-pack mode): re-test each
    DISTINCT winning cluster id with the full (u, v, backface, triangle)
    extraction and keep the exact closest hit. Returns (best [gb, 8],
    n_win)."""
    if inst is not None:
        csrc_ref, cinst_ref, cfid_ref, itf_ref = inst
    wvals0 = jnp.where(cid_best >= 0, cid_best, KEY_DEAD)
    neg1f = lax.bitcast_convert_type(
        jnp.full((gb, 1), -1, jnp.int32), jnp.float32
    )
    best0 = jnp.concatenate(
        [t0, jnp.zeros((gb, 3), jnp.float32), neg1f,
         jnp.zeros((gb, 3), jnp.float32)],
        axis=1,
    )
    w0 = jnp.min(wvals0)

    def wcond(st):
        j, w, wvals, best = st
        return w != KEY_DEAD

    def wbody(st):
        j, w, wvals, best = st
        wkey2 = jnp.where(wvals == w, KEY_DEAD, wvals)
        w2 = jnp.min(wkey2)
        tri = pack_ref[csrc_ref[w]] if inst is not None else pack_ref[w]
        t_best = best[:, 0:1]
        if inst is not None:
            wo, wd = cluster_rays(w)
            bt, bu, bv, bb, col, anyv = _pair_test(
                wo, wd, t_best, tri, c, t_min, floor=floor, amask=amask
            )
            gid = lax.bitcast_convert_type(
                cfid_ref[w] + col[:, None], jnp.float32
            )
        else:
            bt, bu, bv, bb, col, anyv = _pair_test(
                o, d, t_best, tri, c, t_min, floor=floor, amask=amask
            )
            fid = lax.bitcast_convert_type(tri[4:5, 0:1], jnp.int32)
            gid = lax.bitcast_convert_type(fid + col[:, None], jnp.float32)
        new = jnp.concatenate(
            [
                bt[:, None],
                bu[:, None],
                bv[:, None],
                bb.astype(jnp.float32)[:, None],
                gid,
                jnp.zeros((gb, 3), jnp.float32),
            ],
            axis=1,
        )
        best = jnp.where(anyv[:, None], new, best)
        return (j + 1, w2, wkey2, best)

    n_win, _, _, best = lax.while_loop(
        wcond, wbody, (jnp.int32(0), w0, wvals0, best0)
    )
    return best, n_win


def _trace_rows(c: int, t_min: float, nee: bool, n_clus: int, kbatch: int,
                pack_ref, inst, o, d, t0, floor, key_row, gb: int,
                amask: bool = False):
    """Nearest-first t-loop + winners epilogue over a row slice (VMEM-pack
    mode). Same algorithm as the monolithic body below; factored so the
    grouped path can run it per sub-group. Returns (best [gb, 8], n_it,
    n_win)."""
    _cluster_rays = _make_cluster_rays(inst, o, d)
    if inst is not None:
        csrc_ref, cinst_ref, cfid_ref, itf_ref = inst

    t_bits0 = lax.bitcast_convert_type(t0, jnp.int32)
    cid0 = jnp.full((gb, 1), -1, jnp.int32)
    m0 = jnp.min(key_row)

    def improvable(m, t_bits, cid_best):
        live = t_bits > (m & ~ID_MASK)
        if nee:
            live = live & (cid_best < 0)
        return jnp.any(live)

    def cond(st):
        i, m, row, t_bits, cid_best = st
        return (m != KEY_DEAD) & (i < MAX_ITERS) & improvable(
            m, t_bits, cid_best
        )

    def body(st):
        i, m, row, t_bits, cid_best = st
        ms = []
        cur = m
        for _ in range(kbatch):
            ms.append(cur)
            row = jnp.where(row == cur, KEY_DEAD, row)
            cur = jnp.min(row)
        t_best = lax.bitcast_convert_type(t_bits, jnp.float32)
        for mk in ms:
            cid = jnp.minimum(mk & ID_MASK, n_clus - 1)
            if inst is not None:
                tri = pack_ref[csrc_ref[cid]]
                uo, ud = _cluster_rays(cid)
            else:
                tri = pack_ref[cid]
                uo, ud = o, d
            ro, rd = _proj(uo, ud, tri, False)
            bt = _t_only(ro, rd, t_best, tri, c, t_min, floor, amask)
            bt = jnp.where(mk != KEY_DEAD, bt, F32_MAX)
            t_cur = lax.bitcast_convert_type(t_bits, jnp.float32)
            upd = bt < t_cur
            t_bits = jnp.where(
                upd, lax.bitcast_convert_type(bt, jnp.int32), t_bits
            )
            cid_best = jnp.where(upd, mk & ID_MASK, cid_best)
        return (i + 1, cur, row, t_bits, cid_best)

    n_it, _, _, t_bits_f, cid_best = lax.while_loop(
        cond, body, (jnp.int32(0), m0, key_row, t_bits0, cid0)
    )
    best, n_win = _winners_rows(
        c, t_min, pack_ref, inst, _cluster_rays, o, d, t0, floor,
        cid_best, gb, amask=amask,
    )
    return best, n_it, n_win


N_SLOTS = 4  # nearest-entered clusters extracted for the sort key


def _sweep_bounds(o, d, boxes_ref, cpad, use_dots: bool):
    """Conservative (entry, exit) of every cluster box per ray [B, cpad].

    `use_dots`: six [B,2]x[2,cpad] MXU contractions (x = lo*ia - oia is
    linear in (ia, oia)); otherwise pure-VPU broadcast FMAs — tiny-K MXU
    passes are latency-bound (~74 invocations per block at cpad ~1568),
    and the VPU form measures faster."""
    safe = jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    ia = 1.0 / safe          # [B, 3]
    oia = o * ia             # [B, 3]
    neg1 = jnp.full((1, cpad), -1.0, jnp.float32)
    ent = None
    ext = None
    for a in range(3):
        if use_dots:
            lhs = jnp.concatenate(
                [ia[:, a : a + 1], oia[:, a : a + 1]], axis=1
            )
            rlo = jnp.concatenate([boxes_ref[a : a + 1, :], neg1], axis=0)
            rhi = jnp.concatenate([boxes_ref[a + 3 : a + 4, :], neg1], axis=0)
            dot = lambda r: lax.dot_general(
                lhs, r, (((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            x0 = dot(rlo)
            x1 = dot(rhi)
        else:
            iaa = ia[:, a : a + 1]
            oa = oia[:, a : a + 1]
            x0 = boxes_ref[a : a + 1, :] * iaa - oa
            x1 = boxes_ref[a + 3 : a + 4, :] * iaa - oa
        a0 = jnp.minimum(x0, x1)
        a1 = jnp.maximum(x0, x1)
        ent = a0 if ent is None else jnp.maximum(ent, a0)
        ext = a1 if ext is None else jnp.minimum(ext, a1)
    return ent, ext


def _presort_kernel(t_min: float, n_clus: int, rays_ref, boxes_ref, out_ref):
    """Per-ray presort: the N_SLOTS nearest-entered clusters as packed
    (entry | cid) keys, the entered count, and the block sort key. Same
    conservative sweep as _fused_kernel stage 1.

    Blocks whose rays are ALL dead (t_max <= 0: retired wavefront paths,
    unneeded shadow lanes) skip the sweep entirely — unlike the fused
    kernel this runs BEFORE the coherence sort, but wavefront lanes are
    pixel-ordered so paths retire in spatially coherent runs, and at late
    bounces most pre-sort blocks are fully dead (round-3 profile: presort
    cost was constant ~10 ms/invocation regardless of live count)."""
    block = rays_ref.shape[0]
    cpad = boxes_ref.shape[1]
    rays = rays_ref[...]
    t0_all = rays[:, 6:7]
    out_ref[...] = jnp.concatenate(
        [
            jnp.full((block, 1), SKEY_NOTHING, jnp.int32),
            jnp.full((block, N_SLOTS), KEY_DEAD, jnp.int32),
            jnp.zeros((block, 1), jnp.int32),
            jnp.full((block, 1), SKEY_NOTHING, jnp.int32),
            jnp.zeros((block, 8 - 3 - N_SLOTS), jnp.int32),
        ],
        axis=1,
    )

    @pl.when(jnp.any(t0_all > 0.0))
    def _live():
        _presort_body(t_min, n_clus, rays, boxes_ref, out_ref, block, cpad)


def _presort_body(t_min, n_clus, rays, boxes_ref, out_ref, block, cpad):
    o = rays[:, 0:3]
    d = rays[:, 3:6]
    t0 = rays[:, 6:7]
    floor = rays[:, 7:8]

    ent, ext = _sweep_bounds(o, d, boxes_ref, cpad, use_dots=False)
    e = jnp.maximum(ent - (jnp.abs(ent) * 1e-6 + 1e-7), t_min)
    xt = ext + (jnp.abs(ext) * 1e-6 + 1e-7)
    cid_iota = lax.broadcasted_iota(jnp.int32, (block, cpad), 1)
    hit = (
        (xt >= e) & (e < t0) & (xt > floor) & (cid_iota < n_clus)
    )  # [B, cpad]

    bits = lax.bitcast_convert_type(e, jnp.int32)  # positive (e >= t_min)
    key_rc = jnp.where(hit, (bits & ~ID_MASK) | cid_iota, KEY_DEAD)
    slots = []
    for _ in range(N_SLOTS):
        k = jnp.min(key_rc, axis=1, keepdims=True)  # [B, 1]
        slots.append(k)
        key_rc = jnp.where(cid_iota == (k & ID_MASK), KEY_DEAD, key_rc)
    count = jnp.sum(hit.astype(jnp.int32), axis=1, keepdims=True)

    nothing = slots[0] == KEY_DEAD
    heavy = count > N_SLOTS
    cid0 = slots[0] & ID_MASK
    cid1 = slots[1] & ID_MASK
    cid2 = slots[2] & ID_MASK
    cid3 = slots[3] & ID_MASK
    # Primary sort key: empty/dead rays last (nothing bit); rays with
    # candidate tails beyond N_SLOTS ("heavy") grouped separately so they
    # don't salt light blocks' unions; then the (nearest, 2nd) cluster
    # pair. Secondary key extends the grouping to the (3rd, 4th) visit
    # slots — round 3: flagship-scene bounce rays average ~3.7 entered
    # clusters, and grouping only the first two left block unions of
    # 30-50; sharing the 4-slot visit prefix shrinks the union toward 4.
    skey = jnp.where(
        nothing,
        SKEY_NOTHING,
        jnp.where(heavy, SKEY_HEAVY, 0) | (cid0 << ID_BITS) | (cid1 & ID_MASK),
    )
    skey2 = jnp.where(
        nothing, SKEY_NOTHING, (cid2 << ID_BITS) | (cid3 & ID_MASK)
    )
    out_ref[...] = jnp.concatenate(
        [skey] + slots + [count, skey2, jnp.zeros((block, 1), jnp.int32)],
        axis=1,
    )


@functools.partial(
    jax.jit, static_argnames=("t_min", "n_clus", "block", "interpret")
)
def presort_keys_pallas(rays, clus_box, n_clus: int, t_min: float,
                        block: int = 128, interpret: bool = False):
    """rays [N, 8] f32 (o3, d3, t_max, floor), N a multiple of `block`.
    Returns [N, 8] i32: col 0 = primary block sort key (nothing | heavy |
    cid0 | cid1), cols 1..N_SLOTS = packed (entry | cid) keys of the
    N_SLOTS nearest entered clusters (KEY_DEAD-padded), col 1 + N_SLOTS =
    entered count, col 6 = secondary sort key (cid2 | cid3).

    Grouping rays by the clusters they actually enter (instead of the
    octant+Morton proxy) is what gives ray blocks shared cluster sets —
    the measured block union was ~95 clusters under the coherence sort vs
    a per-ray mean of 1.3 entered (tools/diag_fused.py). The sort is pure
    scheduling (per-ray results are order-free). Rays entering more than
    N_SLOTS clusters carry long candidate tails; the heavy bit groups
    them into their own blocks so they don't salt light blocks' unions."""
    n = rays.shape[0]
    n_blocks = n // block
    assert n_blocks * block == n
    cpad = clus_box.shape[1]
    out = pl.pallas_call(
        functools.partial(_presort_kernel, t_min, n_clus),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, 8), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cpad), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 8), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8), jnp.int32),
        interpret=interpret,
    )(rays, clus_box)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "block", "c", "t_min", "nee", "pack_vmem", "mxu_test", "kbatch",
        "ablate", "n_clus", "interpret", "groups", "tfuse", "amask",
        "rekey", "minleft", "rekey_q16",
    ),
)
def fused_trace_pallas(rays, clus_box, clus_pack, block: int, c: int,
                       t_min: float, nee: bool = False,
                       pack_vmem: bool | None = None,
                       mxu_test: bool = False,
                       kbatch: int = 8,
                       blive=None,
                       ablate: int = 0,
                       groups: int = 1,
                       tfuse: bool = False,
                       amask: bool = False,
                       rekey: int = 0,
                       minleft: int = 8,
                       rekey_q16: bool = False,
                       clus_src=None,
                       clus_inst=None,
                       clus_fid=None,
                       inst_flat=None,
                       n_clus: int | None = None,
                       interpret: bool = False):
    """rays [Np, 8] f32 (o3, d3, t_cur, floor), Np a multiple of `block`;
    clus_box [8, cpad]; clus_pack [n_clus, 8, 3C] with the first-triangle
    id bitcast into row 4 lane 0 (scene/clusters.py woop_rows); blive
    [Np // block] i32: 0 = block provably enters nothing (skipped whole,
    including the box sweep), nonzero = live (full sweep + t-loop). Two
    candidate-list fast paths were tried and measured net-negative: a
    round-2 per-BLOCK candidate list (distinct-cluster count is the work)
    and a round-3 per-RAY slot path (see the note in _fused_kernel).
    Returns out [Np, 8] f32: cols t, u, v, back, tri(bitcast i32), it,
    win, pad; lanes with no hit keep t == t_cur, tri == -1."""
    n = rays.shape[0]
    n_blocks = n // block
    assert n_blocks * block == n
    w_cols = rays.shape[1]
    cpad = clus_box.shape[1]
    if pack_vmem is None:
        pack_vmem = clus_pack.size * 4 <= VMEM_PACK_BYTES
    if blive is None:
        blive = jnp.ones((n_blocks,), jnp.int32)
    instanced = clus_src is not None
    assert not (instanced and mxu_test)
    assert not (mxu_test and w_cols != 8)
    # Sub-grouped traversal needs the VMEM-resident pack (per-group DMA
    # would re-fetch clusters) and the plain test path.
    if not pack_vmem or mxu_test or ablate:
        groups = 1
    assert block % groups == 0
    # The wide-fused t-loop needs the VMEM pack (lane-concat of K cluster
    # reads) and block-invariant rays (no per-cluster instance transform).
    if not pack_vmem or instanced or ablate or groups > 1:
        tfuse = False
    # Per-ray re-keying lives in the VMEM/kbatch t-loop only (the DMA
    # path's double-buffered prefetch assumes the static key order, and
    # the grouped/tfuse/ablate variants keep their measured baselines).
    if not pack_vmem or mxu_test or ablate or groups > 1 or tfuse:
        rekey = 0
    # The alpha-mask cull reads pack row 5; the MXU diag path and ablation
    # modes bypass the full validity chain.
    assert not (amask and (mxu_test or tfuse))
    if ablate:
        amask = False

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5 if instanced else 1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, w_cols), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
        ] + ([
            pl.BlockSpec((8, block), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
        ] if mxu_test else []) + [
            pl.BlockSpec((8, cpad), lambda b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                clus_pack.shape, lambda b, *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            if pack_vmem
            else pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, block, 8), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=(
            [pltpu.VMEM(
                (block, cpad),
                jnp.uint16 if rekey_q16 else jnp.float32,
            )] if rekey else []
        )
        + (
            []
            if pack_vmem
            else [
                pltpu.VMEM((2,) + clus_pack.shape[1:], jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        ),
    )
    scalars = (blive.astype(jnp.int32),)
    if instanced:
        scalars = scalars + (
            clus_src.astype(jnp.int32), clus_inst.astype(jnp.int32),
            clus_fid.astype(jnp.int32), inst_flat.astype(jnp.float32),
        )
    out_call = pl.pallas_call(
        functools.partial(
            _fused_kernel, c, t_min, nee,
            clus_pack.shape[0] if n_clus is None else int(n_clus),
            pack_vmem, mxu_test, kbatch, ablate, instanced, groups, tfuse,
            amask, rekey, minleft, rekey_q16,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, block, 8), jnp.float32),
        # The VMEM-resident cluster pack alone can exceed the default 16 MB
        # scoped-vmem budget (a Sponza-class pack is ~17 MB); lift the
        # per-kernel cap to match VMEM_PACK_BYTES + working set.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_PACK_BYTES + (32 << 20),
        ),
        interpret=interpret,
    )
    args = (rays, rays.T) if mxu_test else (rays,)
    out = out_call(*scalars, *args, clus_box, clus_pack)
    return out.reshape(n, 8)
