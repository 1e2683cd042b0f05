"""Block-trace: coherence-sorted block traversal for big scenes.

The fast path for large-scene intersection on TPU. Rays are sorted by
(direction octant, origin Morton cell) and cut into blocks of B. The
default `fused=True` path runs the whole traversal in ONE Pallas kernel
per block — box sweep, nearest-first t-loop, winners re-test — see
kernels/pallas_fusedtrace.py for the staging rationale and measured costs.
`fused=False` keeps the original round-based pipeline (kernels/
pallas_blocktrace.py): per round a *select* kernel scores every cluster
AABB against each block and extracts the K lexicographically-nearest
candidates, and a *test* kernel closest-hit tests each (block, slot) pair;
blocks whose candidate set overflowed K re-run with a lexicographic window
until every ray's best hit provably precedes every untested cluster — the
same continuation-window argument as render/bintrace.py, lifted from
per-ray to per-block granularity.

Semantics match the reference's closest-hit / shadow-ray contract
(src/cpu/ray-integrator.cpp:84-229). Per-hit gates (stochastic alpha, NEE
transparent-surface attenuation, ray-integrator.cpp:205-219) cannot run
inside the kernels (they need texture fetches), so `intersect_blocktrace_
gated` iterates: find the closest ungated hit, evaluate the gates in XLA,
and re-cast rejected lanes with the hit distance as a floor. The stochastic
alpha stream is the same per-(lane, tri) hash as the stack paths
(render/intersect.py:102-104), so accept/reject decisions are identical and
order-free; results match intersect_bvh8 exactly.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from yart_tpu.kernels.pallas_blocktrace import (
    ID_MASK,
    ID_BITS,
    KEY_DEAD,
    select_clusters_pallas,
    test_clusters_pallas,
)
from yart_tpu.kernels.pallas_cluster import F32_MAX
from yart_tpu.ops.qmc import mix32, u32_to_unit_float

# numpy, NOT jnp — lazily imported inside jit traces; see bintrace._BIG.
_BIG = np.float32(3.0e38)
_WKEY0 = -(1 << 31)  # initial window: everything eligible

MAX_CLUSTERS = 1 << ID_BITS  # bigger scenes use render/bintrace.py

# Chip-ablation knobs (tools/ablate_shape.py sweeps them in subprocesses):
# env-overridable defaults, read once at import, so a (block, kbatch) sweep
# needs no code edits and production callers pick up tuned values.
TRACE_BLOCK = int(os.environ.get("YART_TRACE_BLOCK", "128"))
TRACE_KBATCH = int(os.environ.get("YART_TRACE_KBATCH", "4"))
TRACE_GROUPS = int(os.environ.get("YART_TRACE_GROUPS", "1"))
# Per-ray re-key period (kernels/pallas_fusedtrace.py `rekey`): every
# `rekey` t-loop iterations (kbatch clusters each), queue clusters no
# entering ray can still improve are dropped. Round-4 chip sweep
# (tools/diag_rekey_chip.py): incoherent 4.07 -> 5.37 Mrays/s (+32%, now
# past the 4-core reference host's 5.11), coherent 9.55 -> 9.20 (-4%),
# atrium flagship wave 2.12 -> 2.20 (+3.6%). minleft gates re-keying to
# queues with >= that many clusters left (protects light blocks).
TRACE_REKEY = int(os.environ.get("YART_TRACE_REKEY", "2"))
TRACE_MINLEFT = int(os.environ.get("YART_TRACE_MINLEFT", "8"))
# Quantized u16 emask for the re-key drop test (round 5): halves the
# eager per-block store and the re-key compare width; conservative
# one-step-up rounding on the t side keeps results bit-identical
# (kernels/pallas_fusedtrace.py). Default off until measured on-chip.
TRACE_REKEY_Q16 = int(os.environ.get("YART_TRACE_REKEY_Q16", "0"))
# Gated-loop tail compaction buffer = n // TRACE_CAPDIV (render/blocktrace
# intersect_blocktrace_gated). The flagship ivy cast ladder decays 524k ->
# 80k -> 28k: n/6 captures the survivors after ONE full-width cast where
# n/8 (80k > 65k) forced a second.
TRACE_CAPDIV = int(os.environ.get("YART_TRACE_CAPDIV", "6"))
# Presort kernel block multiplier — MEASURED A LOSS at >1 and kept as
# the reproducible record: the hypothesis was that the presort's ~7.9
# ms/invocation (11% of the atrium wave) was grid-step overhead (4096
# steps at 524k lanes / 128), so wider blocks would amortize it; but
# mult=4 measured 2.085 vs 2.202 Mrays/s on the atrium wave — the
# [512, cpad] sweep ops cost more than the steps saved (same row-axis
# plateau as the t-loop, BASELINE.md round 3). Outputs are per-ray and
# identical for any mult.
TRACE_PRESORT_MULT = int(os.environ.get("YART_TRACE_PRESORT_MULT", "1"))


def _presort_block(np_: int, block: int) -> int:
    for m in (TRACE_PRESORT_MULT, 2, 1):
        if np_ % (m * block) == 0:
            return m * block
    return block


def _n_clus(meta) -> int:
    """Valid traversal-cluster count: instance-clusters for instanced
    scenes (each (instance, proto-cluster) pair is one cluster)."""
    return (
        meta.n_inst_clusters if meta.n_instances else meta.n_clusters
    )


def _cluster_key(scene, meta, o, d, t_max_v, floor_v, t_min, block,
                 interpret):
    """Per-ray block sort key from the presort sweep kernel: rays grouped
    by (nearest-entered cluster, 2nd cluster), heavy rays (long candidate
    tails) in their own groups, empty/dead rays last. See
    kernels/pallas_fusedtrace.py presort_keys_pallas."""
    from yart_tpu.kernels.pallas_fusedtrace import presort_keys_pallas

    n = o.shape[0]
    pad = (-n) % block
    rays = jnp.concatenate(
        [o, d, t_max_v[:, None], floor_v[:, None]], axis=1
    )
    if pad:
        rays = jnp.concatenate(
            [rays, jnp.zeros((pad, 8), jnp.float32)], axis=0
        )
    out = presort_keys_pallas(
        rays, scene.clus_box, _n_clus(meta), t_min,
        block=_presort_block(rays.shape[0], block), interpret=interpret,
    )
    return out[:n, 0].astype(jnp.uint32)


def _pad_sorted(scene, o, d, t_max_v, floor_v, block, meta=None,
                t_min: float = 1e-3, interpret: bool = False):
    """Sort rays so blocks share cluster sets, and pad to a whole number of
    blocks. Returns (o_s, d_s, t_s, floor_s, inv, blive) where inv gathers
    sorted results back to original lane order; padded lanes have t = -1
    (instantly done). With `meta` the key comes from the cluster presort
    sweep — which also yields `blive`, a per-block any-ray-enters-anything
    flag (empty blocks sort last and the fused kernel skips them whole);
    otherwise the octant+Morton coherence proxy (blive = None). Returns
    (o_s, d_s, t_s, floor_s, inv, blive)."""
    from yart_tpu.render.intersect import _coherence_key

    n = o.shape[0]
    pad = (-n) % block
    blive = None
    if meta is not None:
        key = _cluster_key(
            scene, meta, o, d, t_max_v, floor_v, t_min, block, interpret
        )
    else:
        key = _coherence_key(scene, o, d)
        # Dead lanes (t_max <= 0: retired wavefront paths, unneeded shadow
        # rays) sort LAST so they fill whole blocks that exit instantly,
        # instead of salting live blocks at full per-block cost.
        key = key | (t_max_v <= 0.0).astype(jnp.uint32) << 25
    order = jnp.argsort(key)
    inv = jnp.argsort(order)
    if pad:
        order = jnp.concatenate([order, jnp.full((pad,), n - 1, order.dtype)])
        live = jnp.arange(n + pad) < n
    else:
        live = None
    if meta is not None:
        from yart_tpu.kernels.pallas_fusedtrace import SKEY_NOTHING

        # Live = anything below the nothing bit (incl. heavy-tagged rays).
        lane_live = key[order] < SKEY_NOTHING
        if live is not None:
            lane_live = lane_live & live
        blive = jnp.any(
            lane_live.reshape(-1, block), axis=1
        ).astype(jnp.int32)
    o_s = o[order]
    d_s = d[order]
    t_s = t_max_v[order]
    floor_s = floor_v[order]
    if live is not None:
        t_s = jnp.where(live, t_s, -1.0)
    return o_s, d_s, t_s, floor_s, inv, blive


def _fused_order(scene, meta, o, d, t_max_v, floor_v, block: int,
                 t_min: float, interpret: bool):
    """Presort + two-key sort ONCE: returns (order, inv, blive0) over the
    block-padded lane space. Per-ray traversal results are independent of
    the block composition (the pipeline's exactness invariant, asserted vs
    the brute oracle), so a re-cast loop can reuse one cast's permutation
    for every later cast — the sort is pure scheduling. blive0 ("this
    block enters >= 1 cluster") stays valid as floors rise and lanes
    retire: both only shrink each ray's entry set."""
    from yart_tpu.kernels.pallas_fusedtrace import (
        SKEY_NOTHING, presort_keys_pallas,
    )

    n = o.shape[0]
    pad = (-n) % block
    rays = jnp.concatenate(
        [o, d, t_max_v[:, None], floor_v[:, None]], axis=1
    )
    if pad:
        pad_rows = jnp.zeros((pad, 8), jnp.float32).at[:, 6].set(-1.0)
        rays = jnp.concatenate([rays, pad_rows], axis=0)
    np_ = n + pad
    pk = presort_keys_pallas(
        rays, scene.clus_box, _n_clus(meta), t_min,
        block=_presort_block(np_, block), interpret=interpret,
    )
    key = pk[:, 0].astype(jnp.uint32)
    key2 = pk[:, 6].astype(jnp.uint32)
    key_s, _, order = lax.sort(
        (key, key2, jnp.arange(np_, dtype=jnp.int32)), num_keys=2
    )
    inv = jnp.argsort(order)
    blive = jnp.any(
        (key_s < SKEY_NOTHING).reshape(-1, block), axis=1
    )
    return order, inv, blive


def intersect_blocktrace(
    scene,
    meta,
    o,
    d,
    t_max,
    t_min: float = 1e-3,
    nee: bool = False,
    floor=None,
    block: int = None,
    k: int = 24,
    max_rounds: int = 64,
    fused: bool = True,
    kbatch: int = None,
    groups: int = None,
    rekey: int = None,
    minleft: int = None,
    rekey_q16: bool = None,
    order_info=None,
    amask: bool = False,
    interpret: bool = False,
):
    """Closest-hit (or NEE early-out) through the block-trace pipeline.
    `floor` [N] optionally restricts hits to t > floor (used by the gated
    re-cast loop). Exact vs the stack traversals up to the triangle-test
    formulation (plane/barycentric vs Moller-Trumbore cross products).
    `fused=True` (default) runs the whole traversal in one kernel
    invocation (kernels/pallas_fusedtrace.py); False keeps the round-based
    select/test pipeline. `order_info` (fused only): a precomputed
    (order, inv, blive0) from `_fused_order` — skips the presort kernel
    and both million-key sorts (the gated re-cast loop reuses its first
    cast's permutation; results are bit-identical because per-ray results
    are order-free). Block liveness then combines blive0 with the
    per-cast t_max > 0 lane mask."""
    from yart_tpu.render.intersect import Hit

    assert fused or not meta.n_instances, (
        "the round-based select/test pipeline has no instanced support"
    )
    assert fused or not amask, (
        "the alpha-mask cull is only wired into the fused kernel; "
        "amask=True with fused=False would silently not cull"
    )
    assert order_info is None or fused
    if block is None:
        block = TRACE_BLOCK
    if kbatch is None:
        kbatch = TRACE_KBATCH
    if groups is None:
        groups = TRACE_GROUPS
    if rekey is None:
        rekey = TRACE_REKEY
    if minleft is None:
        minleft = TRACE_MINLEFT
    if rekey_q16 is None:
        rekey_q16 = bool(TRACE_REKEY_Q16)
    n = o.shape[0]
    c = meta.cluster_size
    t_max_v = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    floor_v = (
        jnp.broadcast_to(jnp.asarray(floor, jnp.float32), (n,))
        if floor is not None
        else jnp.zeros((n,), jnp.float32)
    )

    if fused:
        from yart_tpu.kernels.pallas_fusedtrace import (
            fused_trace_pallas, presort_keys_pallas,
        )

        # Build the [N, 8] ray matrix FIRST and reorder it with a single
        # wide row gather: element-wise [N] / [N,3] gathers through the
        # sort permutation lower to ~12 ms kCustom fusions each at 524k
        # lanes (profiled), while one [N, 8] row gather is ~bandwidth.
        pad = (-n) % block
        rays = jnp.concatenate(
            [o, d, t_max_v[:, None], floor_v[:, None]], axis=1
        )
        if pad:
            pad_rows = jnp.zeros((pad, 8), jnp.float32).at[:, 6].set(-1.0)
            rays = jnp.concatenate([rays, pad_rows], axis=0)
        np_ = n + pad
        if order_info is not None:
            order, inv, blive0 = order_info
            rays_s = rays[order]
            # Per-cast liveness from the ray matrix itself (retired lanes
            # carry t_max <= 0), intersected with the presort's "enters
            # anything" flag from the first cast.
            blive = (
                jnp.any((rays_s[:, 6] > 0.0).reshape(-1, block), axis=1)
                & blive0
            ).astype(jnp.int32)
        else:
            pk = presort_keys_pallas(
                rays, scene.clus_box, _n_clus(meta), t_min,
                block=_presort_block(np_, block), interpret=interpret,
            )
            key = pk[:, 0].astype(jnp.uint32)
            key2 = pk[:, 6].astype(jnp.uint32)
            # One two-key sort yields the permutation and the sorted
            # primary keys (for the per-block live flags) — no key gather
            # afterwards. The secondary key groups rays by their (3rd,
            # 4th) visit slots, which shrinks heavy-block cluster unions
            # on flagship scenes.
            key_s, _, order = lax.sort(
                (key, key2, jnp.arange(np_, dtype=jnp.int32)), num_keys=2
            )
            inv = jnp.argsort(order)
            rays_s = rays[order]
            from yart_tpu.kernels.pallas_fusedtrace import SKEY_NOTHING

            blive = jnp.any(
                (key_s < SKEY_NOTHING).reshape(-1, block), axis=1
            ).astype(jnp.int32)

        inst_kw = {}
        if meta.n_instances:
            inst_kw = dict(
                clus_src=scene.clus_src, clus_inst=scene.clus_inst,
                clus_fid=scene.clus_fid, inst_flat=scene.inst_flat,
                n_clus=_n_clus(meta),
            )
        res = fused_trace_pallas(
            rays_s, scene.clus_box, scene.clus_pack, block, c, t_min,
            nee=nee, kbatch=kbatch, groups=groups, rekey=rekey,
            minleft=minleft, rekey_q16=rekey_q16, blive=blive,
            amask=amask, interpret=interpret, **inst_kw,
        )[inv[:n]]
        tri = lax.bitcast_convert_type(res[:, 4], jnp.int32)
        return Hit(
            res[:, 0], tri, res[:, 1], res[:, 2], res[:, 3] > 0.5,
            jnp.ones((n, 3), jnp.float32), tri >= 0,
        )

    o_s, d_s, t_s, floor_s, inv, blive = _pad_sorted(
        scene, o, d, t_max_v, floor_v, block,
        meta=None, t_min=t_min, interpret=interpret,
    )

    np_ = o_s.shape[0]
    n_blocks = np_ // block
    neg1 = lax.bitcast_convert_type(
        jnp.full((np_, 1), -1, jnp.int32), jnp.float32
    )
    res0 = jnp.concatenate(
        [t_s[:, None], jnp.zeros((np_, 3), jnp.float32), neg1,
         jnp.zeros((np_, 3), jnp.float32)],
        axis=1,
    )
    slot = jnp.arange(k, dtype=jnp.int32)[None, :]

    def cond(st):
        res, w_key, act, rnd = st
        return jnp.any(act) & (rnd < max_rounds)

    def body(st):
        res, w_key, act, rnd = st
        rays = jnp.concatenate(
            [o_s, d_s, res[:, 0:1], floor_s[:, None]], axis=1
        )
        ids, bound_key, n_live = select_clusters_pallas(
            rays, scene.clus_box, w_key,
            act.astype(jnp.int32), block, k, t_min, interpret,
        )
        idx = jnp.clip(slot, 0, jnp.maximum(n_live - 1, 0)[:, None])
        dma = jnp.maximum(jnp.take_along_axis(ids, idx, axis=1), 0)
        live = (slot < n_live[:, None]) & act[:, None]
        first = scene.clus_first[dma.reshape(-1)]
        out = test_clusters_pallas(
            rays, scene.clus_pack, live.reshape(-1).astype(jnp.int32),
            first, dma.reshape(-1), c, k, t_min, interpret,
        )
        upd = lax.bitcast_convert_type(out[:, 4], jnp.int32) >= 0
        res = jnp.where(upd[:, None], out, res)

        no_drop = bound_key == KEY_DEAD
        bound_e = jnp.where(
            no_drop,
            _BIG,
            lax.bitcast_convert_type(bound_key & ~ID_MASK, jnp.float32),
        )
        t_blk = res[:, 0].reshape(n_blocks, block)
        ray_done = t_blk <= bound_e[:, None]
        if nee:
            hit_blk = (
                lax.bitcast_convert_type(res[:, 4], jnp.int32) >= 0
            ).reshape(n_blocks, block)
            ray_done = ray_done | hit_blk
        blk_done = no_drop | jnp.all(ray_done, axis=1)
        return (res, bound_key, act & ~blk_done, rnd + 1)

    res, _, _, _ = lax.while_loop(
        cond,
        body,
        (res0, jnp.full((n_blocks,), _WKEY0, jnp.int32),
         jnp.ones((n_blocks,), bool), jnp.asarray(0, jnp.int32)),
    )
    res = res[inv]
    tri = lax.bitcast_convert_type(res[:, 4], jnp.int32)
    return Hit(
        res[:, 0], tri, res[:, 1], res[:, 2], res[:, 3] > 0.5,
        jnp.ones((n, 3), jnp.float32), tri >= 0,
    )


def _hit_gates(scene, meta, h, d, nee, alpha_seed):
    """Evaluate per-hit gates for single hits (same math as the leaf tester,
    render/intersect.py:128-206, at L=1 with direct gathers).

    Returns (alpha_ok, transparent, factor[N,3])."""
    from yart_tpu.render.texture import sample_stack

    n = h.t.shape[0]
    if meta.n_instances:
        tri_c = jnp.clip(h.tri, 0, meta.n_tris - 1)
        aux = scene.tri_aux[tri_c]
        mats = aux[:, 3]
        srow = scene.shade_pack[aux[:, 0]]  # [N, 32] (object space)
    else:
        tri_c = jnp.clip(h.tri, 0, scene.tri_v.shape[0] - 1)
        mats = lax.bitcast_convert_type(
            scene.tri_pack[tri_c, 9], jnp.int32
        )
        srow = scene.shade_pack[tri_c]  # [N, 32]
    w_b = (1.0 - h.u - h.v)[:, None]
    uv = (
        w_b * srow[:, 9:11]
        + h.u[:, None] * srow[:, 11:13]
        + h.v[:, None] * srow[:, 13:15]
    )

    alpha_ok = jnp.ones((n,), bool)
    if meta.any_alpha:
        tb = scene.materials.tex_base[mats]
        has_a = scene.materials.has_alpha[mats] & (tb >= 0)
        a_tex = sample_stack(scene.tex_rgba, tb, uv)[:, 3]
        alpha = jnp.where(has_a, a_tex, 1.0)
        u_a = u32_to_unit_float(
            mix32(
                alpha_seed
                ^ h.tri.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
            )
        )
        # Strict compare: alpha == 0 then NEVER accepts (even the 2^-32
        # u_a == 0.0 draw), which is what makes the in-kernel alpha-mask
        # cull of certainly-transparent cells exact (scene/alphamask.py).
        alpha_ok = (alpha >= 1.0) | (u_a < alpha)

    transparent = jnp.zeros((n,), bool)
    factor = jnp.ones((n, 3), jnp.float32)
    if nee and meta.any_transparent:
        thin = scene.materials.thin[mats]
        trans = scene.materials.transmission[mats]
        transparent = thin & (trans > 0.0)
        n_interp = (
            w_b * srow[:, 0:3]
            + h.u[:, None] * srow[:, 3:6]
            + h.v[:, None] * srow[:, 6:9]
        )
        if meta.n_instances:
            # Object-space normals rotate by the instance normal matrix
            # before the world-direction cosine.
            m9 = scene.inst_rows[aux[:, 1]][:, 24:33]
            n_interp = jnp.stack(
                [
                    jnp.sum(m9[:, 0:3] * n_interp, axis=-1),
                    jnp.sum(m9[:, 3:6] * n_interp, axis=-1),
                    jnp.sum(m9[:, 6:9] * n_interp, axis=-1),
                ],
                axis=-1,
            )
            n_interp = n_interp / jnp.maximum(
                jnp.linalg.norm(n_interp, axis=-1, keepdims=True), 1e-20
            )
        base = scene.materials.base_color[mats, :3]
        if meta.any_textures:
            tb2 = scene.materials.tex_base[mats]
            b_tex = sample_stack(scene.tex_rgba, tb2, uv)[:, :3]
            base = jnp.where((tb2 >= 0)[:, None], base * b_tex * b_tex, base)
        cosd = jnp.abs(jnp.sum(n_interp * d, axis=-1, keepdims=True))
        factor = cosd * base
    return alpha_ok, transparent, factor


def intersect_blocktrace_gated(
    scene,
    meta,
    o,
    d,
    t_max,
    t_min: float = 1e-3,
    nee: bool = False,
    alpha_seed=None,
    atten=None,
    block: int = None,
    k: int = 24,
    max_casts: int = 32,
    fused: bool = True,
    kbatch: int = None,
    groups: int = None,
    rekey: int = None,
    minleft: int = None,
    interpret: bool = False,
):
    """Block-trace with per-hit gates: stochastic alpha and (for NEE)
    transparent-shadow attenuation, via iterative re-casting. Each cast
    finds the closest hit past a per-lane floor; gate-rejected lanes
    advance the floor to that hit and re-cast. The alpha stream is the
    per-(lane, tri) hash shared with the stack paths, so decisions agree
    across traversal strategies.

    The presort + two-key sort + inverse permutation run ONCE (cast 0's
    `_fused_order`) and every cast reuses them: the sort is pure
    scheduling (per-ray results are order-free), and per-cast block
    liveness comes from the carried t_max lanes, so later casts — which
    touch only the shrinking pass-through set — cost one row gather plus
    the fused kernel over the few still-live blocks instead of the full
    pipeline. Bit-identical to re-sorting every cast.

    Round 4 — tail compaction: the pass-through ladder decays ~3.5x per
    cast (524k -> 80k -> 28k -> 9k ... on the ivy flagship,
    tools/diag_gated.py) but every cast's ELEMENTWISE work (ray-matrix
    gathers, gate texture fetches, hit merges) runs at full lane width —
    ~10 full-width casts made the ivy wave 3.8x slower than the plain
    one. So: once the active count fits in an n/8 buffer, the survivors
    are compacted (stable argsort on the active mask), the re-cast loop
    finishes at 1/8 width with its own (cheap) presort, and results
    scatter back. Per-lane results are order-free, so this is exact."""
    from yart_tpu.render.intersect import Hit

    n = o.shape[0]
    blk = block if block is not None else TRACE_BLOCK
    t_max_v = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if alpha_seed is None:
        alpha_seed = jnp.zeros((n,), jnp.uint32)
    else:
        alpha_seed = jnp.broadcast_to(alpha_seed, (n,))
    atten0 = (
        atten if atten is not None else jnp.ones((n, 3), jnp.float32)
    )

    zero_hit = Hit(
        t_max_v, jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), bool), atten0, jnp.zeros((n,), bool),
    )

    amask = bool(meta.any_alpha) and fused

    def run_casts(o_l, d_l, tmax_l, seed_l, state0, order_info_l,
                  stop_at_cap):
        """The re-cast loop over one lane set. `stop_at_cap` (static int
        or None) additionally exits once the active count fits the
        compaction buffer."""

        def cond(st):
            best, act, floor, cast = st
            go = jnp.any(act) & (cast < max_casts)
            if stop_at_cap is not None:
                go = go & (jnp.sum(act.astype(jnp.int32)) > stop_at_cap)
            return go

        def body(st):
            best, act, floor, cast = st
            tm = jnp.where(act, tmax_l, -1.0)
            h = intersect_blocktrace(
                scene, meta, o_l, d_l, tm, t_min=t_min, nee=False,
                floor=floor, block=block, k=k, fused=fused, kbatch=kbatch,
                groups=groups, rekey=rekey, minleft=minleft,
                order_info=order_info_l, amask=amask, interpret=interpret,
            )
            hit = h.mask & act
            alpha_ok, transparent, factor = _hit_gates(
                scene, meta, h, d_l, nee, seed_l
            )
            passthru = hit & (transparent | ~alpha_ok)
            accept = hit & ~transparent & alpha_ok
            atten_new = jnp.where(
                (hit & transparent)[:, None],
                best.attenuation * factor,
                best.attenuation,
            )
            best = Hit(
                jnp.where(accept, h.t, best.t),
                jnp.where(accept, h.tri, best.tri),
                jnp.where(accept, h.u, best.u),
                jnp.where(accept, h.v, best.v),
                jnp.where(accept, h.back_side, best.back_side),
                atten_new,
                best.mask | accept,
            )
            return (
                best,
                act & passthru,
                jnp.where(passthru, h.t, floor),
                cast + 1,
            )

        return lax.while_loop(cond, body, state0)

    order_info = None
    if fused:
        order_info = _fused_order(
            scene, meta, o, d, t_max_v, jnp.zeros((n,), jnp.float32),
            blk, t_min, interpret,
        )

    cap = -(-(n // TRACE_CAPDIV) // blk) * blk
    compact = fused and cap >= blk and cap < n
    state0 = (zero_hit, jnp.ones((n,), bool), jnp.zeros((n,), jnp.float32),
              jnp.asarray(0, jnp.int32))
    best, act, floor, cast = run_casts(
        o, d, t_max_v, alpha_seed, state0, order_info,
        cap if compact else None,
    )
    if not compact:
        return best

    # ---- tail compaction: finish the survivors at 1/8 width ----
    idx = jnp.argsort(jnp.where(act, 0, 1))[:cap]  # stable: active first
    sub = lambda a: a[idx]
    best_c = Hit(*(sub(f) for f in best))
    o_c, d_c = o[idx], d[idx]
    tmax_c = t_max_v[idx]
    act_c = act[idx]
    order_c = _fused_order(
        scene, meta, o_c, d_c, jnp.where(act_c, tmax_c, -1.0),
        jnp.where(act_c, floor[idx], 0.0), blk, t_min, interpret,
    )
    best_c, _, _, _ = run_casts(
        o_c, d_c, tmax_c, alpha_seed[idx],
        (best_c, act_c, floor[idx], cast), order_c, None,
    )
    return Hit(
        best.t.at[idx].set(best_c.t),
        best.tri.at[idx].set(best_c.tri),
        best.u.at[idx].set(best_c.u),
        best.v.at[idx].set(best_c.v),
        best.back_side.at[idx].set(best_c.back_side),
        best.attenuation.at[idx].set(best_c.attenuation),
        best.mask.at[idx].set(best_c.mask),
    )
