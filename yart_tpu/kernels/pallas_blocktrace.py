"""Pallas TPU kernels for block-trace traversal (render/blocktrace.py).

Big-scene intersection reimagined for the TPU memory system. The reference
walks a binary BVH per ray with a 64-deep stack (src/cpu/ray-integrator.cpp:
84-160); a lockstep wavefront version of that walk is bandwidth-bound (row
gathers + stack traffic every iteration). Block-trace instead notes that a
scene is only ~1-4k clusters of <=C triangles (scene/clusters.py), so for a
coherence-sorted *block* of B rays:

  select kernel   test every cluster AABB against all B rays in one dense
                  [B, n_clus] sweep (VPU broadcast FMAs; the cluster-box
                  table lives in VMEM for the whole grid), reduce to a
                  per-block (entry, id) key per cluster, and extract the K
                  lexicographically-smallest candidate clusters.
  test kernel     grid (block, slot): DMA slot's cluster as a prepacked
                  [8, 3C] plane/barycentric operand and closest-hit test it
                  against all B rays (kernels/pallas_cluster.py math),
                  accumulating per-ray best hits in a VMEM-resident output
                  block across the K slots.

No per-lane gathers, no scatters, no multi-million-element sorts — the only
"pointer chasing" left is one cluster-row DMA per (block, slot), overlapped
by the Pallas pipeline. Under-K overflow is handled by the caller re-running
rounds with a lexicographic window (render/blocktrace.py docstring).

Packed selection keys: key = (f32_bits(entry) & ~ID_MASK) | cluster_id, an
int32 whose ordering is (quantized entry, id) lex order. Entries are
positive floats so the bit pattern is order-preserving; clearing the low
ID_BITS mantissa bits makes room for the id and only ever *lowers* the
entry, so a bound derived from a key is a conservative lower bound on every
dropped cluster's true entry distance. ID_BITS=13 caps scenes at 8192
clusters (~1M triangles at C=128, and instanced scenes spend one id per
instance-cluster); bigger scenes fall back to render/bintrace.py. The
quantization costs <= 2^-10 relative entry precision — only ever extra
conservative work, never a wrong hit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yart_tpu.kernels.pallas_cluster import EPS_DET, F32_MAX

LANE = 128
ID_BITS = 13
ID_MASK = (1 << ID_BITS) - 1
KEY_DEAD = (1 << 31) - 1  # int32 max: masked / exhausted


def _ray_cols(rays):
    """rays [B, 8] -> o [B,3], d [B,3], t_cur [B,1], floor [B,1]."""
    return rays[:, 0:3], rays[:, 3:6], rays[:, 6:7], rays[:, 7:8]


def _entry_chunk(o, d, t_cur, floor, lo, hi, t_min: float):
    """Slab test of B rays against a chunk of cluster boxes.

    o,d [B,3]; t_cur,floor [B,1]; lo,hi: 3 rows [1,CH] each.
    Returns entry [B, CH] with F32_MAX where the ray misses the box or the
    box cannot contain a hit in (floor, t_cur)."""
    ent = None
    ext = None
    for a in range(3):
        da = d[:, a : a + 1]
        ia = 1.0 / jnp.where(
            jnp.abs(da) < 1e-20, jnp.where(da < 0, -1e-20, 1e-20), da
        )
        oa = o[:, a : a + 1] * ia
        x0 = lo[a] * ia - oa
        x1 = hi[a] * ia - oa
        a0 = jnp.minimum(x0, x1)
        a1 = jnp.maximum(x0, x1)
        ent = a0 if ent is None else jnp.maximum(ent, a0)
        ext = a1 if ext is None else jnp.minimum(ext, a1)
    e = jnp.maximum(ent, t_min)
    hit = (ext >= e) & (e < t_cur) & (ext > floor)
    return jnp.where(hit, e, jnp.float32(F32_MAX))


def _select_kernel(k: int, t_min: float, chunk: int,
                   wkey_ref, act_ref, rays_ref, boxes_ref, out_ref):
    b = pl.program_id(0)
    cpad = boxes_ref.shape[1]
    lane = lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

    # Converged blocks skip the sweep entirely (late continuation rounds
    # are mostly inactive blocks); their output says "no candidates":
    # ids all -1, bound_key = KEY_DEAD (nothing dropped), n_live = 0.
    out_ref[0, 0] = jnp.full((LANE,), -1, jnp.int32)
    out_ref[0, 1] = jnp.where(lane == 0, KEY_DEAD, 0)[0]

    @pl.when(act_ref[b] != 0)
    def _():
        rays = rays_ref[...]
        o, d, t_cur, floor = _ray_cols(rays)
        w_key = wkey_ref[b]

        # Per-cluster packed key = blockwise-min entry, quantized, with the
        # cluster id in the low bits; DEAD where no ray enters the box or
        # the key falls below the window.
        keys = []
        for j in range(cpad // chunk):
            sl = pl.dslice(j * chunk, chunk)
            lo = [boxes_ref[a : a + 1, sl] for a in range(3)]
            hi = [boxes_ref[a + 3 : a + 4, sl] for a in range(3)]
            e = _entry_chunk(o, d, t_cur, floor, lo, hi, t_min)
            emin = jnp.min(e, axis=0, keepdims=True)  # [1, CH]
            bits = lax.bitcast_convert_type(emin, jnp.int32)
            cid = j * chunk + lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            key = (bits & ~ID_MASK) | cid
            key = jnp.where(
                (emin < F32_MAX) & (key >= w_key), key, KEY_DEAD
            )
            keys.append(key)
        key_row = (
            jnp.concatenate(keys, axis=1) if len(keys) > 1 else keys[0]
        )

        ids_row = jnp.full((1, LANE), -1, jnp.int32)
        n_live = jnp.int32(0)
        for s in range(k):
            m = jnp.min(key_row)
            got = m != KEY_DEAD
            ids_row = jnp.where(
                (lane == s) & got, m & ID_MASK, ids_row
            )
            n_live = n_live + got.astype(jnp.int32)
            key_row = jnp.where(key_row == m, KEY_DEAD, key_row)

        bound_key = jnp.min(key_row)  # lexmin of everything dropped
        out_ref[0, 0] = ids_row[0]
        out_ref[0, 1] = jnp.where(
            lane == 0, bound_key, jnp.where(lane == 1, n_live, 0)
        )[0]


@functools.partial(
    jax.jit, static_argnames=("block", "k", "t_min", "interpret")
)
def select_clusters_pallas(rays, clus_box, w_key, act, block: int, k: int,
                           t_min: float, interpret: bool = False):
    """rays [Np, 8] (o3, d3, t_cur, floor); clus_box [8, n_clus_pad];
    w_key/act [n_blocks] i32 (lex window key, block-active flag). Returns
    (ids [n_blocks, K] i32 lex-ordered -1-padded, bound_key [n_blocks],
    n_live [n_blocks])."""
    n = rays.shape[0]
    n_blocks = n // block
    assert n % block == 0 and k <= LANE
    cpad = clus_box.shape[1]
    chunk = 512 if cpad % 512 == 0 else 128
    chunk = min(cpad, chunk)
    assert cpad % chunk == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, 8), lambda b, wk, ac: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cpad), lambda b, wk, ac: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, LANE), lambda b, wk, ac: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_select_kernel, k, t_min, chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, 8, LANE), jnp.int32),
        interpret=interpret,
    )(w_key, act, rays, clus_box)
    return out[:, 0, :k], out[:, 1, 0], out[:, 1, 1]


def _test_kernel(c: int, k: int, t_min: float,
                 live_ref, first_ref, ids_ref, tri_ref, rays_ref, out_ref):
    b = pl.program_id(0)
    s = pl.program_id(1)
    block = rays_ref.shape[0]

    @pl.when(s == 0)
    def _():
        neg1 = lax.bitcast_convert_type(
            jnp.full((block, 1), -1, jnp.int32), jnp.float32
        )
        out_ref[0] = jnp.concatenate(
            [
                rays_ref[:, 6:7],  # t = t_cur
                jnp.zeros((block, 3), jnp.float32),
                neg1,  # tri = -1
                jnp.zeros((block, 3), jnp.float32),
            ],
            axis=1,
        )

    @pl.when(live_ref[b * k + s] != 0)
    def _():
        rays = rays_ref[...]
        o, d, _, floor = _ray_cols(rays)
        tri = tri_ref[0]  # [8, 3C]
        old = out_ref[0]  # [B, 8]
        t_best = old[:, 0:1]

        consts = tri[3, :][None, :]
        ro = (
            o[:, 0:1] * tri[0, :][None, :]
            + o[:, 1:2] * tri[1, :][None, :]
            + o[:, 2:3] * tri[2, :][None, :]
        )  # [B, 3C]
        rd = (
            d[:, 0:1] * tri[0, :][None, :]
            + d[:, 1:2] * tri[1, :][None, :]
            + d[:, 2:3] * tri[2, :][None, :]
        )
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
            & (t > t_min) & (t > floor) & (t < t_best)
        )
        tbig = jnp.where(valid, t, F32_MAX)
        bt = jnp.min(tbig, axis=1, keepdims=True)  # [B, 1]
        better = bt < t_best
        cols = lax.broadcasted_iota(jnp.int32, (1, c), 1)
        sel = tbig == bt
        best = jnp.min(jnp.where(sel, cols, c), axis=1, keepdims=True)
        pick = best == cols
        take = lambda a: jnp.sum(
            jnp.where(pick, a, 0.0), axis=1, keepdims=True
        )
        gid = lax.bitcast_convert_type(first_ref[b * k + s] + best,
                                       jnp.float32)
        new = jnp.concatenate(
            [
                bt,
                take(u),
                take(v),
                (take(nd) > 0.0).astype(jnp.float32),
                gid,
                jnp.zeros((block, 3), jnp.float32),
            ],
            axis=1,
        )
        out_ref[0] = jnp.where(better, new, old)


@functools.partial(
    jax.jit, static_argnames=("c", "k", "t_min", "interpret")
)
def test_clusters_pallas(rays, clus_pack, live, first, ids, c: int, k: int,
                         t_min: float, interpret: bool = False):
    """rays [Np, 8]; live/first/ids [n_blocks * K] i32 per slot (live flag,
    first-triangle id, cluster id for the DMA — dead slots must repeat the
    previous slot's id upstream so their DMA is skipped). Returns out
    [Np, 8]: cols t, u, v, back, tri (bitcast i32), pad. Lanes with no hit
    keep t == t_cur, tri == -1."""
    n = rays.shape[0]
    n_blocks = live.shape[0] // k
    block = n // n_blocks
    assert n_blocks * block == n and n_blocks * k == live.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks, k),
        in_specs=[
            pl.BlockSpec(
                (1,) + clus_pack.shape[1:],
                lambda b, s, live, first, ids: (ids[b * k + s], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block, 8), lambda b, s, live, first, ids: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block, 8), lambda b, s, live, first, ids: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_test_kernel, c, k, t_min),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, block, 8), jnp.float32),
        interpret=interpret,
    )(live, first, ids, clus_pack, rays)
    return out.reshape(n, 8)
