"""Pallas TPU kernel: dense (ray, cluster) pair intersection.

Phase 2 of the bin-trace pipeline (scene/clusters.py): pairs are grouped so
every block of B pairs shares ONE triangle cluster; the cluster id per block
arrives as a scalar-prefetch array, so the BlockSpec index map DMAs exactly
that cluster's prepacked [8, 3C] matmul operand into VMEM while the previous
block computes.

Per block, the whole Moller-Trumbore test (src/cpu/ray-integrator.cpp:
162-229 semantics: closest hit, backface detect, |det| epsilon reject)
becomes:

    O = o @ [n | eu | ev]   # [B,3] x [3,3C] on the MXU
    D = d @ [n | eu | ev]
    t = (cn - O_n) / D_n ;  u = O_u + t D_u - cu ;  v = O_v + t D_v - cv

followed by VPU elementwise validity + a min-reduction over the C columns.
HBM traffic is pairs in + one 8x3C cluster row per block + hits out; all
[B, C] intermediates live in VMEM only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
B_PAIRS = 1024  # pairs per block (= one (8, 128) f32 tile)
EPS_DET = 1e-12
F32_MAX = 3.0e38  # python float: jnp scalars become captured consts in pallas


def _amask_valid(u, v, tri, c: int):
    """Conservative alpha-mask test: bit (iu, iv) of the triangle's 8x8
    barycentric bitmask (pack row 5: lanes [0:C] = bits 0..31, [C:2C] =
    bits 32..63, bitcast i32 — scene/alphamask.py). Bit 0 means the alpha
    channel is identically zero over the cell's bilinear footprint, so the
    candidate can never be accepted by the host alpha gate (strict
    u_a < alpha) — rejecting it here is exact. Inputs u, v may be
    garbage (including NaN, e.g. t = 0/0 on zero-padding columns) on
    already-invalid lanes — a NaN passes the float clip unchanged and
    its int conversion is implementation-defined, so the shift amount is
    re-clamped in the INTEGER domain to stay architecturally defined;
    the caller ANDs the result with the geometric validity."""
    w0 = lax.bitcast_convert_type(tri[5:6, 0:c], jnp.int32)  # [1, C]
    w1 = lax.bitcast_convert_type(tri[5:6, c : 2 * c], jnp.int32)
    iu = jnp.clip(u * 8.0, 0.0, 7.0).astype(jnp.int32)
    iv = jnp.clip(v * 8.0, 0.0, 7.0).astype(jnp.int32)
    bit = jnp.clip(iu * 8 + iv, 0, 63)  # [B, C]; NaN-proof
    sel = bit < 32
    word = jnp.where(sel, w0, w1)
    sh = jnp.where(sel, bit, bit - 32)
    return (lax.shift_right_logical(word, sh) & 1) != 0


def _pair_test(o, d, tmax, tri, c: int, t_min: float, floor=None,
               amask: bool = False):
    """Shared math: o,d [B,3], tmax [B,1], tri [8, 3C] -> per-pair best
    (t, u, v, back, col, anyv) with t == F32_MAX on miss. `floor` [B,1]
    optionally rejects hits at t <= floor (gated re-cast contract);
    `amask` additionally rejects candidates whose baked alpha bitmask
    cell is certainly transparent (see _amask_valid).

    The six ray.(n|eu|ev) dot products are written as broadcast FMAs
    ([B,1] x [1,3C]) rather than [B,3]x[3,3C] matmuls: K=3 contractions
    need sublane-major relayouts on Mosaic, while lane/sublane broadcasts
    map straight onto the VPU."""
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
    return _pair_test_from_proj(ro, rd, tmax, tri, c, t_min, floor, amask)


def _pair_test_mxu(o3t, d3t, tmax, tri, c: int, t_min: float, floor=None):
    """_pair_test with the projections as MXU contractions: o3t/d3t are
    the rays SoA-transposed [3, B], so the K=3 contraction runs over the
    sublane dim with no relayout (stationary [3,3C] operand). HIGHEST
    precision keeps the result within f32 rounding of the FMA form."""
    dot = lambda l: lax.dot_general(
        l, tri[0:3, :], (((0,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return _pair_test_from_proj(dot(o3t), dot(d3t), tmax, tri, c, t_min,
                                floor)


def _pair_test_from_proj(ro, rd, tmax, tri, c: int, t_min: float,
                         floor=None, amask: bool = False):
    consts = tri[3, :][None, :]  # [1, 3C]
    no, uo, vo = ro[:, :c], ro[:, c : 2 * c], ro[:, 2 * c :]
    nd, ud, vd = rd[:, :c], rd[:, c : 2 * c], rd[:, 2 * c :]
    cn, cu, cv = consts[:, :c], consts[:, c : 2 * c], consts[:, 2 * c :]

    t = (cn - no) / nd
    u = uo + t * ud - cu
    v = vo + t * vd - cv
    valid = (
        (jnp.abs(nd) >= EPS_DET)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < tmax)
    )
    if floor is not None:
        valid = valid & (t > floor)
    if amask:
        valid = valid & _amask_valid(u, v, tri, c)
    tbig = jnp.where(valid, t, F32_MAX)
    bt = jnp.min(tbig, axis=1)  # [B]
    anyv = bt < F32_MAX
    # Branchless argmin with lowest-column tie-break (no Mosaic argmin/gather).
    cols = lax.broadcasted_iota(jnp.int32, (1, c), 1)
    sel = tbig == bt[:, None]
    best = jnp.min(jnp.where(sel, cols, c), axis=1)
    pick = best[:, None] == cols
    take = lambda a: jnp.sum(jnp.where(pick, a, 0.0), axis=1)
    return bt, take(u), take(v), take(nd) > 0.0, best, anyv


def _kernel(c, t_min, cid_ref, first_ref, live_ref, tri_ref, x_ref,
            t_out, u_out, v_out, back_out, tri_out):
    i = pl.program_id(0)
    rows = B_PAIRS // LANE
    t_out[...] = jnp.full((rows, LANE), F32_MAX, jnp.float32)
    u_out[...] = jnp.zeros((rows, LANE), jnp.float32)
    v_out[...] = jnp.zeros((rows, LANE), jnp.float32)
    back_out[...] = jnp.zeros((rows, LANE), jnp.float32)
    tri_out[...] = jnp.full((rows, LANE), -1, jnp.int32)

    @pl.when(live_ref[i] != 0)
    def _():
        x = x_ref[...]  # [B, 8]
        o = x[:, 0:3]
        d = x[:, 3:6]
        tmax = x[:, 6:7]
        bt, bu, bv, bb, best, anyv = _pair_test(
            o, d, tmax, tri_ref[0], c, t_min
        )
        shape = lambda a: a.reshape(rows, LANE)
        t_out[...] = shape(jnp.where(anyv, bt, F32_MAX))
        u_out[...] = shape(bu)
        v_out[...] = shape(bv)
        back_out[...] = shape(bb.astype(jnp.float32))
        tri_out[...] = shape(
            jnp.where(anyv, first_ref[i] + best, -1)
        )


@functools.partial(jax.jit, static_argnames=("c", "t_min", "interpret"))
def cluster_pairs_pallas(clus_pack, block_cid, block_first, block_live, x,
                         c: int, t_min: float, interpret: bool = False):
    """x: [P, 8] pair rows (o3, d3, tmax, pad), P = n_blocks * B_PAIRS;
    block_*: [n_blocks] i32. Returns per-pair (t, u, v, back, tri)."""
    p = x.shape[0]
    n_blocks = p // B_PAIRS
    assert p % B_PAIRS == 0
    rows = B_PAIRS // LANE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (1,) + clus_pack.shape[1:],
                lambda i, cid, first, live: (cid[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (B_PAIRS, 8),
                lambda i, cid, first, live: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (rows, LANE),
                lambda i, cid, first, live: (i, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(5)
        ),
    )
    f32 = jax.ShapeDtypeStruct((p // LANE, LANE), jnp.float32)
    i32 = jax.ShapeDtypeStruct((p // LANE, LANE), jnp.int32)
    t, u, v, back, tri = pl.pallas_call(
        functools.partial(_kernel, c, t_min),
        grid_spec=grid_spec,
        out_shape=(f32, f32, f32, f32, i32),
        interpret=interpret,
    )(block_cid, block_first, block_live, clus_pack, x)
    flat = lambda a: a.reshape(p)
    return flat(t), flat(u), flat(v), flat(back) > 0.5, flat(tri)


def cluster_pairs_ref(clus_pack, block_cid, block_first, block_live, x,
                      c: int, t_min: float):
    """Pure-XLA reference of the kernel (CPU fallback + equivalence tests)."""
    p = x.shape[0]
    n_blocks = p // B_PAIRS
    tri = clus_pack[block_cid]  # [G, 8, 3C]
    xg = x.reshape(n_blocks, B_PAIRS, 8)

    def one(tri_g, x_g, first_g, live_g):
        bt, bu, bv, bb, best, anyv = _pair_test(
            x_g[:, 0:3], x_g[:, 3:6], x_g[:, 6:7], tri_g, c, t_min
        )
        live = live_g != 0
        anyv = anyv & live
        return (
            jnp.where(anyv, bt, F32_MAX),
            jnp.where(live, bu, 0.0),
            jnp.where(live, bv, 0.0),
            bb & live,
            jnp.where(anyv, first_g + best, -1),
        )

    t, u, v, back, trid = jax.vmap(one)(tri, xg, block_first, block_live)
    flat = lambda a: a.reshape(p)
    return flat(t), flat(u), flat(v), flat(back), flat(trid)
