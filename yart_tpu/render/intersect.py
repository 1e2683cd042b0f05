"""Wavefront ray-scene intersection.

TPU re-design of the reference's recursive, per-ray traversal stack
(src/cpu/ray-integrator.cpp:20-261): the whole ray batch advances in lockstep
through a jitted `lax.while_loop`, each lane holding its own node cursor and
fixed-depth traversal stack in dense [N, S] arrays. Leaves are fixed-width
(max_leaf) so each leaf visit is ONE vectorized masked Möller-Trumbore test
over the VPU — no inner dynamic loop.

Two implementations with identical results:
- `intersect_brute`: masked test of every triangle (chunked scan) — the
  correctness oracle and the fast path for tiny scenes.
- `intersect_bvh`: ordered near-first descent with per-lane stacks, the
  reference's traversal contract (ray-integrator.cpp:84-160) minus recursion.

NEE shadow rays: `nee=True` gives any-hit semantics with early exit
(ray-integrator.cpp:121) and accumulates transparent-surface attenuation for
alpha/transmissive materials (ray-integrator.cpp:208-219).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from yart_tpu.ops.gatherless import onehot_matmul, select_along
from yart_tpu.ops.qmc import mix32, u32_to_unit_float
from yart_tpu.render.texture import sample_stack
from yart_tpu.scene.types import CompiledScene, SceneMeta

F32_MAX = np.float32(3.0e38)  # numpy: safe if imported inside a trace
EPS_DET = 1e-12  # reference epsilon (math_base.hpp: epsilon = 1e-12)


class Hit(NamedTuple):
    """SoA hit record (analog of src/cpu/hit.hpp:8-17). All [N]-leading."""

    t: jnp.ndarray  # [N] hit distance; >= t_max means miss
    tri: jnp.ndarray  # [N] int32 triangle index (undefined on miss)
    u: jnp.ndarray  # [N] barycentric u
    v: jnp.ndarray  # [N] barycentric v
    back_side: jnp.ndarray  # [N] bool
    attenuation: jnp.ndarray  # [N, 3] NEE transparent-shadow throughput
    mask: jnp.ndarray  # [N] bool: True = real hit


def _mt_test(o, d, p0, p1, p2, t_min, t_cur):
    """Batched Möller-Trumbore (ray-integrator.cpp:162-229 core math).

    o, d: [..., 3]; p0/p1/p2: [..., 3] (broadcast-compatible).
    Returns (valid, t, u, v, back_side).
    """
    e1 = p1 - p0
    e2 = p2 - p0
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    back = det < 0.0
    inv_det = 1.0 / jnp.where(jnp.abs(det) < EPS_DET, 1.0, det)

    b = o - p0
    u = jnp.sum(b * pvec, axis=-1) * inv_det
    qvec = jnp.cross(b, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det

    valid = (
        (jnp.abs(det) >= EPS_DET)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_cur)
    )
    return valid, t, u, v, back


def _closest_in_leaf(
    scene,
    meta,
    o,
    d,
    t_min,
    t_cur,
    first,
    n_valid,
    max_leaf,
    nee=False,
    alpha_seed=None,
    atten=None,
):
    """Test max_leaf consecutive triangles starting at `first` per lane.

    Returns (any_valid, t, u, v, back, tri, atten) of the closest valid hit.
    o, d: [N, 3]; first, n_valid: [N]; lanes with no valid hit get t = t_cur.

    Optional per-triangle gates, enabled by static scene flags so untextured
    scenes pay nothing:
    - stochastic alpha test (ray-integrator.cpp:205-211): a hash of
      (alpha_seed, tri) stands in for the reference's sequential sampler draw
      — deterministic per (pixel, sample, tri) instead of per test order.
    - NEE transparent-surface attenuation (ray-integrator.cpp:213-219):
      thin-transmissive surfaces don't block shadow rays; they multiply
      `atten` by absdot(n, d) * base(uv) and are skipped as hits.
    """
    offs = jnp.arange(max_leaf, dtype=jnp.int32)  # [L]
    tri_ids = first[:, None] + offs[None, :]  # [N, L]
    in_leaf = offs[None, :] < n_valid[:, None]
    tri_ids = jnp.clip(tri_ids, 0, scene.tri_v.shape[0] - 1)

    # ONE packed row gather per candidate (v0, v1, v2, mat, light).
    rows = scene.tri_pack[tri_ids]  # [N, L, 12]
    p0 = rows[..., 0:3]
    p1 = rows[..., 3:6]
    p2 = rows[..., 6:9]

    valid, t, u, v, back = _mt_test(
        o[:, None, :], d[:, None, :], p0, p1, p2, t_min, t_cur[:, None]
    )
    valid = valid & in_leaf

    need_uv = (meta is not None) and (
        meta.any_alpha or (nee and meta.any_transparent)
    )
    if need_uv:
        mats = lax.bitcast_convert_type(rows[..., 9], jnp.int32)  # [N, L]
        srow = scene.shade_pack[tri_ids]  # [N, L, 32] one gather
        w_b = (1.0 - u - v)[..., None]
        uv = (
            w_b * srow[..., 9:11]
            + u[..., None] * srow[..., 11:13]
            + v[..., None] * srow[..., 13:15]
        )  # [N, L, 2]
        n_lanes, L = tri_ids.shape

    if meta is not None and meta.any_alpha:
        mrow = onehot_matmul(
            jnp.stack(
                [
                    scene.materials.tex_base.astype(jnp.float32),
                    scene.materials.has_alpha.astype(jnp.float32),
                    scene.materials.thin.astype(jnp.float32),
                    scene.materials.transmission,
                ],
                axis=1,
            ),
            mats.reshape(-1),
        ).reshape(mats.shape + (4,))
        tb = mrow[..., 0].astype(jnp.int32)
        has_a = (mrow[..., 1] > 0.5) & (tb >= 0)
        a_tex = sample_stack(
            scene.tex_rgba, tb.reshape(-1), uv.reshape(-1, 2)
        ).reshape(n_lanes, L, 4)[..., 3]
        alpha = jnp.where(has_a, a_tex, 1.0)
        if alpha_seed is None:
            alpha_seed = jnp.zeros(tri_ids.shape[:1], jnp.uint32)
        u_a = u32_to_unit_float(
            mix32(
                alpha_seed[:, None]
                ^ tri_ids.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
            )
        )
        # Strict <: alpha == 0 never accepts, matching the in-kernel
        # alpha-mask cull's exactness contract (scene/alphamask.py).
        valid = valid & ((alpha >= 1.0) | (u_a < alpha))

    if nee and meta is not None and meta.any_transparent:
        mrow2 = onehot_matmul(
            jnp.stack(
                [
                    scene.materials.thin.astype(jnp.float32),
                    scene.materials.transmission,
                    scene.materials.tex_base.astype(jnp.float32),
                ],
                axis=1,
            ),
            mats.reshape(-1),
        ).reshape(mats.shape + (3,))
        thin = mrow2[..., 0] > 0.5
        trans = mrow2[..., 1]
        transparent = thin & (trans > 0.0)
        tr_hit = valid & transparent
        n_interp = (
            w_b * srow[..., 0:3]
            + u[..., None] * srow[..., 3:6]
            + v[..., None] * srow[..., 6:9]
        )
        base = onehot_matmul(
            scene.materials.base_color[:, :3], mats.reshape(-1)
        ).reshape(mats.shape + (3,))
        if meta.any_textures:
            tb2 = mrow2[..., 2].astype(jnp.int32)
            b_tex = sample_stack(
                scene.tex_rgba, tb2.reshape(-1), uv.reshape(-1, 2)
            ).reshape(n_lanes, L, 4)[..., :3]
            base = jnp.where(
                (tb2 >= 0)[..., None], base * b_tex * b_tex, base
            )
        cosd = jnp.abs(jnp.sum(n_interp * d[:, None, :], axis=-1))
        factor = jnp.where(
            tr_hit[..., None], cosd[..., None] * base, 1.0
        )
        if atten is not None:
            atten = atten * jnp.prod(factor, axis=1)
        valid = valid & ~transparent

    t = jnp.where(valid, t, F32_MAX)
    best = jnp.argmin(t, axis=-1)  # [N]
    take = lambda a: select_along(a, best)
    any_valid = jnp.any(valid, axis=-1)
    return (
        any_valid,
        jnp.where(any_valid, take(t), t_cur),
        take(u),
        take(v),
        take(back),
        take(jnp.broadcast_to(tri_ids, t.shape)),
        atten,
    )


def _slab_test(o_lo, o_hi, t_min, t_cur):
    """Branchless slab test given per-axis entry/exit candidates."""
    tlo = jnp.minimum(o_lo, o_hi)
    thi = jnp.maximum(o_lo, o_hi)
    t0 = jnp.maximum(jnp.max(tlo, axis=-1), t_min)
    t1 = jnp.minimum(jnp.min(thi, axis=-1), t_cur)
    return t1 >= t0, t0


def intersect_brute(
    scene: CompiledScene,
    meta: SceneMeta,
    o,
    d,
    t_max,
    t_min: float = 1e-3,
    nee: bool = False,
    chunk: int = 256,
    alpha_seed=None,
):
    """Reference oracle: test every triangle, chunked to bound memory.

    TPU-friendly layout: every lane tests the SAME triangle chunk, so the
    per-chunk geometry comes from `dynamic_slice` (no gathers at all — a
    [lanes*chunk]-index gather from a small table lowers to a catastrophic
    one-hot expansion on TPU) and broadcasts against the lane axis.
    """
    n = o.shape[0]
    n_tris = meta.n_tris
    n_chunks = -(-n_tris // chunk)
    pad = n_chunks * chunk - n_tris

    # Per-triangle data, precomputed once (tiny gathers, hoisted out of the
    # scan by XLA) and padded to a whole number of chunks.
    def padded(a):
        width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, width)

    tv = scene.tri_v
    p0a = padded(scene.positions[tv[:, 0]])  # [Tp, 3]
    p1a = padded(scene.positions[tv[:, 1]])
    p2a = padded(scene.positions[tv[:, 2]])

    need_uv = meta.any_alpha or (nee and meta.any_transparent)
    if need_uv:
        mat_a = padded(scene.tri_mat)
        uv0a = padded(scene.uvs[tv[:, 0]])
        uv1a = padded(scene.uvs[tv[:, 1]])
        uv2a = padded(scene.uvs[tv[:, 2]])
        n0a = padded(scene.normals[tv[:, 0]])
        n1a = padded(scene.normals[tv[:, 1]])
        n2a = padded(scene.normals[tv[:, 2]])

    def body(carry, ci):
        t_cur, tri, u, v, back, any_hit, atten = carry
        start = ci * chunk
        sl = lambda a: lax.dynamic_slice_in_dim(a, start, chunk)
        in_range = start + jnp.arange(chunk, dtype=jnp.int32) < n_tris  # [C]

        valid, t, uu, vv, bk = _mt_test(
            o[:, None, :],
            d[:, None, :],
            sl(p0a)[None],
            sl(p1a)[None],
            sl(p2a)[None],
            t_min,
            t_cur[:, None],
        )  # all [N, C]
        valid = valid & in_range[None, :]
        tri_ids = (start + jnp.arange(chunk, dtype=jnp.int32))[None, :]

        if need_uv:
            mats = sl(mat_a)  # [C]
            w_b = (1.0 - uu - vv)[..., None]
            uv = (
                w_b * sl(uv0a)[None]
                + uu[..., None] * sl(uv1a)[None]
                + vv[..., None] * sl(uv2a)[None]
            )  # [N, C, 2]

        if meta.any_alpha:
            tb = scene.materials.tex_base[mats]  # [C]
            has_a = scene.materials.has_alpha[mats] & (tb >= 0)
            a_tex = sample_stack(
                scene.tex_rgba,
                jnp.broadcast_to(tb[None, :], (n, chunk)).reshape(-1),
                uv.reshape(-1, 2),
            ).reshape(n, chunk, 4)[..., 3]
            alpha = jnp.where(has_a[None, :], a_tex, 1.0)
            seed = (
                alpha_seed
                if alpha_seed is not None
                else jnp.zeros((n,), jnp.uint32)
            )
            u_a = u32_to_unit_float(
                mix32(
                    seed[:, None]
                    ^ tri_ids.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
                )
            )
            # Strict <: alpha == 0 never accepts, matching the in-kernel
            # alpha-mask cull's exactness contract (scene/alphamask.py).
            valid = valid & ((alpha >= 1.0) | (u_a < alpha))

        if nee and meta.any_transparent:
            thin = scene.materials.thin[mats]
            trans = scene.materials.transmission[mats]
            transparent = (thin & (trans > 0.0))[None, :]
            tr_hit = valid & transparent
            n_interp = (
                w_b * sl(n0a)[None]
                + uu[..., None] * sl(n1a)[None]
                + vv[..., None] * sl(n2a)[None]
            )
            base = scene.materials.base_color[mats][..., :3][None]  # [1, C, 3]
            if meta.any_textures:
                tb2 = scene.materials.tex_base[mats]
                b_tex = sample_stack(
                    scene.tex_rgba,
                    jnp.broadcast_to(tb2[None, :], (n, chunk)).reshape(-1),
                    uv.reshape(-1, 2),
                ).reshape(n, chunk, 4)[..., :3]
                base = jnp.where(
                    (tb2 >= 0)[None, :, None], base * b_tex * b_tex, base
                )
            cosd = jnp.abs(jnp.sum(n_interp * d[:, None, :], axis=-1))
            factor = jnp.where(
                tr_hit[..., None], cosd[..., None] * base, 1.0
            )
            atten = atten * jnp.prod(factor, axis=1)
            valid = valid & ~transparent

        t = jnp.where(valid, t, F32_MAX)
        best = jnp.argmin(t, axis=-1)  # [N]
        take = lambda a: select_along(a, best)
        got = jnp.any(valid, axis=-1)
        t2 = jnp.where(got, take(t), t_cur)
        upd = got & (t2 < t_cur)
        return (
            jnp.where(upd, t2, t_cur),
            jnp.where(upd, take(jnp.broadcast_to(tri_ids, t.shape)), tri),
            jnp.where(upd, take(uu), u),
            jnp.where(upd, take(vv), v),
            jnp.where(upd, take(bk), back),
            any_hit | got,
            atten,
        ), None

    init = (
        jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.bool_),
        jnp.zeros((n,), jnp.bool_),
        jnp.ones((n, 3), jnp.float32),
    )
    if n_chunks == 1:
        (t, tri, u, v, back, any_hit, atten), _ = body(init, jnp.int32(0))
    else:
        (t, tri, u, v, back, any_hit, atten), _ = lax.scan(
            body, init, jnp.arange(n_chunks, dtype=jnp.int32)
        )
    return Hit(t, tri, u, v, back, atten, any_hit)


def intersect_bvh(
    scene: CompiledScene,
    meta: SceneMeta,
    o,
    d,
    t_max,
    t_min: float = 1e-3,
    nee: bool = False,
    alpha_seed=None,
    max_iters: int = 0,
):
    """Stack-based ordered BVH traversal over the whole wavefront.

    Control flow mirrors ray-integrator.cpp:84-160: pop a node, skip if its
    entry distance is beyond the current hit, test children ordered
    near-first, fixed-width leaf tests; NEE rays stop at the first hit.
    """
    n = o.shape[0]
    stack_depth = meta.bvh_depth + 2
    max_leaf = meta.max_leaf
    bvh = scene.bvh
    # Safety bound on lockstep iterations (a single pathological lane would
    # otherwise stall the whole wavefront); generous: every node visited once.
    if max_iters <= 0:
        max_iters = int(bvh.left.shape[0]) + 64

    idir = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    odir = -o * idir

    def box_test_rows(rows, t_cur):
        """Slab test from packed node rows [N, 8]."""
        bmin = rows[..., 0:3]
        bmax = rows[..., 3:6]
        return _slab_test(bmin * idir + odir, bmax * idir + odir, t_min, t_cur)

    t0 = jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32)
    root_row = jnp.broadcast_to(scene.node_pack[0], (n, 8))
    root_hit, root_d = box_test_rows(root_row, t0)

    class S(NamedTuple):
        iters: jnp.ndarray  # [] iteration counter (safety cap)
        node: jnp.ndarray  # [N] current node id
        dist: jnp.ndarray  # [N] entry distance of current node
        sp: jnp.ndarray  # [N] stack pointer
        snodes: jnp.ndarray  # [N, S]
        sdist: jnp.ndarray  # [N, S]
        t: jnp.ndarray
        tri: jnp.ndarray
        u: jnp.ndarray
        v: jnp.ndarray
        back: jnp.ndarray
        any_hit: jnp.ndarray
        active: jnp.ndarray
        atten: jnp.ndarray

    st = S(
        iters=jnp.asarray(0, jnp.int32),
        node=jnp.zeros((n,), jnp.int32),
        dist=root_d,
        sp=jnp.zeros((n,), jnp.int32),
        snodes=jnp.zeros((n, stack_depth), jnp.int32),
        sdist=jnp.zeros((n, stack_depth), jnp.float32),
        t=t0,
        tri=jnp.full((n,), -1, jnp.int32),
        u=jnp.zeros((n,), jnp.float32),
        v=jnp.zeros((n,), jnp.float32),
        back=jnp.zeros((n,), jnp.bool_),
        any_hit=jnp.zeros((n,), jnp.bool_),
        active=root_hit,
        atten=jnp.ones((n, 3), jnp.float32),
    )

    def cond(st: S):
        return jnp.any(st.active) & (st.iters < max_iters)

    def body(st: S):
        # ONE packed row gather for the current node.
        row = scene.node_pack[st.node]  # [N, 8]
        left = lax.bitcast_convert_type(row[..., 6], jnp.int32)
        count = lax.bitcast_convert_type(row[..., 7], jnp.int32)
        is_leaf = count > 0
        near_ok = st.dist < st.t
        do_leaf = st.active & is_leaf & near_ok
        do_inner = st.active & (~is_leaf) & near_ok
        do_pop_only = st.active & ~near_ok

        # ---- leaf: fixed-width masked triangle test ----
        first = left
        got, t2, u2, v2, b2, id2, atten = _closest_in_leaf(
            scene, meta, o, d, t_min, st.t, first,
            jnp.where(do_leaf, count, 0), max_leaf,
            nee=nee, alpha_seed=alpha_seed, atten=st.atten,
        )
        upd = do_leaf & got
        t = jnp.where(upd, t2, st.t)
        tri = jnp.where(upd, id2, st.tri)
        uu = jnp.where(upd, u2, st.u)
        vv = jnp.where(upd, v2, st.v)
        back = jnp.where(upd, b2, st.back)
        any_hit = st.any_hit | upd

        # ---- inner: test both children, order near-first ----
        l_child = jnp.where(is_leaf, 0, left)
        r_child = l_child + 1
        lh, ld = box_test_rows(scene.node_pack[l_child], t)
        rh, rd = box_test_rows(scene.node_pack[r_child], t)
        lh = lh & do_inner
        rh = rh & do_inner
        both = lh & rh
        swap = both & (ld > rd)
        near_node = jnp.where(swap, r_child, jnp.where(lh, l_child, r_child))
        near_d = jnp.where(swap, rd, jnp.where(lh, ld, rd))
        far_node = jnp.where(swap, l_child, r_child)
        far_d = jnp.where(swap, ld, rd)
        descend = lh | rh

        # push far child when both children hit
        sp_idx = jnp.clip(st.sp, 0, stack_depth - 1)
        snodes = jnp.where(
            both[:, None]
            & (jnp.arange(stack_depth)[None, :] == sp_idx[:, None]),
            far_node[:, None],
            st.snodes,
        )
        sdist = jnp.where(
            both[:, None]
            & (jnp.arange(stack_depth)[None, :] == sp_idx[:, None]),
            far_d[:, None],
            st.sdist,
        )
        sp = st.sp + both.astype(jnp.int32)

        # ---- decide next node: descend / pop / finish ----
        need_pop = do_leaf | do_pop_only | (do_inner & ~descend)
        can_pop = sp > 0
        sp_post = jnp.where(need_pop & can_pop, sp - 1, sp)
        pop_idx = jnp.clip(sp_post, 0, stack_depth - 1)
        popped_node = select_along(snodes, pop_idx)
        popped_d = select_along(sdist, pop_idx)

        node = jnp.where(
            do_inner & descend, near_node, jnp.where(need_pop, popped_node, st.node)
        )
        dist = jnp.where(
            do_inner & descend, near_d, jnp.where(need_pop, popped_d, st.dist)
        )
        active = st.active & ~(need_pop & ~can_pop)
        if nee:
            # any-hit semantics: stop the lane on first confirmed hit
            # (ray-integrator.cpp:121).
            active = active & ~upd

        return S(
            st.iters + 1, node, dist, sp_post, snodes, sdist, t, tri,
            uu, vv, back, any_hit, active, atten,
        )

    st = lax.while_loop(cond, body, st)
    return Hit(st.t, st.tri, st.u, st.v, st.back, st.atten, st.any_hit)


def intersect_brute_pallas(
    scene: CompiledScene,
    meta: SceneMeta,
    o,
    d,
    t_max,
    t_min: float = 1e-3,
    interpret: bool = False,
):
    """Pallas fused brute-force kernel (kernels/pallas_intersect.py)."""
    from yart_tpu.kernels.pallas_intersect import LANE, SUBLANES, brute_pallas

    n = o.shape[0]
    block = LANE * SUBLANES
    pad = (-n) % block
    t_max_v = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        t_max_v = jnp.pad(t_max_v, (0, pad))
    t, u, v, back, tri = brute_pallas(
        scene.tri_pack, o, d, t_max_v, meta.n_tris, t_min, interpret=interpret
    )
    if pad:
        t, u, v, back, tri = (a[:n] for a in (t, u, v, back, tri))
    hit = tri >= 0
    return Hit(t, tri, u, v, back, jnp.ones((n, 3), jnp.float32), hit)




def _part1by2(x):
    """Spread 10 bits of x with two zero bits between each (Morton helper,
    32-bit version of src/math/math.hpp:122-130)."""
    x = jnp.asarray(x, jnp.uint32) & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _coherence_key(scene, o, d):
    """Sort key grouping rays by direction octant then origin Morton cell —
    rays in a chunk then traverse similar node sequences."""
    octant = (
        (d[:, 0] < 0).astype(jnp.uint32)
        | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
        | ((d[:, 2] < 0).astype(jnp.uint32) << 2)
    )
    lo = scene.scene_center - scene.scene_radius
    inv = 1.0 / jnp.maximum(2.0 * scene.scene_radius, 1e-20)
    q = jnp.clip((o - lo) * inv, 0.0, 1.0)
    cell = (q * 127.0).astype(jnp.uint32)
    morton = (
        _part1by2(cell[:, 0])
        | (_part1by2(cell[:, 1]) << 1)
        | (_part1by2(cell[:, 2]) << 2)
    )
    return (octant << 21) | morton




def intersect_bvh8(
    scene: CompiledScene,
    meta: SceneMeta,
    o,
    d,
    t_max,
    t_min: float = 1e-3,
    nee: bool = False,
    alpha_seed=None,
    max_iters: int = 0,
):
    """8-wide BVH traversal: one packed row gather tests EIGHT child boxes.

    TPU rationale: the per-iteration cost of the lockstep loop is dominated
    by whole-wavefront state traffic, which is independent of arity — an
    8-ary tree visits ~3x fewer nodes per ray than the binary one, so the
    fixed per-iteration costs amortize. Children are distance-sorted with a
    one-hot permutation (near-first descent); the rest of the contract
    matches intersect_bvh/ray-integrator.cpp:84-160.

    Encoded child refs (scene/bvh.py collapse_bvh8): >=0 inner group id,
    -1 empty, <=-2 leaf with v = -(ref+2), first = v >> 4, count = v & 15.
    """
    n = o.shape[0]
    width = 8
    stack_depth = (width - 1) * meta.wide_depth + 2
    max_leaf = meta.max_leaf
    if max_iters <= 0:
        max_iters = int(scene.wide_pack.shape[0]) * 2 + 64

    idir = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    odir = -o * idir

    ROOT_ENC = jnp.int32(0)
    arange_s = jnp.arange(stack_depth, dtype=jnp.int32)[None, :]
    arange_w = jnp.arange(width, dtype=jnp.int32)[None, :]

    class S8(NamedTuple):
        iters: jnp.ndarray
        cur: jnp.ndarray  # [N] encoded ref
        sp: jnp.ndarray
        senc: jnp.ndarray  # [N, S]
        sdist: jnp.ndarray  # [N, S]
        t: jnp.ndarray
        tri: jnp.ndarray
        u: jnp.ndarray
        v: jnp.ndarray
        back: jnp.ndarray
        any_hit: jnp.ndarray
        active: jnp.ndarray
        atten: jnp.ndarray
        cur_dist: jnp.ndarray

    t0 = jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32)
    st = S8(
        iters=jnp.asarray(0, jnp.int32),
        cur=jnp.full((n,), ROOT_ENC, jnp.int32),
        sp=jnp.zeros((n,), jnp.int32),
        senc=jnp.zeros((n, stack_depth), jnp.int32),
        sdist=jnp.zeros((n, stack_depth), jnp.float32),
        t=t0,
        tri=jnp.full((n,), -1, jnp.int32),
        u=jnp.zeros((n,), jnp.float32),
        v=jnp.zeros((n,), jnp.float32),
        back=jnp.zeros((n,), jnp.bool_),
        any_hit=jnp.zeros((n,), jnp.bool_),
        active=jnp.ones((n,), bool) & (t0 > t_min),
        atten=jnp.ones((n, 3), jnp.float32),
        cur_dist=jnp.full((n,), t_min, jnp.float32),
    )

    def cond(st: S8):
        return jnp.any(st.active) & (st.iters < max_iters)

    def body(st: S8):
        is_leaf = st.cur <= -2
        near_ok = st.cur_dist < st.t
        do_leaf = st.active & is_leaf & near_ok
        do_inner = st.active & (~is_leaf) & near_ok

        # ---- leaf ----
        vdec = -(st.cur + 2)
        first = jnp.where(is_leaf, vdec >> 4, 0)
        count = jnp.where(do_leaf, vdec & 15, 0)
        got, t2, u2, v2, b2, id2, atten = _closest_in_leaf(
            scene, meta, o, d, t_min, st.t, first, count, max_leaf,
            nee=nee, alpha_seed=alpha_seed, atten=st.atten,
        )
        upd = do_leaf & got
        t = jnp.where(upd, t2, st.t)
        tri = jnp.where(upd, id2, st.tri)
        uu = jnp.where(upd, u2, st.u)
        vv = jnp.where(upd, v2, st.v)
        back = jnp.where(upd, b2, st.back)
        any_hit = st.any_hit | upd

        # ---- inner: one row gather, 8 box tests ----
        row = scene.wide_pack[jnp.maximum(st.cur, 0)]  # [N, 56]
        boxes = row[:, :48].reshape(n, width, 6)
        enc8 = lax.bitcast_convert_type(row[:, 48:56], jnp.int32)  # [N, 8]
        tlo = jnp.minimum(
            boxes[..., 0:3] * idir[:, None, :] + odir[:, None, :],
            boxes[..., 3:6] * idir[:, None, :] + odir[:, None, :],
        )
        thi = jnp.maximum(
            boxes[..., 0:3] * idir[:, None, :] + odir[:, None, :],
            boxes[..., 3:6] * idir[:, None, :] + odir[:, None, :],
        )
        c0 = jnp.maximum(jnp.max(tlo, axis=-1), t_min)  # [N, 8]
        c1 = jnp.minimum(jnp.min(thi, axis=-1), t[:, None])
        chit = (c1 >= c0) & (enc8 != -1) & do_inner[:, None]

        # distance-sort the children (near first) with a one-hot permutation
        dist8 = jnp.where(chit, c0, F32_MAX)
        order = jnp.argsort(dist8, axis=-1)  # [N, 8]
        perm = (order[:, :, None] == arange_w[:, None, :]).astype(jnp.float32)
        s_enc = jnp.einsum(
            "noi,ni->no", perm, enc8.astype(jnp.float32)
        ).astype(jnp.int32)
        s_dist = jnp.einsum("noi,ni->no", perm, dist8)
        n_hit = jnp.sum(chit, axis=-1).astype(jnp.int32)  # [N]

        descend = do_inner & (n_hit > 0)
        next_cur_inner = s_enc[:, 0]
        next_dist_inner = s_dist[:, 0]

        # push children 1..n_hit-1, FAR first so pops come near-first:
        # slot j (0-based from sp) receives sorted child (n_hit - 1 - j).
        n_push = jnp.maximum(n_hit - 1, 0)
        rel = arange_s - st.sp[:, None]  # [N, S]
        write = (rel >= 0) & (rel < n_push[:, None]) & descend[:, None]
        src = n_hit[:, None] - 1 - rel  # sorted index to place at slot
        src_c = jnp.clip(src, 0, width - 1)
        sel = (src_c[:, :, None] == arange_w[:, None, :])
        val_enc = jnp.sum(
            jnp.where(sel, s_enc[:, None, :], 0), axis=-1
        )
        val_dist = jnp.sum(jnp.where(sel, s_dist[:, None, :], 0.0), axis=-1)
        senc = jnp.where(write, val_enc, st.senc)
        sdist = jnp.where(write, val_dist, st.sdist)
        sp = st.sp + jnp.where(descend, n_push, 0)

        # ---- pop / terminate ----
        need_pop = do_leaf | (st.active & ~near_ok) | (do_inner & ~descend)
        can_pop = sp > 0
        sp_post = jnp.where(need_pop & can_pop, sp - 1, sp)
        pop_idx = jnp.clip(sp_post, 0, stack_depth - 1)
        popped_enc = select_along(senc, pop_idx)
        popped_d = select_along(sdist, pop_idx)

        cur = jnp.where(
            descend, next_cur_inner, jnp.where(need_pop, popped_enc, st.cur)
        )
        cur_dist = jnp.where(
            descend, next_dist_inner, jnp.where(need_pop, popped_d, st.cur_dist)
        )
        active = st.active & ~(need_pop & ~can_pop)
        if nee:
            active = active & ~upd

        return S8(
            st.iters + 1, cur, sp_post, senc, sdist, t, tri, uu, vv, back,
            any_hit, active, atten, cur_dist,
        )

    st = lax.while_loop(cond, body, st)
    return Hit(st.t, st.tri, st.u, st.v, st.back, st.atten, st.any_hit)


def intersect_bvh_sorted(
    scene: CompiledScene,
    meta: SceneMeta,
    o,
    d,
    t_max,
    t_min: float = 1e-3,
    nee: bool = False,
    alpha_seed=None,
    chunk: int = 65536,
):
    """Coherence-sorted, chunked BVH traversal.

    The lockstep while_loop runs as many iterations as the WORST lane in the
    whole wavefront. Sorting rays by (direction octant, origin Morton cell)
    and traversing independent chunks lets each chunk terminate at its own
    maximum — coherent chunks finish in far fewer iterations. Results are
    scattered back, so output is lane-exact vs intersect_bvh.
    """
    n = o.shape[0]
    if n < 2 * chunk:
        return intersect_bvh8(
            scene, meta, o, d, t_max, t_min=t_min, nee=nee,
            alpha_seed=alpha_seed,
        )
    pad = (-n) % chunk
    t_max_v = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    seed_v = (
        jnp.broadcast_to(alpha_seed, (n,))
        if alpha_seed is not None
        else jnp.zeros((n,), jnp.uint32)
    )

    key = _coherence_key(scene, o, d)
    order = jnp.argsort(key)
    if pad:
        # Padded entries point one past the end; gathers clip (harmless
        # because t_max < t_min kills them) and the scatter-back drops them.
        order_p = jnp.concatenate(
            [order, jnp.full((pad,), n, order.dtype)]
        )
        live = jnp.concatenate(
            [jnp.ones((n,), bool), jnp.zeros((pad,), bool)]
        )
    else:
        order_p = order
        live = None

    safe = jnp.minimum(order_p, n - 1)
    o_s = o[safe]
    d_s = d[safe]
    t_s = t_max_v[safe]
    if live is not None:
        t_s = jnp.where(live, t_s, -1.0)  # padded lanes terminate instantly
    seed_s = seed_v[safe]

    n_chunks = o_s.shape[0] // chunk

    def run(args):
        oc, dc, tc, sc = args
        return intersect_bvh8(
            scene, meta, oc, dc, tc, t_min=t_min, nee=nee, alpha_seed=sc
        )

    hits = lax.map(
        run,
        (
            o_s.reshape(n_chunks, chunk, 3),
            d_s.reshape(n_chunks, chunk, 3),
            t_s.reshape(n_chunks, chunk),
            seed_s.reshape(n_chunks, chunk),
        ),
    )
    flat = jax.tree_util.tree_map(
        lambda a: a.reshape((n_chunks * chunk,) + a.shape[2:]), hits
    )

    # Scatter back to original lane order; padded entries (index n) drop.
    def unsort(a):
        out = jnp.zeros((n,) + a.shape[1:], a.dtype)
        return out.at[order_p].set(a, mode="drop")

    return Hit(*(unsort(a) for a in flat))



def _intersect_instanced(
    scene: CompiledScene,
    meta: SceneMeta,
    o,
    d,
    t_max,
    t_min: float = 1e-3,
    nee: bool = False,
    alpha_seed=None,
):
    """Closest hit (or NEE any-hit) over instanced prototypes.

    The reference's testNode transforms the ray into each node's object
    space and recurses (src/cpu/ray-integrator.cpp:20-54). Here: a static
    Python loop over instances, each running the full prototype traversal
    (whatever path intersect() picks for that prototype's size) on rays
    mapped by the UNNORMALIZED inverse transform — o' = M^-1 o,
    d' = M^-1_lin d keeps the hit parameter t equal to the world
    parameter, so closest-hit merging across instances is a plain min and
    the running best t tightens every later instance's traversal.
    Triangle ids are lifted to the per-instance virtual range
    (scene.inst_tri_base) so shading can recover (instance, shade row,
    light) from tri_aux. NEE composition across instances is order-free:
    occlusion ORs, transparent-shadow attenuation multiplies
    (mis-integrator.cpp:135-148 semantics)."""
    n = o.shape[0]
    t_max_v = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    best = Hit(
        t_max_v,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), bool),
        jnp.ones((n, 3), jnp.float32),
        jnp.zeros((n,), bool),
    )
    atten = jnp.ones((n, 3), jnp.float32)
    for i, p in enumerate(meta.inst_proto):
        row = scene.inst_rows[i]  # static index: [40]
        rm = row[0:12].reshape(3, 4)
        o_l = o @ rm[:, :3].T + rm[:, 3]
        d_l = d @ rm[:, :3].T
        h = intersect(
            scene.protos[p], meta.proto_metas[p], o_l, d_l,
            t_max_v if nee else best.t, t_min=t_min, nee=nee,
            alpha_seed=alpha_seed,
        )
        if nee:
            atten = atten * h.attenuation
            best = best._replace(mask=best.mask | h.mask)
        else:
            better = h.mask & (h.t < best.t)
            best = Hit(
                jnp.where(better, h.t, best.t),
                jnp.where(better, h.tri + scene.inst_tri_base[i], best.tri),
                jnp.where(better, h.u, best.u),
                jnp.where(better, h.v, best.v),
                jnp.where(better, h.back_side, best.back_side),
                best.attenuation,
                best.mask | better,
            )
    if nee:
        best = best._replace(attenuation=atten)
    return best

def intersect(
    scene: CompiledScene,
    meta: SceneMeta,
    o,
    d,
    t_max,
    t_min: float = 1e-3,
    nee: bool = False,
    use_bvh: Optional[bool] = None,
    alpha_seed=None,
):
    """Dispatch: fused Pallas brute kernel for small scenes on TPU, XLA brute
    for small scenes elsewhere, bin-trace (render/bintrace.py) for large
    scenes, stack BVH traversal for large scenes needing per-hit gates
    (stochastic alpha, NEE transparency). Instanced scenes traverse each
    instance's prototype in object space and merge (see
    _intersect_instanced)."""
    if meta.n_instances:
        from yart_tpu.render.blocktrace import (
            MAX_CLUSTERS,
            intersect_blocktrace,
            intersect_blocktrace_gated,
        )

        # Single fused-kernel pass over all instance-clusters on TPU;
        # otherwise (CPU, or past the 12-bit cluster-id cap) a static
        # per-instance loop over the prototype traversals.
        if (
            0 < meta.n_inst_clusters <= MAX_CLUSTERS
            and jax.default_backend() == "tpu"
        ):
            gates = meta.any_alpha or (nee and meta.any_transparent)
            if not gates:
                return intersect_blocktrace(
                    scene, meta, o, d, t_max, t_min=t_min, nee=nee
                )
            return intersect_blocktrace_gated(
                scene, meta, o, d, t_max, t_min=t_min, nee=nee,
                alpha_seed=alpha_seed,
            )
        return _intersect_instanced(
            scene, meta, o, d, t_max, t_min=t_min, nee=nee,
            alpha_seed=alpha_seed,
        )
    gates = meta.any_alpha or (nee and meta.any_transparent)
    if use_bvh is None:
        use_bvh = meta.n_tris > 4096
    if not use_bvh:
        if not gates and jax.default_backend() == "tpu":
            return intersect_brute_pallas(
                scene, meta, o, d, t_max, t_min=t_min
            )
        return intersect_brute(
            scene, meta, o, d, t_max, t_min=t_min, nee=nee,
            alpha_seed=alpha_seed,
        )
    # Big scenes: block-trace Pallas pipeline on TPU (render/blocktrace.py;
    # 12-bit cluster ids cap it at 4096 clusters — beyond that, and on other
    # backends, fall back to the XLA traversals).
    from yart_tpu.render.blocktrace import MAX_CLUSTERS

    if meta.n_clusters <= MAX_CLUSTERS and jax.default_backend() == "tpu":
        from yart_tpu.render.blocktrace import (
            intersect_blocktrace,
            intersect_blocktrace_gated,
        )

        if not gates:
            return intersect_blocktrace(
                scene, meta, o, d, t_max, t_min=t_min, nee=nee
            )
        return intersect_blocktrace_gated(
            scene, meta, o, d, t_max, t_min=t_min, nee=nee,
            alpha_seed=alpha_seed,
        )
    if not gates:
        from yart_tpu.render.bintrace import intersect_bintrace

        return intersect_bintrace(
            scene, meta, o, d, t_max, t_min=t_min, nee=nee
        )
    if o.shape[0] >= 131072:
        return intersect_bvh_sorted(
            scene, meta, o, d, t_max, t_min=t_min, nee=nee,
            alpha_seed=alpha_seed,
        )
    return intersect_bvh8(
        scene, meta, o, d, t_max, t_min=t_min, nee=nee, alpha_seed=alpha_seed
    )
