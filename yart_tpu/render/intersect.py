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
from jax import lax

from yart_tpu.scene.types import CompiledScene, SceneMeta

F32_MAX = jnp.float32(3.0e38)
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


def _closest_in_leaf(scene, o, d, t_min, t_cur, first, n_valid, max_leaf):
    """Test max_leaf consecutive triangles starting at `first` per lane.

    Returns (any_valid, t, u, v, back, tri) of the closest valid hit.
    o, d: [N, 3]; first, n_valid: [N]; result lanes with no valid hit get
    t = t_cur.
    """
    lanes = first.shape[0]
    offs = jnp.arange(max_leaf, dtype=jnp.int32)  # [L]
    tri_ids = first[:, None] + offs[None, :]  # [N, L]
    in_leaf = offs[None, :] < n_valid[:, None]
    tri_ids = jnp.clip(tri_ids, 0, scene.tri_v.shape[0] - 1)

    tv = scene.tri_v[tri_ids]  # [N, L, 3]
    p0 = scene.positions[tv[..., 0]]  # [N, L, 3]
    p1 = scene.positions[tv[..., 1]]
    p2 = scene.positions[tv[..., 2]]

    valid, t, u, v, back = _mt_test(
        o[:, None, :], d[:, None, :], p0, p1, p2, t_min, t_cur[:, None]
    )
    valid = valid & in_leaf
    t = jnp.where(valid, t, F32_MAX)
    best = jnp.argmin(t, axis=-1)  # [N]
    take = lambda a: jnp.take_along_axis(a, best[:, None], axis=-1)[:, 0]
    any_valid = jnp.any(valid, axis=-1)
    return (
        any_valid,
        jnp.where(any_valid, take(t), t_cur),
        take(u),
        take(v),
        take(back),
        take(tri_ids),
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
    chunk: int = 512,
):
    """Reference oracle: test every triangle, chunked to bound memory."""
    n = o.shape[0]
    n_tris = meta.n_tris
    n_chunks = -(-n_tris // chunk)

    def body(carry, ci):
        t_cur, tri, u, v, back, any_hit = carry
        first = ci * chunk
        valid_n = jnp.minimum(n_tris - first, chunk)
        got, t2, u2, v2, b2, id2 = _closest_in_leaf(
            scene,
            o,
            d,
            t_min,
            t_cur,
            jnp.full((n,), first, jnp.int32),
            jnp.full((n,), valid_n, jnp.int32),
            chunk,
        )
        upd = got & (t2 < t_cur)
        return (
            jnp.where(upd, t2, t_cur),
            jnp.where(upd, id2, tri),
            jnp.where(upd, u2, u),
            jnp.where(upd, v2, v),
            jnp.where(upd, b2, back),
            any_hit | got,
        ), None

    init = (
        jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.bool_),
        jnp.zeros((n,), jnp.bool_),
    )
    (t, tri, u, v, back, any_hit), _ = lax.scan(
        body, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return Hit(t, tri, u, v, back, jnp.ones((n, 3), jnp.float32), any_hit)


def intersect_bvh(
    scene: CompiledScene,
    meta: SceneMeta,
    o,
    d,
    t_max,
    t_min: float = 1e-3,
    nee: bool = False,
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

    idir = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    odir = -o * idir

    def box_test(node_ids, t_cur):
        bmin = bvh.node_min[node_ids]  # [N, 3]
        bmax = bvh.node_max[node_ids]
        return _slab_test(bmin * idir + odir, bmax * idir + odir, t_min, t_cur)

    t0 = jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32)
    root_hit, root_d = box_test(jnp.zeros((n,), jnp.int32), t0)

    class S(NamedTuple):
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

    st = S(
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
    )

    def cond(st: S):
        return jnp.any(st.active)

    def body(st: S):
        count = bvh.count[st.node]
        is_leaf = count > 0
        near_ok = st.dist < st.t
        do_leaf = st.active & is_leaf & near_ok
        do_inner = st.active & (~is_leaf) & near_ok
        do_pop_only = st.active & ~near_ok

        # ---- leaf: fixed-width masked triangle test ----
        first = bvh.left[st.node]
        got, t2, u2, v2, b2, id2 = _closest_in_leaf(
            scene, o, d, t_min, st.t, first, jnp.where(do_leaf, count, 0), max_leaf
        )
        upd = do_leaf & got
        t = jnp.where(upd, t2, st.t)
        tri = jnp.where(upd, id2, st.tri)
        uu = jnp.where(upd, u2, st.u)
        vv = jnp.where(upd, v2, st.v)
        back = jnp.where(upd, b2, st.back)
        any_hit = st.any_hit | upd

        # ---- inner: test both children, order near-first ----
        l_child = bvh.left[st.node]
        r_child = l_child + 1
        lh, ld = box_test(l_child, t)
        rh, rd = box_test(r_child, t)
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
        popped_node = jnp.take_along_axis(snodes, pop_idx[:, None], axis=1)[:, 0]
        popped_d = jnp.take_along_axis(sdist, pop_idx[:, None], axis=1)[:, 0]

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
            node, dist, sp_post, snodes, sdist, t, tri, uu, vv, back, any_hit, active
        )

    st = lax.while_loop(cond, body, st)
    return Hit(
        st.t,
        st.tri,
        st.u,
        st.v,
        st.back,
        jnp.ones((n, 3), jnp.float32),
        st.any_hit,
    )


def intersect(
    scene: CompiledScene,
    meta: SceneMeta,
    o,
    d,
    t_max,
    t_min: float = 1e-3,
    nee: bool = False,
    use_bvh: Optional[bool] = None,
):
    """Dispatch: brute force for tiny scenes, BVH otherwise."""
    if use_bvh is None:
        use_bvh = meta.n_tris > 256
    fn = intersect_bvh if use_bvh else intersect_brute
    return fn(scene, meta, o, d, t_max, t_min=t_min, nee=nee)
