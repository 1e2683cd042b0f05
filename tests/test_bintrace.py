"""Bin-trace pipeline: cluster cut invariants, pair-kernel equivalence, and
end-to-end agreement with the brute-force oracle (including forced K
overflow and axis-aligned entry-distance ties)."""

import numpy as np
import jax.numpy as jnp
import pytest

from yart_tpu.scene.builder import SceneBuilder
from yart_tpu.scene.bvh import build_bvh
from yart_tpu.scene.clusters import build_coarse, cut_clusters
from yart_tpu.render.bintrace import intersect_bintrace
from yart_tpu.render.intersect import intersect_brute


def _random_mesh(rng, n_quads, spread=4.0):
    """Soup of randomly oriented small quads (2 tris each)."""
    c = rng.uniform(-spread, spread, size=(n_quads, 3))
    a = rng.normal(size=(n_quads, 3))
    b = rng.normal(size=(n_quads, 3))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b -= a * np.sum(a * b, axis=1, keepdims=True)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    s = rng.uniform(0.2, 0.7, size=(n_quads, 1))
    p0 = c - a * s - b * s
    p1 = c + a * s - b * s
    p2 = c + a * s + b * s
    p3 = c - a * s + b * s
    pos = np.concatenate([p0, p1, p2, p3]).astype(np.float32)
    i = np.arange(n_quads)
    tri = np.concatenate(
        [
            np.stack([i, i + n_quads, i + 2 * n_quads], axis=1),
            np.stack([i, i + 2 * n_quads, i + 3 * n_quads], axis=1),
        ]
    ).astype(np.int32)
    return pos, tri


def _compile(pos, tri, cluster_size=128):
    b = SceneBuilder()
    m = b.add_material(roughness=0.5)
    b.add_mesh(pos, tri, m)
    return b.compile(cluster_size=cluster_size)


def _rays(rng, n, spread=6.0):
    o = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_cluster_cut_invariants():
    rng = np.random.default_rng(0)
    pos, tri = _random_mesh(rng, 900)
    v0, v1, v2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
    hb = build_bvh(v0, v1, v2)
    cut = cut_clusters(hb, 64)
    assert cut.count.max() <= 64
    # Ranges cover [0, T) exactly once.
    got = np.zeros(tri.shape[0], np.int32)
    for f, c in zip(cut.first, cut.count):
        got[f : f + c] += 1
    assert (got == 1).all()
    # Cluster AABBs contain their triangles (in BVH leaf order).
    order = hb.tri_order
    w0, w1, w2 = v0[order], v1[order], v2[order]
    lo = np.minimum(np.minimum(w0, w1), w2)
    hi = np.maximum(np.maximum(w0, w1), w2)
    for ci in range(cut.first.shape[0]):
        f, c = cut.first[ci], cut.count[ci]
        assert (lo[f : f + c] >= cut.lo[ci] - 1e-4).all()
        assert (hi[f : f + c] <= cut.hi[ci] + 1e-4).all()
    coarse = build_coarse(cut)
    # Coarse permutation preserves the cover.
    got2 = np.zeros(tri.shape[0], np.int32)
    for f, c in zip(coarse.cut.first, coarse.cut.count):
        got2[f : f + c] += 1
    assert (got2 == 1).all()
    assert coarse.wide_pack.shape[1] == 56


def test_pair_kernel_interpret_matches_ref():
    from yart_tpu.kernels.pallas_cluster import (
        B_PAIRS,
        cluster_pairs_pallas,
        cluster_pairs_ref,
    )

    rng = np.random.default_rng(1)
    pos, tri = _random_mesh(rng, 400)
    scene, meta = _compile(pos, tri)
    n_blocks = 4
    p = n_blocks * B_PAIRS
    o, d = _rays(rng, p)
    x = jnp.concatenate(
        [o, d, jnp.full((p, 1), 100.0), jnp.zeros((p, 1))], axis=1
    )
    cid = jnp.asarray(
        rng.integers(0, meta.n_clusters, size=n_blocks), jnp.int32
    )
    first = scene.clus_first[cid]
    live = jnp.asarray([1, 1, 0, 1], jnp.int32)
    a = cluster_pairs_pallas(
        scene.clus_pack, cid, first, live, x, meta.cluster_size, 1e-3,
        interpret=True,
    )
    b = cluster_pairs_ref(
        scene.clus_pack, cid, first, live, x, meta.cluster_size, 1e-3
    )
    # The two lowerings may fuse the FMA chains differently, so ulp-level t
    # ties can select a different (equally close) triangle. Require t to
    # agree tightly everywhere, and everything else to agree wherever the
    # same triangle won (which must be nearly always).
    ta, ua, va, ba, ia = (np.asarray(z) for z in a)
    tb, ub, vb, bb_, ib = (np.asarray(z) for z in b)
    np.testing.assert_allclose(ta, tb, rtol=1e-5, atol=1e-5)
    same = ia == ib
    assert same.mean() > 0.999
    same &= ia >= 0  # u/v/back are unspecified garbage on miss lanes
    np.testing.assert_allclose(ua[same], ub[same], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(va[same], vb[same], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(ba[same], bb_[same])


def _compare_vs_brute(scene, meta, o, d, k, t_max=100.0, nee=False):
    hb = intersect_bintrace(scene, meta, o, d, t_max, k=k, nee=nee)
    hr = intersect_brute(scene, meta, o, d, t_max, nee=nee)
    m_b = np.asarray(hb.mask)
    m_r = np.asarray(hr.mask)
    np.testing.assert_array_equal(m_b, m_r)
    tb = np.asarray(hb.t)[m_r]
    tr = np.asarray(hr.t)[m_r]
    np.testing.assert_allclose(tb, tr, rtol=2e-4, atol=2e-4)
    if not nee:
        same_tri = np.asarray(hb.tri)[m_r] == np.asarray(hr.tri)[m_r]
        # Different-triangle picks are only legal at (near-)equal t.
        assert same_tri.mean() > 0.995
        np.testing.assert_allclose(
            np.asarray(hb.u)[m_r][same_tri],
            np.asarray(hr.u)[m_r][same_tri],
            rtol=1e-3, atol=1e-3,
        )
        np.testing.assert_array_equal(
            np.asarray(hb.back_side)[m_r][same_tri],
            np.asarray(hr.back_side)[m_r][same_tri],
        )


def test_bintrace_matches_brute_random():
    rng = np.random.default_rng(2)
    pos, tri = _random_mesh(rng, 1500)  # 3000 tris, ~24+ clusters
    scene, meta = _compile(pos, tri)
    assert meta.n_clusters > 8
    o, d = _rays(rng, 2048)
    _compare_vs_brute(scene, meta, o, d, k=12)


def test_bintrace_overflow_rounds():
    """K far below clusters-per-ray: the continuation window must still
    converge to the brute answer."""
    rng = np.random.default_rng(3)
    pos, tri = _random_mesh(rng, 1500)
    scene, meta = _compile(pos, tri)
    o, d = _rays(rng, 512)
    _compare_vs_brute(scene, meta, o, d, k=2)


def test_bintrace_tied_entry_distances():
    """Stacked axis-aligned quads: many clusters at identical entry
    distance; the lexicographic window must not stall."""
    rng = np.random.default_rng(4)
    layers = []
    tris = []
    nv = 0
    for zi in range(40):
        z = 0.1 * zi
        for gx in range(4):
            for gy in range(4):
                x0, y0 = gx - 2.0, gy - 2.0
                layers.append(
                    [
                        (x0, y0, z), (x0 + 1, y0, z),
                        (x0 + 1, y0 + 1, z), (x0, y0 + 1, z),
                    ]
                )
                tris.append([(nv, nv + 1, nv + 2), (nv, nv + 2, nv + 3)])
                nv += 4
    pos = np.asarray(layers, np.float32).reshape(-1, 3)
    tri = np.asarray(tris, np.int32).reshape(-1, 3)
    scene, meta = _compile(pos, tri, cluster_size=128)
    n = 256
    # Rays along +z through the stack: every layer box at a tied distance.
    o = np.stack(
        [
            rng.uniform(-2, 2, n),
            rng.uniform(-2, 2, n),
            np.full(n, -1.0),
        ],
        axis=1,
    ).astype(np.float32)
    d = np.tile(np.asarray([[0.005, 0.005, 1.0]], np.float32), (n, 1))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    _compare_vs_brute(scene, meta, jnp.asarray(o), jnp.asarray(d), k=2)


def test_bintrace_nee_any_hit():
    rng = np.random.default_rng(5)
    pos, tri = _random_mesh(rng, 1000)
    scene, meta = _compile(pos, tri)
    o, d = _rays(rng, 1024)
    hb = intersect_bintrace(scene, meta, o, d, 50.0, k=4, nee=True)
    hr = intersect_brute(scene, meta, o, d, 50.0, nee=True)
    np.testing.assert_array_equal(np.asarray(hb.mask), np.asarray(hr.mask))
