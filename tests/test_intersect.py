"""BVH traversal vs brute-force equivalence (SURVEY.md §4.3: BVH-vs-brute
intersection equivalence on random meshes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yart_tpu.scene.builder import SceneBuilder
from yart_tpu.scene.bvh import build_bvh
from yart_tpu.render.intersect import intersect_brute, intersect_bvh


def random_soup(rng, n_tris, spread=2.0, size=0.4):
    base = rng.uniform(-spread, spread, (n_tris, 1, 3))
    offs = rng.uniform(-size, size, (n_tris, 3, 3))
    verts = (base + offs).reshape(-1, 3).astype(np.float32)
    idx = np.arange(n_tris * 3, dtype=np.int32).reshape(-1, 3)
    return verts, idx


def make_scene(n_tris, seed=0):
    rng = np.random.default_rng(seed)
    verts, idx = random_soup(rng, n_tris)
    b = SceneBuilder()
    m = b.add_material(base_color=(0.5, 0.5, 0.5, 1.0))
    b.add_mesh(verts, idx, m)
    return b.compile()


def random_rays(rng, n):
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    target = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("n_tris", [5, 64, 500])
def test_bvh_matches_brute(n_tris):
    scene, meta = make_scene(n_tris)
    rng = np.random.default_rng(42)
    o, d = random_rays(rng, 256)

    hb = jax.jit(lambda o, d: intersect_brute(scene, meta, o, d, 1e30))(o, d)
    hv = jax.jit(lambda o, d: intersect_bvh(scene, meta, o, d, 1e30))(o, d)

    np.testing.assert_array_equal(np.asarray(hb.mask), np.asarray(hv.mask))
    m = np.asarray(hb.mask)
    np.testing.assert_allclose(
        np.asarray(hb.t)[m], np.asarray(hv.t)[m], rtol=1e-5, atol=1e-6
    )
    # Same triangle except when two tris are at (nearly) the same t.
    if m.sum():
        same_tri = np.asarray(hb.tri)[m] == np.asarray(hv.tri)[m]
        assert same_tri.mean() > 0.99


def test_nee_any_hit():
    scene, meta = make_scene(300)
    rng = np.random.default_rng(7)
    o, d = random_rays(rng, 128)
    hb = jax.jit(lambda o, d: intersect_brute(scene, meta, o, d, 1e30))(o, d)
    hv = jax.jit(lambda o, d: intersect_bvh(scene, meta, o, d, 1e30, nee=True))(o, d)
    # Any-hit must agree on hit/miss, and its t must be >= the closest t.
    np.testing.assert_array_equal(np.asarray(hb.mask), np.asarray(hv.mask))
    m = np.asarray(hb.mask)
    assert np.all(np.asarray(hv.t)[m] >= np.asarray(hb.t)[m] - 1e-5)


def test_tmax_clipping():
    scene, meta = make_scene(100)
    rng = np.random.default_rng(3)
    o, d = random_rays(rng, 128)
    far = jax.jit(lambda o, d: intersect_bvh(scene, meta, o, d, 1e30))(o, d)
    m = np.asarray(far.mask)
    t = np.asarray(far.t)
    # Clip just below each closest hit: those lanes must now miss.
    t_clip = jnp.asarray(np.where(m, t * 0.99, 1e30))
    near = jax.jit(lambda o, d, tm: intersect_bvh(scene, meta, o, d, tm))(o, d, t_clip)
    assert not np.any(np.asarray(near.mask) & m & (np.asarray(near.t) >= t))


def test_bvh_build_sane():
    rng = np.random.default_rng(0)
    verts, idx = random_soup(rng, 1000)
    v0, v1, v2 = verts[idx[:, 0]], verts[idx[:, 1]], verts[idx[:, 2]]
    hb = build_bvh(v0, v1, v2, max_leaf=4)
    # Every triangle appears exactly once in leaf order.
    assert np.array_equal(np.sort(hb.tri_order), np.arange(1000))
    leaves = hb.count > 0
    assert np.all(hb.count[leaves] <= 4)
    spans = [
        set(range(int(l), int(l + c)))
        for l, c in zip(hb.left[leaves], hb.count[leaves])
    ]
    covered = set().union(*spans)
    assert covered == set(range(1000))
    # Parent AABBs contain children.
    inner = np.nonzero(hb.count == 0)[0]
    for ni in inner[:50]:
        l = hb.left[ni]
        for c in (l, l + 1):
            assert np.all(hb.node_min[ni] <= hb.node_min[c] + 1e-5)
            assert np.all(hb.node_max[ni] >= hb.node_max[c] - 1e-5)


def test_sorted_chunked_matches_plain():
    from yart_tpu.render.intersect import intersect_bvh_sorted

    scene, meta = make_scene(600, seed=2)
    rng = np.random.default_rng(9)
    o, d = random_rays(rng, 700)
    plain = jax.jit(lambda o, d: intersect_bvh(scene, meta, o, d, 1e30))(o, d)
    sorted_h = jax.jit(
        lambda o, d: intersect_bvh_sorted(
            scene, meta, o, d, 1e30, chunk=256
        )
    )(o, d)
    np.testing.assert_array_equal(
        np.asarray(plain.mask), np.asarray(sorted_h.mask)
    )
    m = np.asarray(plain.mask)
    np.testing.assert_allclose(
        np.asarray(plain.t)[m], np.asarray(sorted_h.t)[m], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(plain.tri)[m], np.asarray(sorted_h.tri)[m]
    )


def test_bvh8_matches_binary():
    from yart_tpu.render.intersect import intersect_bvh8

    for n_tris, seed in ((500, 0), (2000, 3), (50, 7)):
        scene, meta = make_scene(n_tris, seed=seed)
        rng = np.random.default_rng(seed + 100)
        o, d = random_rays(rng, 512)
        h2 = jax.jit(lambda o, d: intersect_bvh(scene, meta, o, d, 1e30))(o, d)
        h8 = jax.jit(lambda o, d: intersect_bvh8(scene, meta, o, d, 1e30))(o, d)
        np.testing.assert_array_equal(
            np.asarray(h2.mask), np.asarray(h8.mask), err_msg=f"tris={n_tris}"
        )
        m = np.asarray(h2.mask)
        np.testing.assert_allclose(
            np.asarray(h2.t)[m], np.asarray(h8.t)[m], rtol=1e-5, atol=1e-6
        )
        same = np.asarray(h2.tri)[m] == np.asarray(h8.tri)[m]
        assert same.mean() > 0.995, same.mean()


def test_bvh8_nee_any_hit():
    from yart_tpu.render.intersect import intersect_bvh8

    scene, meta = make_scene(400, seed=1)
    rng = np.random.default_rng(8)
    o, d = random_rays(rng, 256)
    closest = jax.jit(lambda o, d: intersect_bvh(scene, meta, o, d, 1e30))(o, d)
    anyhit = jax.jit(
        lambda o, d: intersect_bvh8(scene, meta, o, d, 1e30, nee=True)
    )(o, d)
    np.testing.assert_array_equal(
        np.asarray(closest.mask), np.asarray(anyhit.mask)
    )
