"""Native C++ BVH builder vs numpy oracle."""

import numpy as np
import pytest

from yart_tpu.native import build_bvh_native, get_library
from yart_tpu.scene.bvh import build_bvh, sah_cost


def soup(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-2, 2, (n, 1, 3))
    tri = base + rng.uniform(-0.3, 0.3, (n, 3, 3))
    v = tri.astype(np.float32)
    return v[:, 0], v[:, 1], v[:, 2]


@pytest.mark.skipif(get_library() is None, reason="native toolchain unavailable")
def test_native_valid_tree():
    v0, v1, v2 = soup(3000)
    hb = build_bvh_native(v0, v1, v2, max_leaf=4)
    assert hb is not None
    n = 3000
    # permutation validity
    assert np.array_equal(np.sort(hb.tri_order), np.arange(n))
    leaves = hb.count > 0
    assert np.all(hb.count[leaves] <= 4)
    # leaf ranges cover all triangles exactly once
    total = hb.count[leaves].sum()
    assert total == n
    # parent boxes contain child boxes
    inner = np.nonzero(~leaves)[0]
    for ni in inner[:: max(1, len(inner) // 64)]:
        l = hb.left[ni]
        for c in (l, l + 1):
            assert np.all(hb.node_min[ni] <= hb.node_min[c] + 1e-4)
            assert np.all(hb.node_max[ni] >= hb.node_max[c] - 1e-4)
    # triangle AABBs are inside their leaf boxes
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    for ni in np.nonzero(leaves)[0][:: max(1, int(leaves.sum()) // 64)]:
        for t in hb.tri_order[hb.left[ni] : hb.left[ni] + hb.count[ni]]:
            assert np.all(lo[t] >= hb.node_min[ni] - 1e-4)
            assert np.all(hi[t] <= hb.node_max[ni] + 1e-4)


@pytest.mark.skipif(get_library() is None, reason="native toolchain unavailable")
def test_native_quality_close_to_numpy():
    v0, v1, v2 = soup(5000, seed=3)
    hb_n = build_bvh_native(v0, v1, v2, max_leaf=4)
    hb_py = build_bvh(v0, v1, v2, max_leaf=4)
    c_n = sah_cost(hb_n)
    c_py = sah_cost(hb_py)
    # Same algorithm family: tree quality within 25% of the oracle.
    assert c_n < c_py * 1.25, (c_n, c_py)


@pytest.mark.skipif(get_library() is None, reason="native toolchain unavailable")
def test_native_bvh8_matches_python():
    from yart_tpu.native import collapse_bvh8_native
    from yart_tpu.scene.bvh import collapse_bvh8

    v0, v1, v2 = soup(3000, seed=4)
    hb = build_bvh(v0, v1, v2, max_leaf=4)
    py8 = collapse_bvh8(hb)
    na8 = collapse_bvh8_native(hb)
    assert na8 is not None
    assert na8.depth == py8.depth
    assert na8.child.shape == py8.child.shape
    np.testing.assert_array_equal(na8.child, py8.child)
    np.testing.assert_allclose(na8.boxes, py8.boxes)
