"""Pallas kernel equivalence vs the XLA reference implementation
(SURVEY.md §7.2.4: each kernel gets an XLA-reference impl and an
equivalence test). Runs in interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp

from yart_tpu.render.intersect import intersect_brute, intersect_brute_pallas
from tests.test_intersect import make_scene, random_rays


def test_pallas_brute_matches_xla():
    scene, meta = make_scene(300)
    rng = np.random.default_rng(11)
    o, d = random_rays(rng, 2048)

    hx = jax.jit(lambda o, d: intersect_brute(scene, meta, o, d, 1e30))(o, d)
    hp = intersect_brute_pallas(scene, meta, o, d, 1e30, interpret=True)

    np.testing.assert_array_equal(np.asarray(hx.mask), np.asarray(hp.mask))
    m = np.asarray(hx.mask)
    np.testing.assert_allclose(
        np.asarray(hx.t)[m], np.asarray(hp.t)[m], rtol=1e-5, atol=1e-5
    )
    same = np.asarray(hx.tri)[m] == np.asarray(hp.tri)[m]
    assert same.mean() > 0.999, same.mean()
    np.testing.assert_allclose(
        np.asarray(hx.u)[m], np.asarray(hp.u)[m], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(hx.back_side)[m], np.asarray(hp.back_side)[m]
    )


def test_pallas_brute_lane_padding():
    scene, meta = make_scene(64)
    rng = np.random.default_rng(5)
    o, d = random_rays(rng, 1000)  # not a multiple of 2048
    hx = jax.jit(lambda o, d: intersect_brute(scene, meta, o, d, 1e30))(o, d)
    hp = intersect_brute_pallas(scene, meta, o, d, 1e30, interpret=True)
    np.testing.assert_array_equal(np.asarray(hx.mask), np.asarray(hp.mask))
    m = np.asarray(hx.mask)
    np.testing.assert_allclose(
        np.asarray(hx.t)[m], np.asarray(hp.t)[m], rtol=1e-5, atol=1e-5
    )
