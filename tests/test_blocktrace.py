"""Block-trace pipeline (render/blocktrace.py): agreement with the brute
oracle (closest hit, NEE, window overflow, non-multiple lane counts) and
gated-path equivalence with the stack traversal (stochastic alpha and
transparent shadows share the per-(lane, tri) hash stream)."""

import numpy as np
import jax.numpy as jnp
import pytest

from yart_tpu.render.blocktrace import (
    intersect_blocktrace,
    intersect_blocktrace_gated,
)
from yart_tpu.render.intersect import intersect_brute, intersect_bvh8

from test_bintrace import _compile, _random_mesh, _rays


@pytest.fixture(scope="module")
def scene_rays():
    rng = np.random.default_rng(5)
    pos, tri = _random_mesh(rng, 700)
    scene, meta = _compile(pos, tri, cluster_size=64)
    assert meta.n_clusters > 8  # multi-cluster, else the test is trivial
    o, d = _rays(rng, 2048)
    return scene, meta, o, d


def _check_match(hb, hr, t_max=100.0):
    m_b, m_r = np.asarray(hb.mask), np.asarray(hr.mask)
    np.testing.assert_array_equal(m_b, m_r)
    tb, tr = np.asarray(hb.t), np.asarray(hr.t)
    np.testing.assert_allclose(tb[m_b], tr[m_b], rtol=2e-5, atol=2e-5)
    same = (np.asarray(hb.tri) == np.asarray(hr.tri)) & m_b
    # Formulation differences may flip exact ulp ties between triangles.
    assert same.sum() >= 0.999 * m_b.sum()
    np.testing.assert_allclose(
        np.asarray(hb.u)[same], np.asarray(hr.u)[same], rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(hb.v)[same], np.asarray(hr.v)[same], rtol=1e-3, atol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(hb.back_side)[same], np.asarray(hr.back_side)[same]
    )


@pytest.mark.parametrize("fused", [True, False])
def test_closest_hit_vs_brute(scene_rays, fused):
    scene, meta, o, d = scene_rays
    hb = intersect_blocktrace(
        scene, meta, o, d, 100.0, fused=fused, interpret=True
    )
    hr = intersect_brute(scene, meta, o, d, 100.0)
    _check_match(hb, hr)


@pytest.mark.parametrize("block,kbatch", [(256, 1), (128, 3)])
def test_shape_knobs_vs_brute(scene_rays, block, kbatch):
    """The ablation knobs (tools/ablate_shape.py: block size, t-loop key
    batch) are pure scheduling — any combination returns the same hits."""
    scene, meta, o, d = scene_rays
    hb = intersect_blocktrace(
        scene, meta, o, d, 100.0, block=block, kbatch=kbatch, interpret=True
    )
    hr = intersect_brute(scene, meta, o, d, 100.0)
    _check_match(hb, hr)


def test_window_overflow_small_k(scene_rays):
    """k=2 forces many continuation-window rounds; results are identical."""
    scene, meta, o, d = scene_rays
    hb = intersect_blocktrace(
        scene, meta, o, d, 100.0, k=2, max_rounds=512, fused=False,
        interpret=True,
    )
    hr = intersect_brute(scene, meta, o, d, 100.0)
    _check_match(hb, hr)


@pytest.mark.parametrize("fused", [True, False])
def test_nee_any_hit(scene_rays, fused):
    scene, meta, o, d = scene_rays
    hb = intersect_blocktrace(
        scene, meta, o, d, 8.0, nee=True, fused=fused, interpret=True
    )
    hr = intersect_brute(scene, meta, o, d, 8.0, nee=True)
    np.testing.assert_array_equal(
        np.asarray(hb.mask), np.asarray(hr.mask)
    )


def test_fused_variants_agree(scene_rays):
    """The fused kernel's four lowering variants (pack VMEM-resident vs
    DMA-streamed, MXU vs broadcast projections) give identical hits."""
    import jax.numpy as jnp

    from yart_tpu.kernels.pallas_fusedtrace import fused_trace_pallas

    scene, meta, o, d = scene_rays
    n = 2048
    rays = jnp.concatenate(
        [o, d, jnp.full((n, 1), 100.0), jnp.zeros((n, 1))], axis=1
    )
    outs = {}
    for pv in (True, False):
        for mx in (True, False):
            outs[(pv, mx)] = np.asarray(
                fused_trace_pallas(
                    rays, scene.clus_box, scene.clus_pack, 256,
                    meta.cluster_size, 1e-3, pack_vmem=pv, mxu_test=mx,
                    interpret=True,
                )
            )
    ref = outs[(True, False)]
    for key, got in outs.items():
        np.testing.assert_allclose(
            got[:, 0], ref[:, 0], rtol=2e-5, atol=2e-5, err_msg=str(key)
        )
        same_tri = (
            got[:, 4].view(np.int32) == ref[:, 4].view(np.int32)
        ).mean()
        assert same_tri >= 0.999, (key, same_tri)


@pytest.mark.parametrize("kbatch", [1, 4, 8])
def test_tfuse_bit_exact(scene_rays, kbatch):
    """The wide-fused t-loop (one op chain over all kbatch clusters,
    tfuse=True) is BIT-exact vs the sequential per-cluster fold: same f32
    formulas, rounding-free min, lowest-lane tie-break == first-k-wins."""
    from yart_tpu.kernels.pallas_fusedtrace import fused_trace_pallas

    scene, meta, o, d = scene_rays
    n = 2048
    rays = jnp.concatenate(
        [o, d, jnp.full((n, 1), 100.0), jnp.zeros((n, 1))], axis=1
    )
    kw = dict(kbatch=kbatch, interpret=True)
    a = np.asarray(fused_trace_pallas(
        rays, scene.clus_box, scene.clus_pack, 256,
        meta.cluster_size, 1e-3, **kw,
    ))
    b = np.asarray(fused_trace_pallas(
        rays, scene.clus_box, scene.clus_pack, 256,
        meta.cluster_size, 1e-3, tfuse=True, **kw,
    ))
    np.testing.assert_array_equal(
        a[:, 0].view(np.int32), b[:, 0].view(np.int32)
    )
    np.testing.assert_array_equal(
        a[:, 4].view(np.int32), b[:, 4].view(np.int32)
    )


def test_lane_count_not_block_multiple(scene_rays):
    scene, meta, o, d = scene_rays
    o2, d2 = o[:1000], d[:1000]
    hb = intersect_blocktrace(scene, meta, o2, d2, 100.0, interpret=True)
    hr = intersect_brute(scene, meta, o2, d2, 100.0)
    _check_match(hb, hr)


@pytest.mark.parametrize("fused", [True, False])
def test_floor_recast(scene_rays, fused):
    """Casting again with floor = first hit t yields strictly farther hits
    that match the brute result among t > floor."""
    scene, meta, o, d = scene_rays
    h1 = intersect_blocktrace(
        scene, meta, o, d, 100.0, fused=fused, interpret=True
    )
    h2 = intersect_blocktrace(
        scene, meta, o, d, 100.0, floor=h1.t, fused=fused, interpret=True
    )
    m1, m2 = np.asarray(h1.mask), np.asarray(h2.mask)
    assert (np.asarray(h2.t)[m2] > np.asarray(h1.t)[m2]).all()
    assert (~m1 & m2).sum() == 0  # no second hit without a first


def _gated_fixture():
    from yart_tpu.scene.procedural import textured_box_scene

    scene, meta = textured_box_scene().compile()
    rng = np.random.default_rng(9)
    n = 512
    o = np.asarray([0.0, 1.2, 3.0], np.float32) + rng.normal(
        size=(n, 3)
    ).astype(np.float32) * 0.2
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] -= 1.5  # bias toward the boxes
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    seed = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    return scene, meta, jnp.asarray(o), jnp.asarray(d), jnp.asarray(seed)


def test_gated_alpha_matches_stack_path():
    scene, meta, o, d, seed = _gated_fixture()
    assert meta.any_alpha
    hb = intersect_blocktrace_gated(
        scene, meta, o, d, 100.0, alpha_seed=seed, interpret=True
    )
    hr = intersect_bvh8(scene, meta, o, d, 100.0, alpha_seed=seed)
    np.testing.assert_array_equal(np.asarray(hb.mask), np.asarray(hr.mask))
    m = np.asarray(hb.mask)
    np.testing.assert_allclose(
        np.asarray(hb.t)[m], np.asarray(hr.t)[m], rtol=2e-5, atol=2e-5
    )
    same = (np.asarray(hb.tri) == np.asarray(hr.tri)) & m
    assert same.sum() >= 0.995 * m.sum()


def test_gated_nee_transparent_matches_stack_path():
    scene, meta, o, d, seed = _gated_fixture()
    assert meta.any_transparent
    hb = intersect_blocktrace_gated(
        scene, meta, o, d, 6.0, nee=True, alpha_seed=seed, interpret=True
    )
    hr = intersect_bvh8(scene, meta, o, d, 6.0, nee=True, alpha_seed=seed)
    np.testing.assert_array_equal(np.asarray(hb.mask), np.asarray(hr.mask))
    un = ~np.asarray(hb.mask)  # attenuation contract: unblocked rays only
    np.testing.assert_allclose(
        np.asarray(hb.attenuation)[un],
        np.asarray(hr.attenuation)[un],
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.parametrize("rekey,minleft", [(1, 1), (2, 8), (4, 16)])
def test_rekey_bit_exact(scene_rays, rekey, minleft):
    """The per-ray re-keyed t-loop (round 4: periodic drop of queue
    clusters no entering ray can still improve) is bit-identical to the
    plain block-global loop — pruned clusters provably cannot beat any
    ray's current best (kernels/pallas_fusedtrace.py rekey)."""
    scene, meta, o, d = scene_rays
    h0 = intersect_blocktrace(
        scene, meta, o, d, 100.0, rekey=0, interpret=True
    )
    h1 = intersect_blocktrace(
        scene, meta, o, d, 100.0, rekey=rekey, minleft=minleft,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(h1.t))
    np.testing.assert_array_equal(np.asarray(h0.tri), np.asarray(h1.tri))
    np.testing.assert_array_equal(np.asarray(h0.u), np.asarray(h1.u))
    np.testing.assert_array_equal(
        np.asarray(h0.back_side), np.asarray(h1.back_side)
    )


def test_rekey_nee_bit_exact(scene_rays):
    scene, meta, o, d = scene_rays
    h0 = intersect_blocktrace(
        scene, meta, o, d, 100.0, nee=True, rekey=0, interpret=True
    )
    h1 = intersect_blocktrace(
        scene, meta, o, d, 100.0, nee=True, rekey=2, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(h0.mask), np.asarray(h1.mask)
    )


@pytest.mark.parametrize("nee", [False, True])
def test_rekey_q16_bit_exact(scene_rays, nee):
    """Quantized u16 emask (round 5): the re-key drop test compares
    top-16-bit truncated entries against a one-step-rounded-UP current t,
    so it is strictly over-inclusive — results must stay bit-identical
    to both the f32-emask rekey and the plain loop."""
    scene, meta, o, d = scene_rays
    h0 = intersect_blocktrace(
        scene, meta, o, d, 100.0, nee=nee, rekey=0, interpret=True
    )
    hq = intersect_blocktrace(
        scene, meta, o, d, 100.0, nee=nee, rekey=2, rekey_q16=True,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(hq.t))
    np.testing.assert_array_equal(np.asarray(h0.tri), np.asarray(hq.tri))
    np.testing.assert_array_equal(
        np.asarray(h0.mask), np.asarray(hq.mask)
    )
