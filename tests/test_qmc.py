import jax.numpy as jnp
import numpy as np

from yart_tpu.ops import qmc

M64 = (1 << 64) - 1


def as_u64_pairs(vals):
    vals = np.asarray(vals, np.uint64)
    return qmc.u64(
        jnp.asarray((vals >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
    )


def pairs_to_int(p):
    return (np.asarray(p.hi, np.uint64) << np.uint64(32)) | np.asarray(p.lo, np.uint64)


def py_mixbits(v):
    v ^= v >> 31
    v = (v * 0x7FB5D329728EA185) & M64
    v ^= v >> 27
    v = (v * 0x81DADEF4BC2DD44D) & M64
    v ^= v >> 33
    return v


def test_u64_ops_vs_python():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 63, size=256, dtype=np.uint64)
    b = rng.integers(0, 1 << 63, size=256, dtype=np.uint64)
    pa, pb = as_u64_pairs(a), as_u64_pairs(b)

    np.testing.assert_array_equal(pairs_to_int(qmc.u64_xor(pa, pb)), a ^ b)
    for k in (0, 1, 7, 31, 32, 33, 52, 63):
        np.testing.assert_array_equal(pairs_to_int(qmc.u64_shr(pa, k)), a >> np.uint64(k))
        np.testing.assert_array_equal(
            pairs_to_int(qmc.u64_shl(pa, k)),
            (a.astype(object) << k & M64).astype(np.uint64),
        )
    got = pairs_to_int(qmc.u64_mul(pa, pb))
    want = np.asarray([(int(x) * int(y)) & M64 for x, y in zip(a, b)], np.uint64)
    np.testing.assert_array_equal(got, want)


def test_u64_shr_dyn():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 63, size=64, dtype=np.uint64)
    k = rng.integers(0, 64, size=64, dtype=np.uint32)
    got = pairs_to_int(qmc.u64_shr_dyn(as_u64_pairs(a), jnp.asarray(k)))
    want = np.asarray([int(x) >> int(s) for x, s in zip(a, k)], np.uint64)
    np.testing.assert_array_equal(got, want)


def test_mixbits_matches_python():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 1 << 63, size=128, dtype=np.uint64)
    got = pairs_to_int(qmc.mix_bits64(as_u64_pairs(a)))
    want = np.asarray([py_mixbits(int(x)) for x in a], np.uint64)
    np.testing.assert_array_equal(got, want)


def test_mod24():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 63, size=256, dtype=np.uint64)
    got = np.asarray(qmc.u64_mod24(as_u64_pairs(a)))
    np.testing.assert_array_equal(got, (a % np.uint64(24)).astype(np.uint32))


def test_reverse_bits32():
    v = jnp.asarray([0x1, 0x80000000, 0x12345678], jnp.uint32)
    got = np.asarray(qmc.reverse_bits32(v))
    want = np.asarray(
        [int(f"{x:032b}"[::-1], 2) for x in [0x1, 0x80000000, 0x12345678]], np.uint32
    )
    np.testing.assert_array_equal(got, want)


def test_morton_roundtrip_bits():
    x = jnp.asarray([0, 1, 2, 0xFFFF], jnp.uint32)
    y = jnp.asarray([0, 1, 3, 0xFFFF], jnp.uint32)
    m = np.asarray(qmc.encode_morton2_32(x, y), np.uint64)

    def py_morton(x, y):
        out = 0
        for i in range(16):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    want = [py_morton(int(a), int(b)) for a, b in zip(np.asarray(x), np.asarray(y))]
    np.testing.assert_array_equal(m, np.asarray(want, np.uint64))


def test_murmur_hash_dim_known_property():
    # Deterministic and distinct across dims
    hs = {qmc.hash_dim(d) for d in range(64)}
    assert len(hs) == 64


def test_sobol_matrix_dim1_first_entries():
    m = qmc.sobol_matrix_dim1()
    assert m[0] == 0x80000000 and m[1] == 0xC0000000 and m[2] == 0xA0000000
    assert m[3] == 0xF0000000 and m[4] == 0x88000000 and m[5] == 0xCC000000


def test_sobol_dim01_stratification():
    """First 2^k unscrambled Sobol points are (0,2)-stratified: exactly one
    point per elementary interval."""
    n = 64
    idx = qmc.u64(jnp.zeros(n, jnp.uint32), jnp.arange(n, dtype=jnp.uint32))
    d0 = np.asarray(qmc.reverse_bits32(idx.lo), np.uint64) / 2.0 ** 32
    d1 = np.asarray(qmc.sobol_sample_dim1(idx, jnp.asarray(qmc.sobol_matrix_dim1())), np.uint64) / 2.0 ** 32
    # one point in each of the 64 cells of any 2^a x 2^b grid with a+b=6
    for a in range(7):
        b = 6 - a
        cells = (np.floor(d0 * (1 << a)).astype(int), np.floor(d1 * (1 << b)).astype(int))
        seen = set(zip(*cells))
        assert len(seen) == 64, (a, b)


def test_hash_sampler_uniform():
    s = qmc.HashSampler(16)
    px = jnp.arange(1 << 14, dtype=jnp.uint32) % 128
    py = jnp.arange(1 << 14, dtype=jnp.uint32) // 128
    st = s.init_lanes(px, py, jnp.zeros(1 << 14, jnp.uint32))
    v = np.asarray(s.get1d(st, 3))
    assert np.all((v >= 0) & (v < 1))
    np.testing.assert_allclose(v.mean(), 0.5, atol=5e-3)
    np.testing.assert_allclose(v.var(), 1.0 / 12, atol=2e-3)


def test_zsobol_deterministic_and_uniform():
    s = qmc.ZSobolSampler(64, (128, 128))
    n = 1 << 12
    rng = np.random.default_rng(5)
    px = jnp.asarray(rng.integers(0, 128, n), jnp.uint32)
    py = jnp.asarray(rng.integers(0, 128, n), jnp.uint32)
    si = jnp.asarray(rng.integers(0, 64, n), jnp.uint32)
    st = s.init_lanes(px, py, si)
    v1 = np.asarray(s.get1d(st, 7))
    v2 = np.asarray(s.get1d(st, 7))
    np.testing.assert_array_equal(v1, v2)  # pure function of inputs
    assert np.all((v1 >= 0) & (v1 < 1))
    np.testing.assert_allclose(v1.mean(), 0.5, atol=2e-2)
    u2 = np.asarray(s.get2d(st, 9))
    assert u2.shape == (n, 2)
    np.testing.assert_allclose(u2.mean(0), 0.5, atol=2e-2)


def test_zsobol_pixel_stratification():
    """Within one pixel, the spp samples of a 2D dim should be well
    stratified (better than random): check 8x8 strata occupancy for 64 spp."""
    spp = 64
    s = qmc.ZSobolSampler(spp, (64, 64))
    px = jnp.full((spp,), 11, jnp.uint32)
    py = jnp.full((spp,), 23, jnp.uint32)
    si = jnp.arange(spp, dtype=jnp.uint32)
    st = s.init_lanes(px, py, si)
    u = np.asarray(s.get2d(st, 4))
    cells = set(zip((u[:, 0] * 8).astype(int), (u[:, 1] * 8).astype(int)))
    # Perfect stratification gives 64 distinct cells; Owen-scrambled Sobol
    # should stay close. Random sampling averages ~40.
    assert len(cells) >= 56


def test_zsobol_dims_decorrelated():
    spp = 256
    s = qmc.ZSobolSampler(spp, (16, 16))
    px = jnp.full((spp,), 3, jnp.uint32)
    py = jnp.full((spp,), 5, jnp.uint32)
    st = s.init_lanes(px, py, jnp.arange(spp, dtype=jnp.uint32))
    a = np.asarray(s.get1d(st, 11))
    b = np.asarray(s.get1d(st, 12))
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.15


def test_scramblers_preserve_uniformity():
    v = jnp.arange(0, 1 << 16, dtype=jnp.uint32) * jnp.uint32(65521)
    for name in ("null", "binary", "fastowen"):
        out = qmc._SCRAMBLERS[name](v, jnp.uint32(0xDEADBEEF))
        f = np.asarray(qmc.u32_to_unit_float(out))
        np.testing.assert_allclose(f.mean(), 0.5, atol=5e-3)


def test_owen_exact_scrambler_nests():
    """Owen scrambling preserves elementary intervals: scrambling the first
    16 van-der-Corput points keeps them stratified in 16ths."""
    idx = jnp.arange(16, dtype=jnp.uint32)
    v = qmc.reverse_bits32(idx)
    out = qmc.scramble_owen_exact(v, jnp.uint32(12345))
    f = np.sort(np.asarray(qmc.u32_to_unit_float(out)))
    strata = np.floor(f * 16).astype(int)
    assert len(set(strata.tolist())) == 16


def test_stratified_sampler():
    """Stratified: each pixel's n samples hit each stratum exactly once per
    dim, uniform in [0,1) (sampler.cpp:19-44)."""
    import jax.numpy as jnp
    from yart_tpu.ops.qmc import make_sampler

    spp = 16
    s = make_sampler("stratified", spp)
    st = s.init_lanes(
        jnp.zeros(spp, jnp.uint32),
        jnp.zeros(spp, jnp.uint32),
        jnp.arange(spp, dtype=jnp.uint32),
    )
    v = np.asarray(s.get1d(st, jnp.uint32(5)))
    assert v.shape == (spp,)
    assert (v >= 0).all() and (v < 1).all()
    # one sample per stratum
    strata = np.sort((v * spp).astype(int))
    np.testing.assert_array_equal(strata, np.arange(spp))

    v2 = np.asarray(s.get2d(st, jnp.uint32(9)))
    assert ((v2 >= 0) & (v2 < 1)).all()
    cells = np.sort(
        (v2[:, 1] * s.y_samples).astype(int) * s.x_samples
        + (v2[:, 0] * s.x_samples).astype(int)
    )
    np.testing.assert_array_equal(cells, np.arange(spp))
    # different dims decorrelate the permutation
    v3 = np.asarray(s.get1d(st, jnp.uint32(7)))
    assert not np.array_equal((v3 * spp).astype(int), (v * spp).astype(int))


def test_zsobol_scrambler_variants():
    from yart_tpu.ops.qmc import make_sampler

    import jax.numpy as jnp

    for kind in ("zsobol:null", "zsobol:binary", "zsobol:fastowen", "zsobol:owen"):
        s = make_sampler(kind, 8, (16, 16))
        st = s.init_lanes(
            jnp.arange(4, dtype=jnp.uint32),
            jnp.arange(4, dtype=jnp.uint32),
            jnp.zeros(4, jnp.uint32),
        )
        v = np.asarray(s.get2d(st, jnp.uint32(0)))
        assert ((v >= 0) & (v < 1)).all(), kind
