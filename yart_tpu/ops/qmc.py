"""Counter-based deterministic samplers: hash RNG and ZSobol QMC.

The reference's samplers (yart ``src/core/sampler.hpp``, ``scrambler.hpp``,
``rng.hpp``) are stateful objects; here every draw is a *pure function* of
``(pixel, sample_index, dimension)`` so any device in the mesh can generate
any lane's stream reproducibly — the property that makes image-exactness
under resharding possible (SURVEY.md §2.6).

Two samplers:

- ``HashSampler``: 32-bit finalizer-hash RNG (analog of NaiveSampler,
  sampler.cpp:5-17, but counter-based instead of xoshiro-stateful).
- ``ZSobolSampler``: the pbrt-style Z-ordered Sobol' sampler with base-4
  digit permutations and per-dimension Owen-style scrambling
  (sampler.hpp:72-174). 64-bit Morton/sample indices are emulated as
  (hi, lo) uint32 pairs because TPUs have no native u64 lanes.

Per-dimension constants (Murmur hashes of the dimension counter) are
precomputed host-side into small tables indexed by a traced dim, so the
device never hashes 64-bit scalars.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
ONE_MINUS_EPS = np.float32(1.0 - 2.0 ** -24)

# ---------------------------------------------------------------------------
# 32-bit scalar hashing (device)
# ---------------------------------------------------------------------------


def mix32(x):
    """Low-bias 32-bit finalizer (Wellons); used for the hash RNG stream."""
    x = jnp.asarray(x, U32)
    x ^= x >> 16
    x *= U32(0x7FEB352D)
    x ^= x >> 15
    x *= U32(0x846CA68B)
    x ^= x >> 16
    return x


def reverse_bits32(n):
    """Bit reversal (src/math/math.hpp:102-109)."""
    n = jnp.asarray(n, U32)
    n = (n << 16) | (n >> 16)
    n = ((n & U32(0x00FF00FF)) << 8) | ((n & U32(0xFF00FF00)) >> 8)
    n = ((n & U32(0x0F0F0F0F)) << 4) | ((n & U32(0xF0F0F0F0)) >> 4)
    n = ((n & U32(0x33333333)) << 2) | ((n & U32(0xCCCCCCCC)) >> 2)
    n = ((n & U32(0x55555555)) << 1) | ((n & U32(0xAAAAAAAA)) >> 1)
    return n


def left_shift2_32(x):
    """Interleave zeros between bits of a 16-bit value
    (32-bit version of src/math/math.hpp:122-130)."""
    x = jnp.asarray(x, U32) & U32(0xFFFF)
    x = (x ^ (x << 8)) & U32(0x00FF00FF)
    x = (x ^ (x << 4)) & U32(0x0F0F0F0F)
    x = (x ^ (x << 2)) & U32(0x33333333)
    x = (x ^ (x << 1)) & U32(0x55555555)
    return x


def encode_morton2_32(x, y):
    """Morton-interleave two <=16-bit coords into 32 bits (math.hpp:132-134)."""
    return (left_shift2_32(y) << 1) | left_shift2_32(x)


def u32_to_unit_float(v):
    """uint32 -> float in [0, 1): float(v) * 2^-32 then min with
    oneMinusEpsilon (sampler.hpp:152). The uint->float conversion rounds to
    nearest, exactly like the reference's C cast — a top-24-bit TRUNCATION
    differs by one 2^-24 ulp on ~half of all draws (found by the
    `oracle probedraws` bit-level stream comparison)."""
    # Split conversion instead of a direct u32->f32 cast: Mosaic (the
    # Pallas TPU compiler) cannot lower "uint32 -> float32", and this form
    # is BIT-IDENTICAL to the native cast — both 16-bit halves convert
    # exactly, the *65536 is a mantissa shift, and the single add performs
    # the one correct rounding the direct cast would.
    hi = jnp.right_shift(v, jnp.uint32(16)).astype(jnp.int32)
    lo = (v & jnp.uint32(0xFFFF)).astype(jnp.int32)
    f32v = hi.astype(jnp.float32) * np.float32(65536.0) + lo.astype(
        jnp.float32
    )
    f = f32v * np.float32(2.0 ** -32)
    return jnp.minimum(f, ONE_MINUS_EPS)


# ---------------------------------------------------------------------------
# 64-bit (hi, lo) uint32 pair emulation (device)
# ---------------------------------------------------------------------------


class U64(NamedTuple):
    hi: jnp.ndarray
    lo: jnp.ndarray


def u64(hi, lo) -> U64:
    return U64(jnp.asarray(hi, U32), jnp.asarray(lo, U32))


def u64_from_u32(lo) -> U64:
    lo = jnp.asarray(lo, U32)
    return U64(jnp.zeros_like(lo), lo)


def u64_xor(a: U64, b: U64) -> U64:
    return U64(a.hi ^ b.hi, a.lo ^ b.lo)


def u64_shr(a: U64, k: int) -> U64:
    """Logical right shift by a static amount."""
    if k == 0:
        return a
    if k >= 64:
        z = jnp.zeros_like(a.lo)
        return U64(z, z)
    if k >= 32:
        return U64(jnp.zeros_like(a.hi), a.hi >> (k - 32))
    return U64(a.hi >> k, (a.lo >> k) | (a.hi << (32 - k)))


def u64_shl(a: U64, k: int) -> U64:
    if k == 0:
        return a
    if k >= 64:
        z = jnp.zeros_like(a.lo)
        return U64(z, z)
    if k >= 32:
        return U64(a.lo << (k - 32), jnp.zeros_like(a.lo))
    return U64((a.hi << k) | (a.lo >> (32 - k)), a.lo << k)


def u64_shr_dyn(a: U64, k) -> U64:
    """Right shift by a traced amount in [0, 63]."""
    k = jnp.asarray(k, U32)
    big = k >= 32
    ks = jnp.where(big, k - 32, k)
    # Shift within-word; (32 - ks) can be 32 which is UB on u32 shifts, so
    # handle ks == 0 via where.
    lo_small = jnp.where(
        ks == 0, a.lo, (a.lo >> ks) | (a.hi << (U32(32) - ks))
    )
    hi_small = a.hi >> ks
    lo_big = a.hi >> ks
    hi_big = jnp.zeros_like(a.hi)
    return U64(jnp.where(big, hi_big, hi_small), jnp.where(big, lo_big, lo_small))


def umulhi32(a, b):
    """High 32 bits of a 32x32 multiply, via 16-bit limbs."""
    a = jnp.asarray(a, U32)
    b = jnp.asarray(b, U32)
    a0, a1 = a & U32(0xFFFF), a >> 16
    b0, b1 = b & U32(0xFFFF), b >> 16
    lo = a0 * b0
    mid1 = a1 * b0
    mid2 = a0 * b1
    carry = ((lo >> 16) + (mid1 & U32(0xFFFF)) + (mid2 & U32(0xFFFF))) >> 16
    return a1 * b1 + (mid1 >> 16) + (mid2 >> 16) + carry


def u64_mul(a: U64, b: U64) -> U64:
    """Low 64 bits of a 64x64 product."""
    lo = a.lo * b.lo
    hi = umulhi32(a.lo, b.lo) + a.lo * b.hi + a.hi * b.lo
    return U64(hi, lo)


def u64_mul_const(a: U64, c: int) -> U64:
    ch, cl = (c >> 32) & 0xFFFFFFFF, c & 0xFFFFFFFF
    lo = a.lo * U32(cl)
    hi = umulhi32(a.lo, U32(cl)) + a.lo * U32(ch) + a.hi * U32(cl)
    return U64(hi, lo)


def mix_bits64(v: U64) -> U64:
    """pbrt's mixBits 64-bit finalizer (src/core/rng.hpp:93-100)."""
    v = u64_xor(v, u64_shr(v, 31))
    v = u64_mul_const(v, 0x7FB5D329728EA185)
    v = u64_xor(v, u64_shr(v, 27))
    v = u64_mul_const(v, 0x81DADEF4BC2DD44D)
    v = u64_xor(v, u64_shr(v, 33))
    return v


def u64_mod24(a: U64) -> jnp.ndarray:
    """(hi*2^32 + lo) mod 24; 2^32 mod 24 == 16."""
    return ((a.hi % U32(24)) * U32(16) + a.lo % U32(24)) % U32(24)


# ---------------------------------------------------------------------------
# Host-side 64-bit hashing for per-dimension constants
# ---------------------------------------------------------------------------

_M64 = (1 << 64) - 1


def _murmur64a(key_bytes: bytes, seed: int = 0) -> int:
    """MurmurHash64A over a byte string (src/core/rng.hpp:25-69), host-side."""
    m = 0xC6A4A7935BD1E995
    r = 47
    h = (seed ^ (len(key_bytes) * m)) & _M64
    n8 = len(key_bytes) // 8 * 8
    for off in range(0, n8, 8):
        k = int.from_bytes(key_bytes[off : off + 8], "little")
        k = (k * m) & _M64
        k ^= k >> r
        k = (k * m) & _M64
        h = ((h ^ k) * m) & _M64
    tail = key_bytes[n8:]
    if tail:
        h ^= int.from_bytes(tail, "little")
        h = (h * m) & _M64
    h ^= h >> r
    h = (h * m) & _M64
    h ^= h >> r
    return h


def hash_dim(dim: int) -> int:
    """The reference's variadic hash() applied to a single uint32
    (src/core/rng.hpp:85-91): murmur over 4 bytes, but note the hash buffer is
    rounded up to whole uint64s and murmur is invoked with the *true* length,
    so only the 4 real bytes participate."""
    return _murmur64a(int(dim).to_bytes(4, "little"), 0)


# ---------------------------------------------------------------------------
# Sobol' generator matrices
# ---------------------------------------------------------------------------

SOBOL_MATRIX_BITS = 52  # index bits supported, like pbrt's 52-bit matrices


@functools.lru_cache()
def sobol_matrix_dim1() -> np.ndarray:
    """Generator matrix (52 columns of 32-bit direction numbers) for Sobol'
    dimension 1 (primitive polynomial x+1). Computed from the classic
    direction-number recurrence m_k = 2*m_{k-1} XOR m_{k-1}, m_1 = 1 — not
    copied from any table. Dimension 0 is the van-der-Corput radical inverse
    handled by bit reversal (sampler.hpp:142-146)."""
    m = [1]
    for _ in range(2, SOBOL_MATRIX_BITS + 1):
        m.append((m[-1] << 1) ^ m[-1])
    v = []
    for k, mk in enumerate(m, start=1):
        if k <= 32:
            v.append((mk << (32 - k)) & 0xFFFFFFFF)
        else:
            v.append(mk >> (k - 32))
    return np.asarray(v, np.uint32)


def sobol_sample_dim1(index: U64, matrix) -> jnp.ndarray:
    """v = C * d over GF(2) for the 52-bit index pair; returns uint32."""
    v = jnp.zeros_like(index.lo)
    for i in range(32):
        bit = (index.lo >> i) & U32(1)
        v ^= bit * matrix[i]
    for i in range(SOBOL_MATRIX_BITS - 32):
        bit = (index.hi >> i) & U32(1)
        v ^= bit * matrix[32 + i]
    return v


# ---------------------------------------------------------------------------
# Scramblers (src/core/scrambler.hpp:15-87)
# ---------------------------------------------------------------------------


def scramble_null(v, seed):
    return v


def scramble_binary_permute(v, seed):
    return v ^ seed


def scramble_fast_owen(v, seed):
    """pbrt's hash-based Owen scrambling approximation (scrambler.hpp:53-69).
    This is the reference default (src/main.cpp:16)."""
    v = reverse_bits32(v)
    v ^= v * U32(0x3D20ADEA)
    v += seed
    v *= (seed >> 16) | U32(1)
    v ^= v * U32(0x05526C56)
    v ^= v * U32(0x53A22864)
    return reverse_bits32(v)


def scramble_owen_exact(v, seed):
    """Exact bit-by-bit Owen scrambling (scrambler.hpp:71-87); slow, used as
    a correctness oracle in tests."""
    seed64 = u64_from_u32(jnp.broadcast_to(jnp.asarray(seed, U32), jnp.shape(v)))
    out = jnp.where((jnp.asarray(seed, U32) & U32(1)).astype(bool), v ^ U32(1 << 31), v)
    for b in range(1, 32):
        mask = U32((0xFFFFFFFF << (32 - b)) & 0xFFFFFFFF)
        mixed = mix_bits64(u64_from_u32(out & mask))
        bit = (mixed.lo ^ seed64.lo) & U32(1 << b)
        out = jnp.where(bit.astype(bool), out ^ U32(1 << (31 - b)), out)
    return out


_SCRAMBLERS = {
    "null": scramble_null,
    "binary": scramble_binary_permute,
    "fastowen": scramble_fast_owen,
    "owen": scramble_owen_exact,
}


# ---------------------------------------------------------------------------
# Hash sampler (counter-based uniform RNG)
# ---------------------------------------------------------------------------


class HashSampler:
    """Pure counter-based RNG: every draw is mix32 of (pixel, sample, dim).

    Functional replacement for NaiveSampler (sampler.cpp:5-17); unlike the
    xoshiro-backed original it is stateless and sharding-invariant.
    """

    def __init__(self, spp: int, full_res=(0, 0), seed: int = 0):
        del spp, full_res
        self.seed = np.uint32(seed)

    def init_lanes(self, px, py, sample_idx):
        """Per-lane base state: a single uint32 key."""
        base = mix32(jnp.asarray(px, U32) * U32(0x9E3779B9) ^ mix32(jnp.asarray(py, U32) ^ U32(self.seed)))
        return mix32(base ^ jnp.asarray(sample_idx, U32) * U32(0x85EBCA6B))

    def get1d(self, state, dim):
        v = mix32(state ^ jnp.asarray(dim, U32) * U32(0xC2B2AE35))
        return u32_to_unit_float(v)

    def get2d(self, state, dim):
        a = self.get1d(state, dim)
        b = self.get1d(state, jnp.asarray(dim) + 1)
        return jnp.stack([a, b], axis=-1)

    def lane_seed(self, state):
        """Per-lane u32 key for auxiliary draws (alpha tests)."""
        return mix32(state ^ U32(0xA511E9B3))


# ---------------------------------------------------------------------------
# ZSobol sampler (sampler.hpp:72-174)
# ---------------------------------------------------------------------------

# The 24 permutations of 4 base-4 digits, in the pbrt ordering that
# sampler.hpp:115-140 uses. The VALUES are forced: this is public pbrt data,
# and the row order is load-bearing (the permutation index is hashed from the
# sample key, so any other ordering changes the sample stream and breaks
# parity with the reference).
def _perm_table() -> np.ndarray:
    perms = [
        (0, 1, 2, 3), (0, 1, 3, 2), (0, 2, 1, 3), (0, 2, 3, 1),
        (0, 3, 2, 1), (0, 3, 1, 2), (1, 0, 2, 3), (1, 0, 3, 2),
        (1, 2, 0, 3), (1, 2, 3, 0), (1, 3, 2, 0), (1, 3, 0, 2),
        (2, 1, 0, 3), (2, 1, 3, 0), (2, 0, 1, 3), (2, 0, 3, 1),
        (2, 3, 0, 1), (2, 3, 1, 0), (3, 1, 2, 0), (3, 1, 0, 2),
        (3, 2, 1, 0), (3, 2, 0, 1), (3, 0, 2, 1), (3, 0, 1, 2),
    ]
    return np.asarray(perms, np.uint32).reshape(-1)


MAX_DIMS = 512  # enough for 30 bounces * 8 dims + camera dims


class ZSobolSampler:
    """Z-ordered (Morton-shuffled) scrambled Sobol' sampler.

    Pure function of (pixel, sample, dim): ``init_lanes`` computes the 64-bit
    Morton key per lane; each draw permutes its base-4 digits with a
    dim-keyed random S4 permutation to decorrelate dimensions, then evaluates
    the first two Sobol' dimensions with per-dim scrambling
    (sampler.hpp:84-173).

    ``dim`` may be a traced scalar: all per-dim hash constants are
    precomputed host-side into [MAX_DIMS] tables.
    """

    def __init__(self, spp: int, full_res, seed: int = 0, scrambler: str = "fastowen"):
        spp = max(1, int(spp))
        self.log2spp = int(np.ceil(np.log2(spp)))
        res = int(max(full_res)) if np.iterable(full_res) else int(full_res)
        res = max(1, res)
        res_p2 = 1 << int(np.ceil(np.log2(res)))
        log4spp = (self.log2spp + 1) // 2
        self.n_base4_digits = int(np.log2(res_p2)) + log4spp
        self.scramble = _SCRAMBLERS[scrambler]
        self.seed = int(seed)

        # Host-side per-dimension constants. The reference seeds the
        # permutation with 0x55555555 * dim (32-bit wrap, sampler.hpp:163) and
        # the scramblers with hash(dim) *after* the dim counter increment
        # (sampler.hpp:89-106).
        dims = np.arange(MAX_DIMS, dtype=np.uint64)
        perm_c = (np.uint64(0x55555555) * dims).astype(np.uint32)
        h1 = np.array([hash_dim(d + 1) for d in range(MAX_DIMS)], np.uint64)
        h2 = np.array([hash_dim(d + 2) for d in range(MAX_DIMS)], np.uint64)
        if seed:
            # No reference analog: fold a user seed into the scrambler keys so
            # independent renders decorrelate.
            h1 = np.array([_murmur64a(int(x).to_bytes(8, "little"), seed) for x in h1], np.uint64)
            h2 = np.array([_murmur64a(int(x).to_bytes(8, "little"), seed) for x in h2], np.uint64)
            perm_c = (perm_c.astype(np.uint64) + np.uint64(seed)).astype(np.uint32)
        self._perm_c = jnp.asarray(perm_c)
        self._seed_1d = jnp.asarray((h1 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        self._seed_2d_a = jnp.asarray((h2 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        self._seed_2d_b = jnp.asarray((h2 >> np.uint64(32)).astype(np.uint32))
        # Each S4 permutation packed into one byte (2 bits per digit) so the
        # per-lane permutation lookup is a one-hot contraction instead of a
        # gather — per-lane gathers from tiny tables dominate TPU wave time
        # (94% of the profiled render loop before this change).
        pt = _perm_table().reshape(24, 4).astype(np.uint32)
        packed = (pt[:, 0] | (pt[:, 1] << 2) | (pt[:, 2] << 4) | (pt[:, 3] << 6))
        self._perms_packed = jnp.asarray(packed.astype(np.float32))
        self._matrix1 = jnp.asarray(sobol_matrix_dim1())

    def init_lanes(self, px, py, sample_idx):
        """startPixelSample (sampler.hpp:84-87): 64-bit Morton key
        (morton(p) << log2spp) | sample."""
        morton = encode_morton2_32(px, py)
        key = u64_shl(u64_from_u32(morton), self.log2spp)
        s = jnp.asarray(sample_idx, U32)
        return U64(key.hi, key.lo | s)

    def _sample_index(self, morton: U64, dim) -> U64:
        """Base-4 digit permutation of the Morton key (sampler.hpp:155-173)."""
        pow2_samples = bool(self.log2spp & 1)
        last_digit = 1 if pow2_samples else 0
        perm_c = self._perm_c[dim]  # uint32, traced gather

        hi = jnp.zeros_like(morton.lo)
        lo = jnp.zeros_like(morton.lo)
        for i in range(self.n_base4_digits - 1, last_digit - 1, -1):
            digit_shift = 2 * i - last_digit
            shifted = u64_shr(morton, digit_shift)
            digit = shifted.lo & U32(3)
            higher = u64_shr(morton, digit_shift + 2)
            mixed = mix_bits64(U64(higher.hi, higher.lo ^ perm_c))
            p = u64_mod24(u64_shr(mixed, 24))
            # gather-free S4 permutation: select the packed byte, unpack 2 bits
            sel = (
                p[..., None]
                == jax.lax.broadcasted_iota(U32, (1, 24), 1)
            ).astype(jnp.float32)
            packed = jnp.dot(
                sel, self._perms_packed, preferred_element_type=jnp.float32
            ).astype(U32)
            digit = (packed >> (digit * U32(2))) & U32(3)
            placed = u64_shl(u64_from_u32(digit), digit_shift)
            hi |= placed.hi
            lo |= placed.lo
        if pow2_samples:
            digit = morton.lo & U32(1)
            m1 = u64_shr(morton, 1)
            mixed = mix_bits64(U64(m1.hi, m1.lo ^ perm_c))
            lo |= digit ^ (mixed.lo & U32(1))
        return U64(hi, lo)

    def get1d(self, state: U64, dim):
        idx = self._sample_index(state, dim)
        v = reverse_bits32(idx.lo)  # Sobol dim 0 on low 32 bits (sampler.hpp:144-145)
        v = self.scramble(v, self._seed_1d[dim])
        return u32_to_unit_float(v)

    def lane_seed(self, state: U64):
        """Per-lane u32 key for auxiliary draws (alpha tests): the Morton key
        hashes to a decorrelated stream outside the QMC dims."""
        return mix32(state.lo ^ mix32(state.hi ^ U32(0xA511E9B3)))

    def get2d(self, state: U64, dim):
        idx = self._sample_index(state, dim)
        va = reverse_bits32(idx.lo)
        vb = sobol_sample_dim1(idx, self._matrix1)
        va = self.scramble(va, self._seed_2d_a[dim])
        vb = self.scramble(vb, self._seed_2d_b[dim])
        return jnp.stack([u32_to_unit_float(va), u32_to_unit_float(vb)], axis=-1)


def make_sampler(kind: str, spp: int, full_res=(1, 1), seed: int = 0):
    """Sampler factory; `zsobol` accepts scrambler variants via suffix,
    e.g. "zsobol:owen", "zsobol:null" (default fastowen, src/main.cpp:16)."""
    if kind == "hash":
        return HashSampler(spp, full_res, seed)
    if kind == "stratified":
        return StratifiedSampler(spp, full_res, seed)
    if kind.startswith("zsobol"):
        scrambler = kind.split(":", 1)[1] if ":" in kind else "fastowen"
        return ZSobolSampler(spp, full_res, seed, scrambler=scrambler)
    raise ValueError(f"unknown sampler kind: {kind}")


# ---------------------------------------------------------------------------
# Stratified sampler (src/core/sampler.cpp:19-44)
# ---------------------------------------------------------------------------


def permutation_element(i, l: int, p):
    """Kensler-style hash-based random permutation of [0, l) (the reference's
    `permel`, src/core/rng.hpp:102-132). `l` is static; i, p are [N] u32."""
    w = l - 1
    for sh in (1, 2, 4, 8, 16):
        w |= w >> sh
    w = U32(w)
    i = jnp.asarray(i, U32)
    p = jnp.asarray(p, U32)

    def round_fn(i):
        i ^= p
        i *= U32(0xE170893D)
        i ^= p >> 16
        i ^= (i & w) >> 4
        i ^= p >> 8
        i *= U32(0x0929EB3F)
        i ^= p >> 23
        i ^= (i & w) >> 1
        i *= U32(1) | (p >> 27)
        i *= U32(0x6935FA69)
        i ^= (i & w) >> 11
        i *= U32(0x74DCB303)
        i ^= (i & w) >> 2
        i *= U32(0x9E501CC3)
        i ^= (i & w) >> 2
        i *= U32(0xC860A3DF)
        i &= w
        i ^= i >> 5
        return i

    # Rejection loop: each round keeps lanes with i < l; a handful of rounds
    # drives the miss probability to ~0 (expected < 2 rounds since w < 2l).
    out = round_fn(i)
    for _ in range(8):
        out = jnp.where(out >= U32(l), round_fn(out), out)
    out = jnp.minimum(out, U32(l - 1))  # safety clamp
    return (out + p) % U32(l)


class StratifiedSampler:
    """Counter-based stratified sampler.

    Rewrites the reference StratifiedSampler (sampler.cpp:19-44) without the
    xoshiro state: the per-dim stratum comes from `permutation_element` keyed
    by hash(pixel, dim) and the intra-stratum jitter from the counter-based
    hash stream — same stratification structure, sharding-invariant streams
    (the reference's jitter is an arbitrary xoshiro draw anyway).
    """

    def __init__(self, spp: int, full_res=(0, 0), seed: int = 0):
        import math as _math

        n = max(1, int(spp))
        self.x_samples = max(1, int(_math.sqrt(n)))
        self.y_samples = max(1, (n + self.x_samples - 1) // self.x_samples)
        self.n_strata = self.x_samples * self.y_samples
        self.seed = np.uint32(seed)

    def init_lanes(self, px, py, sample_idx):
        pix_key = mix32(
            jnp.asarray(px, U32) * U32(0x9E3779B9)
            ^ mix32(jnp.asarray(py, U32) ^ U32(self.seed))
        )
        return (pix_key, jnp.asarray(sample_idx, U32))

    def _stratum(self, state, dim):
        pix_key, sidx = state
        key = mix32(pix_key ^ jnp.asarray(dim, U32) * U32(0x85EBCA6B))
        return permutation_element(sidx, self.n_strata, key)

    def _jitter(self, state, dim, salt):
        pix_key, sidx = state
        v = mix32(
            pix_key
            ^ sidx * U32(0xC2B2AE35)
            ^ jnp.asarray(dim, U32) * U32(0x27D4EB2F)
            ^ U32(salt)
        )
        return u32_to_unit_float(v)

    def get1d(self, state, dim):
        s = self._stratum(state, dim)
        return (s.astype(jnp.float32) + self._jitter(state, dim, 0x1)) / self.n_strata

    def get2d(self, state, dim):
        s = self._stratum(state, dim)
        x = (s % U32(self.x_samples)).astype(jnp.float32)
        y = (s // U32(self.x_samples)).astype(jnp.float32)
        return jnp.stack(
            [
                (x + self._jitter(state, dim, 0x2)) / self.x_samples,
                (y + self._jitter(state, dim, 0x3)) / self.y_samples,
            ],
            axis=-1,
        )

    def lane_seed(self, state):
        pix_key, sidx = state
        return mix32(pix_key ^ sidx * U32(0xA511E9B3))
