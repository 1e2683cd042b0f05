"""Fused per-bounce shade kernel.

One Pallas kernel per bounce replaces the integrator's post-intersect
small-op tail (~100 XLA fusions round-tripping the wavefront through HBM,
BASELINE.md round-2 profile): sampler-fed VNDF sampling, all four lobes'
sample/eval, the NEE f/pdf evaluation, MIS weights, throughput, volume
attenuation and roulette run on VMEM-resident [Bs, 128] tiles, touching HBM
only for the packed input/output rows.

Pipeline (render/integrator.py _shade_kernel_body):

    XLA pre-pass   shade_math.candidates on [N] lanes -> LUT fetch coords
    XLA fetches    shade_math.run_fetches (gatherless MXU dots)
    THIS KERNEL    shade_math.candidates (recomputed on-tile, cheaper than
                   round-tripping its outputs) + shade_math.finish
    XLA epilogue   shadow traversal + NEE application

Layout: inputs/outputs are ONE [F, Nsub, 128] f32 array each (floats and
0/1-encoded bools); the grid walks Nsub in Bs-row blocks so every per-lane
quantity is a [Bs, 128] lane-major tile — one vreg per elementwise op at
Bs = 8. The component math itself lives in kernels/shade_math.py and is
identical to the XLA path (tests/test_shade_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yart_tpu.kernels import shade_math as SM
from yart_tpu.ops import lut

# Per-grid-step lane block: Bs sublane rows of 128 lanes.
BS = 8
BLOCK = BS * 128

_V3_KEYS = [
    "o", "d", "n", "p", "atten", "last_p", "base", "emission",
    "volume_color", "ls_wi", "ls_Li", "ls_n", "ls_p",
]
_F_KEYS = [
    "last_pdf", "acc_rough", "hit_t", "u0", "u1", "uc", "uc2", "u_rr",
    "metallic", "roughness", "roughness_base", "transmission", "ior",
    "anisotropic", "aniso_rotation", "clearcoat", "cc_roughness",
    "cc_roughness_base", "volume_density", "pdf_area", "sel_p",
    "ls_pdf", "ls_select_p",
]
_B_KEYS = [
    "active", "found", "specular_prev", "depth0", "rr_on", "light_neg",
    "hit_back", "thin", "ls_valid", "ls_is_env",
]

_OUT_V3 = ["L_emit", "contrib", "shadow_d", "o", "d", "atten", "last_p"]
_OUT_F = ["shadow_tmax", "last_pdf", "acc_rough"]
_OUT_B = ["nee_need", "active", "specular"]


def _row_names(fet_names):
    names = []
    for k in _V3_KEYS:
        names += [f"{k}.x", f"{k}.y", f"{k}.z"]
    names += _F_KEYS + _B_KEYS + [f"fet.{k}" for k in fet_names]
    return names


def _pack(inp, fet, fet_names, n):
    rows = []
    zero = jnp.zeros((n,), jnp.float32)
    for k in _V3_KEYS:
        v = inp.get(k)
        if v is None:
            rows += [zero, zero, zero]
        else:
            rows += [jnp.asarray(c, jnp.float32) for c in v]
    for k in _F_KEYS:
        v = inp.get(k)
        rows.append(zero if v is None
                    else jnp.broadcast_to(jnp.asarray(v, jnp.float32), (n,)))
    for k in _B_KEYS:
        v = inp.get(k)
        rows.append(zero if v is None else jnp.asarray(v).astype(jnp.float32))
    for k in fet_names:
        rows.append(jnp.asarray(fet[k], jnp.float32))
    return jnp.stack(rows, axis=0)


def _kernel(names, fet_names, gates, mis, any_lights, reg_threshold,
            blive_ref, in_ref, out_ref):
    idx = {nm: i for i, nm in enumerate(names)}

    def row(nm):
        return in_ref[idx[nm]]

    def v3(nm):
        return (row(f"{nm}.x"), row(f"{nm}.y"), row(f"{nm}.z"))

    def write(out):
        j = 0
        for k in _OUT_V3:
            v = out[k]
            out_ref[j] = v[0]
            out_ref[j + 1] = v[1]
            out_ref[j + 2] = v[2]
            j += 3
        for k in _OUT_F:
            out_ref[j] = out[k]
            j += 1
        for k in _OUT_B:
            out_ref[j] = out[k].astype(jnp.float32)
            j += 1

    # Dead-block skip: camera lanes are pixel-ordered, so lanes that retire
    # together (env misses, roulette on dark regions) are spatially
    # coherent — whole blocks go dead after the first bounces. finish()
    # passes state through for inactive lanes, so a dead block's outputs
    # are just copies.
    zero = jnp.zeros_like(in_ref[0])
    false_ = zero != 0.0
    passthrough = dict(
        L_emit=(zero, zero, zero), contrib=(zero, zero, zero),
        shadow_d=(zero, zero, zero), o=v3("o"), d=v3("d"),
        atten=v3("atten"), last_p=v3("last_p"),
        shadow_tmax=jnp.full_like(zero, -1.0), last_pdf=row("last_pdf"),
        acc_rough=row("acc_rough"), nee_need=false_, active=false_,
        specular=row("specular_prev") != 0.0,
    )
    write(passthrough)

    @pl.when(blive_ref[pl.program_id(0)] != 0)
    def _live():
        inp = {k: v3(k) for k in _V3_KEYS}
        inp.update({k: row(k) for k in _F_KEYS})
        inp.update({k: row(k) != 0.0 for k in _B_KEYS})
        inp["reg_threshold"] = reg_threshold
        fet = {k: row(f"fet.{k}") for k in fet_names}

        # Recompute the candidate directions on-tile (identical math to the
        # XLA pre-pass that produced the fetch coords; cheaper than shipping
        # ~20 more rows through HBM).
        cand = SM.candidates(inp, gates)
        write(SM.finish(inp, cand, fet, gates, mis=mis, any_lights=any_lights))


@functools.partial(
    jax.jit,
    static_argnames=("gates", "mis", "any_lights", "reg_threshold",
                     "fet_names", "names", "interpret"),
)
def _shade_call(packed, blive, names, fet_names, gates, mis, any_lights,
                reg_threshold, interpret):
    f, nsub, _ = packed.shape
    n_out = 3 * len(_OUT_V3) + len(_OUT_F) + len(_OUT_B)
    grid = nsub // BS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((f, BS, 128), lambda b, *_: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_out, BS, 128), lambda b, *_: (0, b, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, names, fet_names, gates, mis, any_lights, reg_threshold,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, nsub, 128), jnp.float32),
        interpret=interpret,
    )(blive, packed)
    return out


def shade_pallas(inp, gates, mis=True, any_lights=True, interpret=None):
    """Run the fused shade bounce; `inp` is the integrator's [N]-component
    dict (see _shade_kernel_body). Returns the shade_math.finish output
    dict with [N] arrays."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = inp["last_pdf"].shape[0]

    # XLA pre-pass + gatherless LUT fetches.
    cand = SM.candidates(inp, gates)
    fet = SM.run_fetches(lut.load_tables(), cand["coords"])
    fet_names = tuple(sorted(fet.keys()))
    names = tuple(_row_names(fet_names))

    packed = _pack(inp, fet, fet_names, n)
    n_pad = -(-n // BLOCK) * BLOCK
    if n_pad != n:
        packed = jnp.pad(packed, ((0, 0), (0, n_pad - n)))
    packed = packed.reshape(packed.shape[0], n_pad // 128, 128)

    active = inp["active"]
    if n_pad != n:
        active = jnp.pad(active, (0, n_pad - n))
    blive = jnp.any(active.reshape(-1, BLOCK), axis=1).astype(jnp.int32)

    out = _shade_call(
        packed, blive, names, fet_names, gates, mis, any_lights,
        float(inp["reg_threshold"]), interpret,
    )
    out = out.reshape(out.shape[0], n_pad)[:, :n]

    res = {}
    j = 0
    for k in _OUT_V3:
        res[k] = (out[j], out[j + 1], out[j + 2])
        j += 3
    for k in _OUT_F:
        res[k] = out[j]
        j += 1
    for k in _OUT_B:
        res[k] = out[j] != 0.0
        j += 1
    return res


# ---------------------------------------------------------------------------
# Stage-2 kernel: per-bounce sampler draws
#
# The classic bounce draws its 8 sampler dims in XLA — for ZSobol that is
# ~12 base-4 digits x 8 draws of one-hot S4 permutation DOTS (~70 tiny
# matmul fusions per bounce). In-kernel the permutation bytes are constants
# (shade_math.zsobol_*_c) and the whole thing is u32 bit math on [Bs, 128]
# tiles. Outputs are BIT-exact vs ops/qmc.py, so images are unchanged.
# Runs standalone (before sample_light, which consumes uc_l/u_l) — the NEE
# fetch coords depend on the sampled light, so draws cannot fuse into the
# shade kernel itself.
# ---------------------------------------------------------------------------

_DRAW_OUT = ["u0", "u1", "uc", "uc2", "uc_l", "ul0", "ul1", "u_rr"]


def _draws_kernel(spec, n_state, n_const, in_ref, out_ref):
    from jax import lax

    u32 = lambda i: lax.bitcast_convert_type(in_ref[i], jnp.uint32)
    kind = spec[0]
    if kind == "zsobol":
        nb, l2, matrix1 = spec[1], spec[2], spec[3]
        hi, lo = u32(0), u32(1)
        dc = [u32(2 + k) for k in range(n_const)]
        # dc layout: perm_c for dims (d0, +2, +3, +4, +5, +7) then
        # (s2a, s2b) for d0, (s2a, s2b) for d0+5, s1 for (+2, +3, +4, +7).
        pc0, pc2, pc3, pc4, pc5, pc7 = dc[0:6]
        s2a0, s2b0, s2a5, s2b5 = dc[6:10]
        s12, s13, s14, s17 = dc[10:14]
        u0, u1 = SM.zsobol_get2d_c(hi, lo, pc0, s2a0, s2b0, nb, l2, matrix1)
        ul0, ul1 = SM.zsobol_get2d_c(hi, lo, pc5, s2a5, s2b5, nb, l2, matrix1)
        uc = SM.zsobol_get1d_c(hi, lo, pc2, s12, nb, l2)
        uc2 = SM.zsobol_get1d_c(hi, lo, pc3, s13, nb, l2)
        uc_l = SM.zsobol_get1d_c(hi, lo, pc4, s14, nb, l2)
        u_rr = SM.zsobol_get1d_c(hi, lo, pc7, s17, nb, l2)
    else:  # hash
        st = u32(0)
        dc = [u32(1 + k) for k in range(n_const)]
        # dc layout: dim * 0xC2B2AE35 for dims d0..d0+7.
        u0 = SM.hash_get1d_c(st, dc[0])
        u1 = SM.hash_get1d_c(st, dc[1])
        uc = SM.hash_get1d_c(st, dc[2])
        uc2 = SM.hash_get1d_c(st, dc[3])
        uc_l = SM.hash_get1d_c(st, dc[4])
        ul0 = SM.hash_get1d_c(st, dc[5])
        ul1 = SM.hash_get1d_c(st, dc[6])
        u_rr = SM.hash_get1d_c(st, dc[7])
    vals = dict(u0=u0, u1=u1, uc=uc, uc2=uc2, uc_l=uc_l, ul0=ul0, ul1=ul1,
                u_rr=u_rr)
    for j, k in enumerate(_DRAW_OUT):
        out_ref[j] = vals[k]


@functools.partial(
    jax.jit, static_argnames=("spec", "n_state", "n_const", "interpret")
)
def _draws_call(packed, spec, n_state, n_const, interpret):
    f, nsub, _ = packed.shape
    out = pl.pallas_call(
        functools.partial(_draws_kernel, spec, n_state, n_const),
        grid=(nsub // BS,),
        in_specs=[
            pl.BlockSpec((f, BS, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((len(_DRAW_OUT), BS, 128), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((len(_DRAW_OUT), nsub, 128),
                                       jnp.float32),
        interpret=interpret,
    )(packed)
    return out


def sampler_draw_setup(sampler, lane_state, dim0):
    """(spec, state_rows u32 [N], consts u32 scalars) for an in-kernel-
    drawable sampler, or None (stratified etc. draw in XLA)."""
    from yart_tpu.ops import qmc

    if (isinstance(sampler, qmc.ZSobolSampler)
            and sampler.scramble is qmc.scramble_fast_owen):
        matrix1 = tuple(int(x) for x in qmc.sobol_matrix_dim1())
        spec = ("zsobol", sampler.n_base4_digits, sampler.log2spp, matrix1)
        pc = sampler._perm_c
        s1, s2a, s2b = (sampler._seed_1d, sampler._seed_2d_a,
                        sampler._seed_2d_b)
        d = dim0
        consts = jnp.stack([
            pc[d], pc[d + 2], pc[d + 3], pc[d + 4], pc[d + 5], pc[d + 7],
            s2a[d], s2b[d], s2a[d + 5], s2b[d + 5],
            s1[d + 2], s1[d + 3], s1[d + 4], s1[d + 7],
        ])
        return spec, (lane_state.hi, lane_state.lo), consts
    if isinstance(sampler, qmc.HashSampler):
        c = jnp.uint32(0xC2B2AE35)
        d = jnp.asarray(dim0, jnp.uint32)
        consts = jnp.stack([(d + k) * c for k in range(8)])
        return ("hash",), (lane_state,), consts
    return None


def draws_pallas(setup, n, interpret=None):
    """Compute the bounce's 8 sampler dims in one Pallas kernel; returns a
    dict of [N] f32 arrays bit-exact with the ops/qmc.py draws."""
    from jax import lax

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    spec, state_rows, consts = setup
    rows = [lax.bitcast_convert_type(jnp.asarray(r, jnp.uint32), jnp.float32)
            for r in state_rows]
    # broadcast_to (not arithmetic) so the bitcast bit patterns survive
    # (a u32 constant can alias an f32 NaN/denormal).
    rows += [
        jnp.broadcast_to(
            lax.bitcast_convert_type(consts[k], jnp.float32), (n,)
        )
        for k in range(consts.shape[0])
    ]
    packed = jnp.stack(rows, axis=0)
    n_pad = -(-n // BLOCK) * BLOCK
    if n_pad != n:
        packed = jnp.pad(packed, ((0, 0), (0, n_pad - n)))
    packed = packed.reshape(packed.shape[0], n_pad // 128, 128)
    out = _draws_call(
        packed, spec, len(state_rows), int(consts.shape[0]), interpret
    )
    out = out.reshape(out.shape[0], n_pad)[:, :n]
    return {k: out[j] for j, k in enumerate(_DRAW_OUT)}
