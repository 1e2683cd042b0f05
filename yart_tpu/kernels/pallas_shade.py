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
            in_ref, out_ref):
    idx = {nm: i for i, nm in enumerate(names)}

    def row(nm):
        return in_ref[idx[nm]]

    def v3(nm):
        return (row(f"{nm}.x"), row(f"{nm}.y"), row(f"{nm}.z"))

    inp = {k: v3(k) for k in _V3_KEYS}
    inp.update({k: row(k) for k in _F_KEYS})
    inp.update({k: row(k) != 0.0 for k in _B_KEYS})
    inp["reg_threshold"] = reg_threshold
    fet = {k: row(f"fet.{k}") for k in fet_names}

    # Recompute the candidate directions on-tile (identical math to the
    # XLA pre-pass that produced the fetch coords; cheaper than shipping
    # ~20 more rows through HBM).
    cand = SM.candidates(inp, gates)
    out = SM.finish(inp, cand, fet, gates, mis=mis, any_lights=any_lights)

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


@functools.partial(
    jax.jit,
    static_argnames=("gates", "mis", "any_lights", "reg_threshold",
                     "fet_names", "names", "interpret"),
)
def _shade_call(packed, names, fet_names, gates, mis, any_lights,
                reg_threshold, interpret):
    f, nsub, _ = packed.shape
    n_out = 3 * len(_OUT_V3) + len(_OUT_F) + len(_OUT_B)
    grid = nsub // BS
    out = pl.pallas_call(
        functools.partial(
            _kernel, names, fet_names, gates, mis, any_lights, reg_threshold,
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((f, BS, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_out, BS, 128), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, nsub, 128), jnp.float32),
        interpret=interpret,
    )(packed)
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

    out = _shade_call(
        packed, names, fet_names, gates, mis, any_lights,
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
