"""Pallas TPU kernel: brute-force ray-triangle intersection.

The XLA brute-force path (render/intersect.intersect_brute) materializes
[lanes, chunk] intermediates in HBM for every op of the Möller-Trumbore
test — profiled at ~40 ms per wave step on v5e, ~90% of it padding and
intermediate traffic. This kernel instead:

- blocks the wavefront into [BS, 128] lane tiles living entirely in
  VMEM/registers,
- loops over triangles with SCALAR triangle data (12 scalar loads per
  triangle from the packed [T, 12] VMEM table, tri_pack layout from
  scene/builder.py),
- fuses the whole test + closest-hit update into one kernel: HBM traffic is
  exactly rays in + hit records out.

Valid when the scene fits VMEM (n_tris <= ~40k rows of 48 B) and no
alpha/transparency gates are needed; the dispatcher in render/intersect.py
falls back to the XLA path otherwise. Math is identical to
render/intersect._mt_test (ray-integrator.cpp:162-229).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANES = 16  # block = SUBLANES x LANE lanes
EPS_DET = 1e-12
F32_MAX = np.float32(3.0e38)  # numpy: safe if imported inside a trace


def _kernel(n_tris: int, t_min: float, tri_ref, ox, oy, oz, dx, dy, dz, tmax,
            t_out, u_out, v_out, back_out, tri_out):
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    dxv, dyv, dzv = dx[:], dy[:], dz[:]

    shape = oxv.shape
    init = (
        tmax[:],  # best t (= t_max when missed)
        jnp.zeros(shape, jnp.float32),  # u
        jnp.zeros(shape, jnp.float32),  # v
        jnp.zeros(shape, jnp.float32),  # back flag
        jnp.full(shape, -1, jnp.int32),  # tri index
    )

    def body(t, carry):
        bt, bu, bv, bb, bi = carry
        p0x = tri_ref[t, 0]
        p0y = tri_ref[t, 1]
        p0z = tri_ref[t, 2]
        e1x = tri_ref[t, 3] - p0x
        e1y = tri_ref[t, 4] - p0y
        e1z = tri_ref[t, 5] - p0z
        e2x = tri_ref[t, 6] - p0x
        e2y = tri_ref[t, 7] - p0y
        e2z = tri_ref[t, 8] - p0z

        # pvec = d x e2 (e2 scalar)
        pvx = dyv * e2z - dzv * e2y
        pvy = dzv * e2x - dxv * e2z
        pvz = dxv * e2y - dyv * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        back = det < 0.0
        inv_det = 1.0 / jnp.where(jnp.abs(det) < EPS_DET, 1.0, det)

        bx = oxv - p0x
        by = oyv - p0y
        bz = ozv - p0z
        u = (bx * pvx + by * pvy + bz * pvz) * inv_det
        # qvec = b x e1
        qvx = by * e1z - bz * e1y
        qvy = bz * e1x - bx * e1z
        qvz = bx * e1y - by * e1x
        v = (dxv * qvx + dyv * qvy + dzv * qvz) * inv_det
        tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

        valid = (
            (jnp.abs(det) >= EPS_DET)
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (tt > t_min)
            & (tt < bt)
        )
        return (
            jnp.where(valid, tt, bt),
            jnp.where(valid, u, bu),
            jnp.where(valid, v, bv),
            jnp.where(valid, back.astype(jnp.float32), bb),
            jnp.where(valid, t, bi),
        )

    bt, bu, bv, bb, bi = jax.lax.fori_loop(0, n_tris, body, init)
    t_out[:] = bt
    u_out[:] = bu
    v_out[:] = bv
    back_out[:] = bb
    tri_out[:] = bi


@functools.partial(
    jax.jit, static_argnames=("n_tris", "t_min", "interpret")
)
def brute_pallas(tri_pack, o, d, t_max, n_tris: int, t_min: float,
                 interpret: bool = False):
    """Closest-hit over all triangles. o, d: [N, 3]; t_max: [N]; tri_pack
    [T, 12]. N must be a multiple of 2048. Returns (t, u, v, back, tri)."""
    n = o.shape[0]
    assert n % (SUBLANES * LANE) == 0, n
    rows = n // LANE
    grid = rows // SUBLANES

    def shape2(a):
        return a.reshape(rows, LANE)

    lane_spec = pl.BlockSpec(
        (SUBLANES, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(
        tri_pack.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
    out_shape_i = jax.ShapeDtypeStruct((rows, LANE), jnp.int32)

    t, u, v, back, tri = pl.pallas_call(
        functools.partial(_kernel, n_tris, t_min),
        grid=(grid,),
        in_specs=[tri_spec] + [lane_spec] * 7,
        out_specs=(lane_spec,) * 5,
        out_shape=(out_shape, out_shape, out_shape, out_shape, out_shape_i),
        interpret=interpret,
    )(
        tri_pack,
        shape2(o[:, 0]), shape2(o[:, 1]), shape2(o[:, 2]),
        shape2(d[:, 0]), shape2(d[:, 1]), shape2(d[:, 2]),
        shape2(t_max),
    )
    return (
        t.reshape(n),
        u.reshape(n),
        v.reshape(n),
        back.reshape(n) > 0.5,
        tri.reshape(n),
    )
