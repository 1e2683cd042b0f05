"""Roofline / speed-of-light accounting for the three headline workloads
(VERDICT round-4 #3: turn "speed-of-light per chip" from a claim into a
number).

For each workload this script measures chained-in-graph device time (the
bench.py methodology) AND pulls XLA's own cost analysis from the compiled
executable (bytes accessed, flops), then reports achieved GB/s and
FLOP/s as fractions of the v5e peaks. For the fused traversal kernel —
an opaque custom call XLA cannot cost — the VPU bound comes from first
principles: the hand-counted op chain of the t-loop body times the
measured iteration counts the kernel itself reports (out cols 5/6 carry
per-block n_it / n_win diagnostics).

v5e peak assumptions (public specs; every derived number shows its
arithmetic so a different peak just rescales):
  HBM bandwidth      819 GB/s
  Clock              940 MHz
  VPU                8x128 lanes x 4 ALUs = 4096 f32 ops/cycle
                     -> 3.85 Tf32op/s
  MXU                197 Tbf16FLOP/s (unused by traversal; listed for
                     completeness)

Usage: python tools/roofline.py [bigscene|cornell|atrium|all]
Writes ROOFLINE.json next to BENCH_DETAIL.json and prints a table; the
BASELINE.md roofline section quotes these numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)

import numpy as np

PEAK_HBM = 819e9  # bytes/s
CLOCK = 0.94e9
VPU_F32 = 8 * 128 * 4 * CLOCK  # 3.85e12 f32 ops/s
PEAK_MXU_BF16 = 197e12

# Measured jaxpr census of the fused t-loop's per-candidate chain
# (_proj + _t_only at [128, 3x128], nested jits expanded): 21.2
# [B,3C]-width-equivalent vector element-ops per candidate (projection
# 10 full-width muls/adds; t/u/v + validity/min run at [B,C] thirds).
# One candidate = 21.2 * 128 * 3C element-ops. The per-iteration key
# extraction (~6 ops @ [1, cpad]) is negligible next to it.
TLOOP_OPS_PER_CAND = 21.2


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(jnp.ravel(x)[:8]))


def _cost(compiled):
    """XLA cost analysis dict (flops / bytes accessed) of a compiled
    executable; keys differ across backends, so fetch defensively."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {
            "flops": float(ca.get("flops", -1.0)),
            "bytes": float(ca.get("bytes accessed", -1.0)),
        }
    except Exception as e:  # noqa: BLE001
        return {"flops": -1.0, "bytes": -1.0, "error": str(e)}


def roofline_bigscene(out):
    """Incoherent closest-hit traversal: the binding resource is the VPU
    (measured round 3: sub-[128,384] ops cost the same as [128,384] ones
    — a ~48-vreg throughput floor; BASELINE.md). Compute achieved
    fraction = (element-ops implied by the kernel's own iteration
    counters) / (VPU peak x measured kernel time)."""
    import jax
    import jax.numpy as jnp

    from perf_trace import build_scene, make_rays
    from yart_tpu.render.blocktrace import TRACE_KBATCH, intersect_blocktrace

    scene, meta = build_scene(60, 128)
    lanes = 262144
    K = 10
    o_np, d_np = make_rays(lanes, False)
    o, d = jnp.asarray(o_np), jnp.asarray(d_np)

    def chained(k):
        @jax.jit
        def f(s, o, d):
            h = None
            for _ in range(k):
                oi = o if h is None else o + h.t[:, None] * 1e-30
                h = intersect_blocktrace(s, meta, oi, d, 100.0)
            return h
        return f

    fk = chained(K)
    lowered = fk.lower(scene, o, d)
    compiled = lowered.compile()
    _sync(compiled(scene, o, d).t)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        _sync(compiled(scene, o, d).t)
    dt = (time.time() - t0) / reps / K  # seconds per single traversal

    # The kernel's own diagnostics: n_it per block (t-loop iterations,
    # each testing TRACE_KBATCH candidates).
    h1 = intersect_blocktrace(scene, meta, o, d, 100.0)
    # Re-run the raw kernel path to read diag columns: intersect_blocktrace
    # consumes them, so recompute candidates from a single fused call.
    from yart_tpu.kernels.pallas_fusedtrace import (
        fused_trace_pallas, presort_keys_pallas,
    )
    from yart_tpu.render.blocktrace import (
        TRACE_BLOCK, TRACE_MINLEFT, TRACE_REKEY, _n_clus, _presort_block,
    )
    from jax import lax

    block = TRACE_BLOCK
    t_max_v = jnp.broadcast_to(jnp.float32(100.0), (lanes,))
    floor_v = jnp.zeros((lanes,), jnp.float32)
    rays = jnp.concatenate(
        [o, d, t_max_v[:, None], floor_v[:, None]], axis=1
    )
    pk = presort_keys_pallas(rays, scene.clus_box, _n_clus(meta), 1e-3,
                             block=_presort_block(lanes, block))
    key = pk[:, 0].astype(jnp.uint32)
    key2 = pk[:, 6].astype(jnp.uint32)
    key_s, _, order = lax.sort(
        (key, key2, jnp.arange(lanes, dtype=jnp.int32)), num_keys=2
    )
    from yart_tpu.kernels.pallas_fusedtrace import SKEY_NOTHING

    blive = jnp.any(
        (key_s < SKEY_NOTHING).reshape(-1, block), axis=1
    ).astype(jnp.int32)
    res = fused_trace_pallas(
        rays[order], scene.clus_box, scene.clus_pack, block,
        meta.cluster_size, 1e-3, kbatch=TRACE_KBATCH, rekey=TRACE_REKEY,
        minleft=TRACE_MINLEFT, blive=blive,
    )
    n_it_per_block = np.asarray(res[:, 5]).reshape(-1, block)[:, 0]
    total_iters = float(n_it_per_block.sum())
    cands = total_iters * TRACE_KBATCH
    c3 = 3 * meta.cluster_size
    elem_ops = cands * TLOOP_OPS_PER_CAND * block * c3

    vpu_bound_s = elem_ops / VPU_F32
    ca = _cost(compiled)
    row = {
        "workload": "bigscene_incoherent_262k",
        "device_s_per_pass": dt,
        "mrays_s": lanes / dt / 1e6,
        "tloop_candidates": cands,
        "tloop_elem_ops": elem_ops,
        "vpu_bound_s": vpu_bound_s,
        "pct_of_vpu_bound": 100.0 * vpu_bound_s / dt,
        "xla_cost_flops_chain": ca["flops"],
        "xla_cost_bytes_chain": ca["bytes"],
        # The XLA numbers cover the K-chain MINUS the opaque pallas calls.
        "hbm_pct_xla_visible": (
            100.0 * (ca["bytes"] / K) / dt / PEAK_HBM
            if ca["bytes"] > 0 else None
        ),
    }
    out.append(row)
    print(json.dumps(row, indent=1))


def _wave_roofline(out, name, scene, meta, cam_cfg, size, spp):
    """Full MIS wave: XLA sees everything except the traversal custom
    calls, so its bytes-accessed figure is a LOWER bound on HBM traffic;
    achieved-GB/s vs peak gives the memory-bound fraction."""
    import jax
    import jax.numpy as jnp

    from yart_tpu.config import RenderConfig
    from yart_tpu.ops.qmc import make_sampler
    from yart_tpu.render.camera import build_camera
    from yart_tpu.render.integrator import render_wave

    cam = build_camera(cam_cfg)
    cfg = RenderConfig(samples=spp, max_depth=8)
    sampler = make_sampler(cfg.sampler, cfg.samples, size, cfg.seed)
    w, h = size
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), spp), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), spp), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(spp), h * w), jnp.uint32)
    KW = 3

    @jax.jit
    def fk(s, px, py, sidx):
        total = jnp.zeros((), jnp.float32)
        rad = None
        for i in range(KW):
            si = sidx if rad is None else (
                sidx + total.astype(jnp.uint32) + jnp.uint32(i)
            ) % jnp.uint32(spp)
            rad, rays = render_wave(s, meta, cam, sampler, cfg, px, py, si)
            total = total + rays.astype(jnp.float32)
        return rad, total

    compiled = fk.lower(scene, px, py, sidx).compile()
    rad, total = compiled(scene, px, py, sidx)
    _sync(rad)
    reps = 3
    t0 = time.time()
    rays_total = 0.0
    for _ in range(reps):
        rad, tot = compiled(scene, px, py, sidx)
        _sync(rad)
        rays_total += float(tot)
    dt = (time.time() - t0) / reps / KW
    ca = _cost(compiled)
    row = {
        "workload": name,
        "device_s_per_wave": dt,
        "mrays_s": rays_total / (reps * KW) / dt / 1e6,
        "xla_cost_flops_chain": ca["flops"],
        "xla_cost_bytes_chain": ca["bytes"],
        "hbm_gbs_xla_visible": (
            ca["bytes"] / KW / dt / 1e9 if ca["bytes"] > 0 else None
        ),
        "hbm_pct_xla_visible": (
            100.0 * (ca["bytes"] / KW) / dt / PEAK_HBM
            if ca["bytes"] > 0 else None
        ),
        "vpu_pct_xla_visible": (
            100.0 * (ca["flops"] / KW) / dt / VPU_F32
            if ca["flops"] > 0 else None
        ),
    }
    out.append(row)
    print(json.dumps(row, indent=1))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    out = []
    if which in ("bigscene", "all"):
        roofline_bigscene(out)
    if which in ("cornell", "all"):
        from yart_tpu.config import CameraConfig
        from yart_tpu.scene.procedural import cornell_box

        scene, meta = cornell_box().compile()
        _wave_roofline(
            out, "cornell_wave_256x8", scene, meta,
            CameraConfig(image_size=(256, 256), focal_length=28.0,
                         position=(0, 1.0, 3.4), forward=(0, 0, -1)),
            (256, 256), 8,
        )
    if which in ("atrium", "all"):
        from yart_tpu.config import CameraConfig
        from yart_tpu.scene.showcase import atrium

        scene, meta = atrium().compile()
        _wave_roofline(
            out, "atrium_wave_256x8", scene, meta,
            CameraConfig(image_size=(256, 256), focal_length=28.0,
                         position=(-10.0, 1.8, 0.0),
                         forward=(18.0, 0.8, 0.0), exposure=3.0),
            (256, 256), 8,
        )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    json.dump(out, open(os.path.join(root, "ROOFLINE.json"), "w"), indent=1)
    print(f"wrote ROOFLINE.json ({len(out)} workloads)")


if __name__ == "__main__":
    main()
