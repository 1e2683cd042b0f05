"""Wavefront path-tracing integrators (MIS+NEE and naive).

TPU re-design of the reference integrators (src/cpu/mis-integrator.cpp,
naive-integrator.cpp): the recursive/iterative per-ray `Li` loop becomes a
`lax.while_loop` over the WHOLE wavefront — every lane advances one bounce
per iteration, dead lanes are masked, and the loop exits when all lanes are
done or max_depth is reached. All scatter decisions are branchless.

Sampler dimension layout (deterministic per (pixel, sample); SURVEY.md §3.3):
  dims 0-1: film jitter    dims 2-3: lens
  per bounce k, base = 4 + 8k:
    base+0..1: BSDF u | base+2: uc | base+3: uc2 (lobe select)
    base+4: NEE light select | base+5..6: NEE u | base+7: roulette
Unlike the reference (which consumes dims data-dependently, e.g. NEE dims only
on non-specular bounces, mis-integrator.cpp:80,114-115), dims are assigned
statically per bounce so every lane keeps an aligned, pure counter-based
stream — the property that makes images identical under any sharding.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from yart_tpu.config import RenderConfig
from yart_tpu.ops import lut
from yart_tpu.ops.gatherless import onehot_matmul
from yart_tpu.ops.vecmath import (
    absdot,
    frame_from_normal_tangent,
    local_to_world,
    max_component,
    normalize,
    shading_tangent,
    world_to_local,
)
from yart_tpu.render import bsdf as B
from yart_tpu.render import lights
from yart_tpu.render.camera import CameraParams, generate_rays
from yart_tpu.render.intersect import intersect
from yart_tpu.render.texture import sample_stack
from yart_tpu.scene.types import CompiledScene, SceneMeta

INF = np.float32(1e30)  # numpy: safe under any import context
RAY_EPS = 1e-3  # tMin (mis-integrator.cpp:26)


class Shading(NamedTuple):
    """Per-lane surface data after a hit (analog of Hit + testMesh fixups,
    src/cpu/ray-integrator.cpp:56-82)."""

    p: jnp.ndarray  # [N, 3]
    n: jnp.ndarray  # [N, 3] shading normal (normal-mapped, normalized)
    tg: jnp.ndarray  # [N, 3] integrator tangent convention
    uv: jnp.ndarray  # [N, 2]
    mat: jnp.ndarray  # [N] int32
    light: jnp.ndarray  # [N] int32 (-1 = not emissive)
    back: jnp.ndarray  # [N] bool


def shading_data(scene: CompiledScene, meta: SceneMeta, hit, o, d) -> Shading:
    tri = jnp.clip(hit.tri, 0, meta.n_tris - 1)
    if meta.n_instances:
        # Instanced: the virtual tri id maps to (shared shade row,
        # instance, light, material) via ONE tri_aux row gather; normals
        # and tangents are stored in prototype object space and rotated to
        # world below.
        aux = scene.tri_aux[tri]  # [N, 8] i32
        row = scene.shade_pack[aux[..., 0]]
        irow = scene.inst_rows[aux[..., 1]]  # [N, 40]
    else:
        # ONE packed row gather: vertex normals, uvs, tangents, mat, light.
        row = scene.shade_pack[tri]  # [N, 32]
    w = (1.0 - hit.u - hit.v)[..., None]
    u = hit.u[..., None]
    v = hit.v[..., None]

    n = normalize(w * row[..., 0:3] + u * row[..., 3:6] + v * row[..., 6:9])
    uv = w * row[..., 9:11] + u * row[..., 11:13] + v * row[..., 13:15]
    if meta.n_instances:
        mat_idx = aux[..., 3]
        light_idx = aux[..., 2]
        # Normal matrix (inverse-transpose) rows at cols 24:33; elementwise
        # broadcast FMAs (a batched [N,3,3]x[N,3] einsum lowers to N tiny
        # matmuls on TPU — pathological).
        mm = lambda m9, x: jnp.stack(
            [
                jnp.sum(m9[..., 0:3] * x, axis=-1),
                jnp.sum(m9[..., 3:6] * x, axis=-1),
                jnp.sum(m9[..., 6:9] * x, axis=-1),
            ],
            axis=-1,
        )
        n = normalize(mm(irow[..., 24:33], n))
    else:
        mat_idx = lax.bitcast_convert_type(row[..., 27], jnp.int32)
        light_idx = lax.bitcast_convert_type(row[..., 28], jnp.int32)

    # Normal mapping through the interpolated tangent frame (bsdf.cpp:44-58).
    if meta.any_textures:
        t4 = (
            w * row[..., 15:19] + u * row[..., 19:23] + v * row[..., 23:27]
        )
        if meta.n_instances:
            # Tangents transform by the forward linear part (rows of the
            # 3x4 at cols 12:24 are [R | t] — use R columns only).
            fwd9 = jnp.concatenate(
                [irow[..., 12:15], irow[..., 16:19], irow[..., 20:23]],
                axis=-1,
            )
            t_xyz = normalize(mm(fwd9, t4[..., :3]))
            t4 = jnp.concatenate([t_xyz, t4[..., 3:4]], axis=-1)
        tn_idx = onehot_matmul(
            scene.materials.tex_normal.astype(jnp.float32)[:, None], mat_idx
        )[..., 0].astype(jnp.int32)
        tex_n = sample_stack(scene.tex_rgb, tn_idx, uv) * 2.0 - 1.0
        fx, fy, fz = frame_from_normal_tangent(n, t4[..., :3], t4[..., 3])
        mapped = normalize(local_to_world(tex_n, fx, fy, fz))
        n = jnp.where((tn_idx >= 0)[..., None], mapped, n)

    # Miss lanes carry t == t_max (1e30): a hit point that far overflows to
    # inf as soon as anything squares it (NEE dist^2, emitted-MIS dist2),
    # and an inf in ANY masked-out forward value turns into NaN in reverse
    # mode via the product rule. Every consumer of p is found/active-masked,
    # so pinning miss lanes to the ray origin is value-identical.
    return Shading(
        p=o + d * jnp.where(hit.mask, hit.t, 0.0)[..., None],
        n=n,
        tg=shading_tangent(n),
        uv=uv,
        mat=mat_idx,
        light=light_idx,
        back=hit.back_side,
    )


def _shade_kernel_body(
    scene, meta, sampler, lane_state, cfg, st, hit, sh, mat, found, L,
    dim0, rays, bounce_seed, mis, differentiable=False,
):
    """Fused-shade bounce body: the whole post-intersect bounce goes through
    kernels/shade_math.py — assembled by XLA (`shade_kernel == "xla"`) or
    fused into one Pallas kernel per bounce (`"pallas"`). Numerically
    equivalent to the classic body (tests/test_shade_kernel.py asserts the
    math; tests/test_shade_integrator.py the images)."""
    from yart_tpu.kernels import shade_math as SM

    n_l = sh.p.shape[0]
    gates = (
        meta.any_metallic, meta.any_transmissive, meta.any_clearcoat,
        meta.any_anisotropy,
    )
    any_lights = bool(meta.n_lights > 0 or meta.has_env)
    depth = st.depth
    zero = jnp.zeros((n_l,), jnp.float32)

    # All 8 of the bounce's sampler dims from ONE pallas kernel when the
    # sampler supports it (bit-exact vs the XLA draws — ZSobol's per-digit
    # S4 permutation one-hot dots are ~70 tiny matmul fusions per bounce).
    draws = None
    if cfg.shade_kernel == "pallas":
        from yart_tpu.kernels.pallas_shade import (
            draws_pallas,
            sampler_draw_setup,
        )

        setup = sampler_draw_setup(sampler, lane_state, dim0)
        if setup is not None:
            draws = draws_pallas(setup, n_l)
    if draws is None:
        u = sampler.get2d(lane_state, dim0)
        u0, u1 = u[..., 0], u[..., 1]
        uc = sampler.get1d(lane_state, dim0 + 2)
        uc2 = sampler.get1d(lane_state, dim0 + 3)
        u_rr = sampler.get1d(lane_state, dim0 + 7) if mis else zero
    else:
        u0, u1 = draws["u0"], draws["u1"]
        uc, uc2, u_rr = draws["uc"], draws["uc2"], draws["u_rr"]

    # Emitted-MIS light row (same contraction as the classic body).
    if mis and meta.n_lights:
        lrow = onehot_matmul(
            jnp.stack([scene.light_area, scene.light_power], axis=1),
            jnp.clip(sh.light, 0, meta.n_lights - 1),
        )
        pdf_area = 1.0 / jnp.maximum(lrow[:, 0], 1e-20)
        if cfg.light_sampler == "uniform":
            n_total = meta.n_lights + (1 if meta.has_env else 0)
            sel_p = jnp.full((n_l,), 1.0 / max(n_total, 1), jnp.float32)
        else:
            total = jnp.maximum(scene.light_cdf[-1], 1e-20)
            sel_p = lrow[:, 1] / total * (1.0 - lights.p_infinite(meta))
    else:
        pdf_area = zero
        sel_p = zero

    if mis and any_lights:
        if draws is None:
            uc_l = sampler.get1d(lane_state, dim0 + 4)
            u_l = sampler.get2d(lane_state, dim0 + 5)
        else:
            uc_l = draws["uc_l"]
            u_l = jnp.stack([draws["ul0"], draws["ul1"]], axis=-1)
        ls = lights.sample_light(
            scene, meta, sh.p, uc_l, u_l, kind=cfg.light_sampler
        )
    else:
        ls = None

    c3 = lambda a: (a[..., 0], a[..., 1], a[..., 2])
    inp = dict(
        o=c3(st.o), d=c3(st.d), n=c3(sh.n), p=c3(sh.p),
        atten=c3(st.atten), active=st.active, found=found,
        specular_prev=st.specular, acc_rough=st.acc_rough,
        last_pdf=st.last_pdf, last_p=c3(st.last_p),
        depth0=jnp.broadcast_to(depth == 0, (n_l,)),
        rr_on=jnp.broadcast_to(depth + 1 >= cfg.rr_start_depth, (n_l,)),
        light_neg=sh.light < 0,
        hit_back=sh.back, hit_t=hit.t,
        u0=u0, u1=u1, uc=uc, uc2=uc2, u_rr=u_rr,
        # Python float (static): jnp scalars are tracers under jit and the
        # pallas wrapper needs the concrete value.
        reg_threshold=float(cfg.regularize_threshold),
        base=c3(mat.base), metallic=mat.metallic,
        roughness=mat.roughness, roughness_base=mat.roughness_base,
        transmission=mat.transmission, ior=mat.ior,
        anisotropic=mat.anisotropic, aniso_rotation=mat.aniso_rotation,
        clearcoat=mat.clearcoat, cc_roughness=mat.cc_roughness,
        cc_roughness_base=mat.cc_roughness_base,
        emission=c3(mat.emission), thin=mat.thin,
        volume_color=c3(mat.volume_color),
        volume_density=mat.volume_density,
        pdf_area=pdf_area, sel_p=sel_p,
    )
    if cfg.regularize_specular is not None:
        if cfg.shade_kernel == "pallas":
            raise NotImplementedError(
                "regularize_specular is wired into the XLA shade paths "
                "only; the Pallas shade kernel's packed-row layout does "
                "not carry the force_reg lane input"
            )
        inp["force_reg"] = st.spec_depth >= cfg.regularize_specular
    if ls is not None:
        inp.update(
            ls_wi=c3(ls.wi), ls_Li=c3(ls.Li), ls_pdf=ls.pdf,
            ls_select_p=ls.select_p, ls_n=c3(ls.n), ls_p=c3(ls.p),
            ls_valid=ls.valid, ls_is_env=ls.is_env,
        )
    else:
        # candidates() still transforms ls_wi into the local frame.
        inp.update(ls_wi=c3(jnp.zeros((n_l, 3), jnp.float32)))

    if cfg.shade_kernel == "pallas":
        from yart_tpu.kernels.pallas_shade import shade_pallas

        out = shade_pallas(inp, gates, mis=mis, any_lights=any_lights)
    else:
        cand = SM.candidates(inp, gates)
        fet = SM.run_fetches(lut.load_tables(), cand["coords"])
        out = SM.finish(inp, cand, fet, gates, mis=mis,
                        any_lights=any_lights, detach=differentiable)

    s3 = lambda v: jnp.stack(v, axis=-1)
    L = L + s3(out["L_emit"])

    if mis and any_lights:
        sgd = lax.stop_gradient if differentiable else (lambda x: x)
        occ = intersect(
            scene if not differentiable
            else jax.tree_util.tree_map(lax.stop_gradient, scene),
            meta, sgd(sh.p), sgd(s3(out["shadow_d"])),
            sgd(out["shadow_tmax"]),
            t_min=RAY_EPS, nee=True,
            alpha_seed=bounce_seed ^ jnp.uint32(0x6A09E667),
        )
        if differentiable:
            from jax.ad_checkpoint import checkpoint_name

            occ = jax.tree_util.tree_map(lax.stop_gradient, occ)
            occ = jax.tree_util.tree_map(
                lambda x: checkpoint_name(x, "trace"), occ
            )
        rays = rays + jnp.sum(out["nee_need"].astype(jnp.float32))
        ok = out["nee_need"] & ~occ.mask
        L = L + jnp.where(
            ok[..., None], s3(out["contrib"]) * occ.attenuation, 0.0
        )

    return _State(
        o=s3(out["o"]),
        d=s3(out["d"]),
        L=L,
        atten=s3(out["atten"]),
        active=out["active"],
        specular=out["specular"],
        acc_rough=out["acc_rough"],
        last_pdf=out["last_pdf"],
        last_p=s3(out["last_p"]),
        depth=depth + 1,
        rays=rays,
        live=st.live,
        # Lanes that continue took this bounce's scatter; the sampled
        # roughness is the acc_rough delta (retired lanes never sample
        # again, so their miscount is irrelevant).
        spec_depth=st.spec_depth + (
            out["active"]
            & ((out["acc_rough"] - st.acc_rough) < 0.3)
        ).astype(jnp.int32),
    )


def _refit_hit(scene: CompiledScene, meta: SceneMeta, hit, o, d):
    """Differentiable (t, u, v) of the already-found hit triangle.

    The traversal solves the intersection with detached packed rows; here
    the SAME triangle (ids and visibility stay detached) is re-solved by
    Moller-Trumbore directly from `scene.positions`, so t/u/v — and with
    them the hit point, every NEE distance/cosine, and the interpolated
    shading attributes — become differentiable w.r.t. vertex positions.
    This is the interior (shading) term of geometry derivatives; silhouette
    /occlusion terms are detached-by-design like the rest of the sampling
    decisions (render/diff.py). Reference intersection contract:
    src/cpu/ray-integrator.cpp:163-201.

    Diff-mode only: the three per-lane vertex gathers are ~10 ns/row each
    at wavefront scale — acceptable off the hot path.

    Instanced scenes: the hit triangle resolves through tri_aux to the
    shared OBJECT-space prototype vertices (scene.proto_pos/proto_tri —
    leaf-ordered, indexed by the shade-row id) and the instance forward
    transform maps them to world space, so gradients flow to the shared
    prototype geometry (accumulated over every instance) and, if
    differentiated, to the instance transform rows themselves.
    """
    tri = lax.stop_gradient(jnp.clip(hit.tri, 0, meta.n_tris - 1))
    if meta.n_instances:
        aux = lax.stop_gradient(scene.tri_aux[tri])  # [N, 8]
        idx = lax.stop_gradient(scene.proto_tri[aux[:, 0]])  # [N, 3]
        irow = scene.inst_rows[aux[:, 1]]  # [N, 40] fwd 3x4 at 12:24

        def to_world(vo):
            f = irow[:, 12:24]
            return jnp.stack(
                [
                    jnp.sum(f[:, 0:3] * vo, axis=-1) + f[:, 3],
                    jnp.sum(f[:, 4:7] * vo, axis=-1) + f[:, 7],
                    jnp.sum(f[:, 8:11] * vo, axis=-1) + f[:, 11],
                ],
                axis=-1,
            )

        v0 = to_world(scene.proto_pos[idx[:, 0]])
        v1 = to_world(scene.proto_pos[idx[:, 1]])
        v2 = to_world(scene.proto_pos[idx[:, 2]])
    else:
        idx = lax.stop_gradient(scene.tri_v[tri])  # [N, 3]
        v0 = scene.positions[idx[:, 0]]
        v1 = scene.positions[idx[:, 1]]
        v2 = scene.positions[idx[:, 2]]
    e1 = v1 - v0
    e2 = v2 - v0
    pv = jnp.cross(d, e2)
    det = jnp.sum(e1 * pv, axis=-1)
    safe = jnp.where(jnp.abs(det) < 1e-12, jnp.where(det < 0, -1e-12, 1e-12), det)
    inv = 1.0 / safe
    tv = o - v0
    u = jnp.sum(tv * pv, axis=-1) * inv
    qv = jnp.cross(tv, e1)
    v = jnp.sum(d * qv, axis=-1) * inv
    t = jnp.sum(e2 * qv, axis=-1) * inv
    # Keep the traversal's values where the re-solve is ill-conditioned
    # (near-degenerate triangle) or the lane missed.
    ok = hit.mask & (jnp.abs(det) >= 1e-12) & (t > 0.0)
    return hit._replace(
        t=jnp.where(ok, t, hit.t),
        u=jnp.where(ok, u, hit.u),
        v=jnp.where(ok, v, hit.v),
    )


class _State(NamedTuple):
    o: jnp.ndarray
    d: jnp.ndarray
    L: jnp.ndarray
    atten: jnp.ndarray
    active: jnp.ndarray
    specular: jnp.ndarray
    acc_rough: jnp.ndarray
    last_pdf: jnp.ndarray
    last_p: jnp.ndarray
    depth: jnp.ndarray  # scalar int32
    rays: jnp.ndarray  # scalar int64-ish counter (float32 to psum cheaply)
    live: jnp.ndarray  # [max_depth] f32: active-lane count entering bounce k
    # (one 31-float dynamic_update_slice per bounce — free next to a bounce;
    # feeds the per-wave compaction autotune and live-fraction diagnostics)
    spec_depth: jnp.ndarray  # [N] i32: NEAR-specular scatters so far on
    # the path (sampled roughness < 0.3, roughen()'s ceiling — smooth
    # delta lobes count too); drives cfg.regularize_specular. Pure smooth
    # chains are deterministic (no variance); the caustic-speckle class
    # is near-specular chains, so the counter must include them.


def li(
    scene: CompiledScene,
    meta: SceneMeta,
    sampler,
    lane_state,
    o,
    d,
    cfg: RenderConfig,
    mis: bool = True,
    differentiable: bool = False,
    return_live: bool = False,
):
    """Trace radiance for a wavefront of camera rays.

    Returns (L [N, 3], ray_count []) — plus a [max_depth] per-depth
    active-lane count when return_live=True (compaction autotune probe).
    `lane_state` is the sampler per-lane state from `sampler.init_lanes`.

    differentiable=True makes the result reverse-differentiable w.r.t. scene
    parameters (material table, emission, env image) using detached sampling:
    - the bounce loop becomes a fixed-length `lax.scan` (reverse-mode through
      `lax.while_loop` is unsupported),
    - traversal results and sampled directions/pdfs/selection decisions are
      stop-gradiented (visibility and sampling decisions are treated as
      parameter-independent; f and Le stay differentiable) — the standard
      detached-sampling estimator (SURVEY.md §7.1).
    """
    n = o.shape[0]
    tables = lut.load_tables()
    sg = lax.stop_gradient if differentiable else (lambda x: x)
    if differentiable and cfg.shade_kernel == "pallas":
        raise NotImplementedError(
            "shade_kernel='pallas': the Pallas shade kernel has no VJP; "
            "use shade_kernel='xla' (same math, detached-sampling "
            "gradients, kernels/shade_math.py finish(detach=True)) or "
            "'off' for differentiable rendering"
        )

    st = _State(
        o=o,
        d=d,
        L=jnp.zeros((n, 3), jnp.float32),
        atten=jnp.ones((n, 3), jnp.float32),
        active=jnp.ones((n,), bool),
        specular=jnp.zeros((n,), bool),
        acc_rough=jnp.zeros((n,), jnp.float32),
        last_pdf=jnp.zeros((n,), jnp.float32),
        last_p=jnp.zeros((n, 3), jnp.float32),
        depth=jnp.asarray(0, jnp.int32),
        rays=jnp.asarray(0.0, jnp.float32),
        live=jnp.zeros((cfg.max_depth,), jnp.float32),
        spec_depth=jnp.zeros((n,), jnp.int32),
    )

    def cond(st: _State):
        return (st.depth < cfg.max_depth) & jnp.any(st.active)

    def make_body(lane_state):
        """Bounce body over a given lane set: parameterized so the
        staged-compaction path (cfg.compact_depth) can rebuild it for
        the compacted lanes; per-lane draws ride in lane_state, so
        results are bit-identical for any lane subset."""
        lane_seed = sampler.lane_seed(lane_state)

        def body(st: _State):
            n = st.active.shape[0]  # lane count of THIS stage
            depth = st.depth
            dim0 = jnp.asarray(4, jnp.uint32) + depth.astype(jnp.uint32) * 8
            n_act = jnp.sum(st.active.astype(jnp.float32))
            rays = st.rays + n_act
            st = st._replace(live=st.live.at[depth].add(n_act))

            # Fresh alpha-test stream per bounce (the reference draws these from
            # the sampler mid-traversal, ray-integrator.cpp:211).
            bounce_seed = lane_seed ^ (depth.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
            # Retired lanes trace with t_max = -1: every traversal treats them
            # as instant misses (and the block-trace sort groups them into
            # all-dead blocks that exit immediately) instead of paying a full
            # traversal for a result the masking below discards anyway.
            tmax_lane = jnp.where(st.active, INF, -1.0)
            hit = intersect(
                scene if not differentiable else jax.tree_util.tree_map(lax.stop_gradient, scene),
                meta, sg(st.o), sg(st.d), sg(tmax_lane), t_min=RAY_EPS,
                alpha_seed=bounce_seed,
            )
            if differentiable:
                # stop_gradient: visibility is non-differentiable (detached
                # sampling). checkpoint_name: the remat policy SAVES traversal
                # outputs as residuals so the backward pass recomputes only
                # shading math, never the traversal kernels (round-3 profile:
                # traversal is >50% of a flagship wave, and hit records are
                # ~10 f32/lane/bounce — cheap residuals).
                from jax.ad_checkpoint import checkpoint_name

                hit = jax.tree_util.tree_map(lax.stop_gradient, hit)
                hit = jax.tree_util.tree_map(
                    lambda x: checkpoint_name(x, "trace"), hit
                )
                if cfg.diff_geometry:
                    hit = _refit_hit(scene, meta, hit, st.o, st.d)
            found = hit.mask & st.active

            # ---- miss: environment + background (mis-integrator.cpp:27-43) ----
            miss = st.active & ~hit.mask
            L = st.L
            if meta.has_env:
                # Radiance and sampling pdf from ONE env-row fetch (per-lane
                # gathers cost ~10 ns/row regardless of width).
                le, pdf_env = lights.env_le_pdf(scene, st.d, meta)
                if mis:
                    w_bsdf = jnp.where(
                        (depth == 0) | st.specular,
                        1.0,
                        st.last_pdf / jnp.maximum(st.last_pdf + pdf_env, 1e-20),
                    )
                else:
                    w_bsdf = jnp.ones((n,), jnp.float32)
                L = L + jnp.where(miss[..., None], st.atten * le * w_bsdf[..., None], 0.0)
            L = L + jnp.where(miss[..., None], st.atten * scene.background, 0.0)

            # ---- surface shading ----
            sh = shading_data(scene, meta, hit, st.o, st.d)
            mat = B.resolve_material(scene, meta, sh.mat, sh.uv)

            if cfg.shade_kernel != "off":
                return _shade_kernel_body(
                    scene, meta, sampler, lane_state, cfg, st, hit, sh, mat,
                    found, L, dim0, rays, bounce_seed, mis,
                    differentiable=differentiable,
                )

            u = sampler.get2d(lane_state, dim0)
            uc = sampler.get1d(lane_state, dim0 + 2)
            uc2 = sampler.get1d(lane_state, dim0 + 3)

            regularized = st.acc_rough > cfg.regularize_threshold
            if cfg.regularize_specular is not None:
                # Specular-CHAIN regularization (config.py knob): pure
                # specular paths never accumulate roughness, so caustic
                # chains (glass -> chrome -> light) stayed unregularized
                # and speckle; roughen from the k-th specular vertex on.
                regularized = regularized | (
                    st.spec_depth >= cfg.regularize_specular
                )
            fx, fy, fz = frame_from_normal_tangent(sh.n, sh.tg)
            wo_local = world_to_local(-st.d, fx, fy, fz)
            smp = B.bsdf_sample(tables, mat, wo_local, u, uc, uc2, regularized, meta=meta)
            if differentiable:
                # Detached sampling: direction, pdf and lobe choice are constants;
                # f/Le keep their parameter dependence.
                smp = smp._replace(
                    wi=sg(smp.wi), pdf=sg(smp.pdf), flags=smp.flags,
                    roughness=sg(smp.roughness),
                )
            wi_world = local_to_world(smp.wi, fx, fy, fz)

            # ---- emitted radiance (mis-integrator.cpp:60-74) ----
            emitted = B.has_flag(smp.flags, B.EMITTED) & found
            if mis:
                # solid-angle conversion vs the light sampler's pdf
                dist2 = jnp.sum((st.last_p - sh.p) ** 2, axis=-1)
                if meta.n_lights:
                    lrow = onehot_matmul(
                        jnp.stack([scene.light_area, scene.light_power], axis=1),
                        jnp.clip(sh.light, 0, meta.n_lights - 1),
                    )
                    pdf_area = 1.0 / jnp.maximum(lrow[:, 0], 1e-20)
                    if cfg.light_sampler == "uniform":
                        n_total = meta.n_lights + (1 if meta.has_env else 0)
                        sel_p = jnp.full((n,), 1.0 / max(n_total, 1), jnp.float32)
                    else:
                        total = jnp.maximum(scene.light_cdf[-1], 1e-20)
                        sel_p = (
                            lrow[:, 1] / total * (1.0 - lights.p_infinite(meta))
                        )
                else:
                    pdf_area = jnp.zeros((n,), jnp.float32)
                    sel_p = jnp.zeros((n,), jnp.float32)
                pdf_light = (
                    pdf_area
                    * dist2
                    * sel_p
                    / jnp.maximum(absdot(-st.d, sh.n), 1e-9)
                )
                w_b = jnp.where(
                    (depth == 0) | st.specular | (sh.light < 0),
                    1.0,
                    st.last_pdf / jnp.maximum(st.last_pdf + pdf_light, 1e-20),
                )
            else:
                w_b = jnp.ones((n,), jnp.float32)
            L = L + jnp.where(emitted[..., None], st.atten * smp.Le * w_b[..., None], 0.0)

            scattered = B.has_flag(smp.flags, B.REFLECTED | B.TRANSMITTED) & found

            # ---- NEE direct lighting (mis-integrator.cpp:76-80, 111-133) ----
            do_nee = (
                scattered
                & ~B.has_flag(smp.flags, B.EMITTED | B.SPECULAR)
                & (meta.n_lights > 0 or meta.has_env)
            ) if mis else jnp.zeros((n,), bool)
            if mis and (meta.n_lights > 0 or meta.has_env):
                uc_l = sampler.get1d(lane_state, dim0 + 4)
                u_l = sampler.get2d(lane_state, dim0 + 5)
                ls = lights.sample_light(scene, meta, sh.p, uc_l, u_l, kind=cfg.light_sampler)

                wi_l_local = world_to_local(ls.wi, fx, fy, fz)
                f_l = B.bsdf_f(tables, mat, wo_local, wi_l_local, meta=meta)
                pdf_b = B.bsdf_pdf(tables, mat, wo_local, wi_l_local, meta=meta)
                to_l = ls.p - sh.p
                dist_l = jnp.sqrt(jnp.maximum(jnp.sum(to_l * to_l, axis=-1), 1e-20))
                nee_need = (
                    do_nee & ls.valid & (jnp.sum(f_l * f_l, axis=-1) > 0.0)
                )
                shadow_d = to_l / dist_l[..., None]
                shadow_tmax = jnp.where(nee_need, dist_l - 1e-3, -1.0)
                occ = intersect(
                    scene if not differentiable else jax.tree_util.tree_map(lax.stop_gradient, scene),
                    meta, sg(sh.p), sg(shadow_d), sg(shadow_tmax),
                    t_min=RAY_EPS, nee=True,
                    alpha_seed=bounce_seed ^ jnp.uint32(0x6A09E667),
                )
                if differentiable:
                    from jax.ad_checkpoint import checkpoint_name

                    occ = jax.tree_util.tree_map(lax.stop_gradient, occ)
                    occ = jax.tree_util.tree_map(
                        lambda x: checkpoint_name(x, "trace"), occ
                    )
                rays = rays + jnp.sum(nee_need.astype(jnp.float32))

                pdf_light = ls.select_p * ls.pdf / jnp.maximum(absdot(ls.n, ls.wi), 1e-9)
                dist2_l = jnp.sum(to_l * to_l, axis=-1)
                pdf_light = jnp.where(ls.is_env, pdf_light, pdf_light * dist2_l)
                contrib = (
                    ls.Li
                    * f_l
                    * occ.attenuation
                    * (absdot(ls.wi, sh.n) / jnp.maximum(pdf_b + pdf_light, 1e-20))[
                        ..., None
                    ]
                )
                ok = nee_need & ~occ.mask
                L = L + jnp.where(ok[..., None], st.atten * contrib, 0.0)

            # ---- throughput update (mis-integrator.cpp:83-96) ----
            fcos = smp.f * absdot(wi_world, sh.n)[..., None]
            atten = st.atten * fcos / jnp.maximum(smp.pdf, 1e-20)[..., None]
            vol = B.volume_attenuation(mat, hit.t)
            atten = jnp.where((sh.back & scattered)[..., None], atten * vol, atten)

            new_o = sh.p
            new_d = wi_world

            active = st.active & scattered
            specular = B.has_flag(smp.flags, B.SPECULAR)
            acc_rough = st.acc_rough + jnp.where(scattered, smp.roughness, 0.0)
            depth_new = depth + 1

            # ---- russian roulette (mis-integrator.cpp:98-102) ----
            if mis:
                u_rr = sampler.get1d(lane_state, dim0 + 7)
                q = jnp.maximum(0.0, 1.0 - max_component(atten))
                # Detached-sampling RR (round 5): the kill probability is a
                # sampling decision. Detaching BOTH the decision and the
                # 1/(1-q) reweight keeps the gradient unbiased —
                # E[d(f/(1-q))·1{survive}] picks up a spurious
                # f·q'/(1-q) term from the differentiable reweight that
                # only the (invisible-to-AD) indicator's boundary term
                # would cancel; with q detached, E[AD] = (1-q)·f'/(1-q)
                # = f' exactly. Unlocks RR-on differentiable rendering
                # (production inverse rendering keeps roulette for speed).
                q = sg(q)
                rr_on = (depth_new >= cfg.rr_start_depth) & active
                killed = rr_on & (u_rr < q)
                active = active & ~killed
                scale = jnp.where(rr_on & ~killed, 1.0 / jnp.maximum(1.0 - q, 1e-9), 1.0)
                atten = atten * scale[..., None]

            atten = jnp.where(active[..., None], atten, st.atten)

            return _State(
                o=jnp.where(active[..., None], new_o, st.o),
                d=jnp.where(active[..., None], new_d, st.d),
                L=L,
                atten=atten,
                active=active,
                specular=jnp.where(active, specular, st.specular),
                acc_rough=acc_rough,
                last_pdf=jnp.where(active, smp.pdf, st.last_pdf),
                last_p=jnp.where(active[..., None], sh.p, st.last_p),
                depth=depth_new,
                rays=rays,
                live=st.live,
                spec_depth=jnp.where(
                    active,
                    st.spec_depth
                    + (smp.roughness < 0.3).astype(jnp.int32),
                    st.spec_depth,
                ),
            )

        return body

    body = make_body(lane_state)

    if differentiable:
        # Rematerialize each bounce in the backward pass: without this the
        # scan stores every in-bounce intermediate (intersections, BSDF
        # internals) for all depths, which does not fit HBM at image scale.
        # jax.checkpoint trades that for one extra forward per bounce —
        # EXCEPT the traversal kernels, whose outputs are saved by name
        # (see checkpoint_name above): hits are stop-gradient anyway, so
        # re-running presort + the fused trace in the backward sweep is
        # pure waste. cfg.remat widens what is saved:
        #   "trace" (default)  save traversal outputs only
        #   "trace_lut"        + multiscatter-LUT fetches and texture/env
        #                        row lookups (checkpoint_name 'lut' sites)
        #   "all"              save every intermediate (no re-forward;
        #                        HBM-bound, small shapes only)
        if cfg.remat == "all":
            policy = jax.checkpoint_policies.everything_saveable
        elif cfg.remat == "trace_lut":
            policy = jax.checkpoint_policies.save_only_these_names(
                "trace", "lut"
            )
        else:
            policy = jax.checkpoint_policies.save_only_these_names("trace")
        import contextlib

        ctx = (
            lut.named_residuals()
            if cfg.remat == "trace_lut"
            else contextlib.nullcontext()
        )

        def run_scan(st0, body_fn, length, gate=False):
            """One checkpointed scan stage. gate=True wraps the bounce in
            lax.cond(any active): the body (including its traversal
            kernels) only EXECUTES while lanes are live — the scan-can't-
            early-exit analog of the while_loop's exit. Only used for the
            overflow drain, where the branch is normally never taken:
            inside a cond the 'trace' checkpoint_name sites are invisible
            to the remat policy, so a TAKEN gated bounce re-runs its
            traversal in the backward sweep (acceptable for the rare
            mis-tuned-cap case, fatal for the main path)."""
            if length <= 0:
                return st0

            def scan_body(st, _):
                if gate:
                    st2 = lax.cond(
                        jnp.any(st.active),
                        body_fn,
                        lambda s: s._replace(depth=s.depth + 1),
                        st,
                    )
                else:
                    st2 = body_fn(st)
                return st2, None

            st1, _ = lax.scan(
                jax.checkpoint(scan_body, prevent_cse=False, policy=policy),
                st0, None, length=length,
            )
            return st1

        # ---- staged wavefront compaction, differentiable flavor (round
        # 5; the round-4 forward win could not transfer directly because
        # reverse-mode through lax.while_loop is unsupported). The scan
        # splits into: full-width bounces [0, split), a stable-argsort
        # compaction of survivors into n/compact_factor lanes, compacted
        # bounces [split, max_depth), and a cond-gated full-width drain
        # for overflow lanes (normally zero iterations of real work).
        # Compaction is DIFFERENTIABLE: the state gather's transpose is a
        # scatter-add and the L merge-back's transpose is a gather, so
        # gradients flow through the compacted bounces unchanged; indices
        # themselves are stop-gradient. Per-lane sampler state rides the
        # gather, so the radiance is bit-identical to the uncompacted
        # scan (tests/test_diff.py::test_diff_compact_*).
        split = cfg.compact_depth
        if split == "auto":
            # Diff-mode auto needs roulette ON for the env heuristic to
            # hold: without RR, env scenes keep ~60% of lanes live at
            # depth 2 (tools/diag_livefrac.py — atrium 0.61, ivy 0.61 at
            # rr_start_depth=99) and a n/4 cap would overflow into the
            # full-width drain. RR-off diff configs (FD tests, the
            # recorded fwd+bwd bench rows) must opt in explicitly with
            # a measured (split, factor).
            rr_live = cfg.rr_start_depth < cfg.max_depth
            split = 2 if (meta.has_env and rr_live) else None
        cap = 0
        if split and split < cfg.max_depth:
            cap = max(
                128, (n // max(cfg.compact_factor, 2)) // 128 * 128
            )
        with ctx:
            # Arm the 'lut' checkpoint_name sites only while TRACING the
            # differentiable scan: the name op is an XLA optimization
            # barrier and measurably slows the plain forward path.
            if not cap or cap >= n:
                st = run_scan(st, body, cfg.max_depth)
            else:
                st = run_scan(st, body, split)
                idx = lax.stop_gradient(jnp.argsort(~st.active)[:cap])
                take = lambda a: a[idx]
                st_c = _State(
                    o=take(st.o), d=take(st.d), L=take(st.L),
                    atten=take(st.atten), active=take(st.active),
                    specular=take(st.specular),
                    acc_rough=take(st.acc_rough),
                    last_pdf=take(st.last_pdf), last_p=take(st.last_p),
                    depth=st.depth, rays=st.rays, live=st.live,
                    spec_depth=take(st.spec_depth),
                )
                body_c = make_body(jax.tree_util.tree_map(take, lane_state))
                st_c = run_scan(st_c, body_c, cfg.max_depth - split)
                in_idx = jnp.zeros((n,), bool).at[idx].set(True)
                st = st._replace(
                    L=st.L.at[idx].set(st_c.L),
                    active=st.active & ~in_idx,
                    rays=st_c.rays,
                    live=st_c.live,
                )
                st = run_scan(st, body, cfg.max_depth - split, gate=True)
    else:
        split = cfg.compact_depth
        if split == "auto":
            # Env-lit scenes retire most lanes within two bounces (sky
            # misses + RR); closed scenes keep too many survivors for
            # the cap and pay the overflow drain instead (BASELINE.md
            # round-4 measurements).
            split = 2 if meta.has_env else None
        cap = 0
        if split and split < cfg.max_depth:
            cap = max(
                128, (n // max(cfg.compact_factor, 2)) // 128 * 128
            )
        if not cap or cap >= n:
            st = lax.while_loop(cond, body, st)
        else:
            # ---- staged wavefront compaction (round 4, default off) ----
            # Paths retire bounce by bounce but every full-width bounce
            # pays full-width traversal scheduling + shade fusions for
            # the dead lanes. After `split` bounces the survivors are
            # compacted into n / compact_factor lanes (stable argsort on
            # the active mask) and the remaining bounces run at 1/f
            # width; survivors that do not fit (rare — the cap would be
            # mis-tuned) continue in a full-width overflow loop, so the
            # result is EXACT for any cap. Per-lane sampler state rides
            # along (lane_state gather) and every draw is a pure function
            # of it, so images are BIT-IDENTICAL with compaction on/off
            # (tests/test_render.py::test_compact_depth_bit_identical).
            st = lax.while_loop(
                lambda s: (s.depth < split) & jnp.any(s.active), body, st
            )
            idx = jnp.argsort(~st.active)[:cap]  # stable: active first
            take = lambda a: a[idx]
            st_c = _State(
                o=take(st.o), d=take(st.d), L=take(st.L),
                atten=take(st.atten), active=take(st.active),
                specular=take(st.specular), acc_rough=take(st.acc_rough),
                last_pdf=take(st.last_pdf), last_p=take(st.last_p),
                depth=st.depth, rays=st.rays, live=st.live,
                spec_depth=take(st.spec_depth),
            )
            body_c = make_body(jax.tree_util.tree_map(take, lane_state))
            st_c = lax.while_loop(cond, body_c, st_c)
            # Merge compacted lanes back, then drain any overflow lanes
            # (active lanes beyond the cap) at full width — normally the
            # loop exits after one any() check.
            in_idx = jnp.zeros((n,), bool).at[idx].set(True)
            st = st._replace(
                L=st.L.at[idx].set(st_c.L),
                active=st.active & ~in_idx,
                rays=st_c.rays,
                live=st_c.live,
            )
            st = lax.while_loop(cond, body, st)
    if return_live:
        return st.L, st.rays, st.live
    return st.L, st.rays


def render_wave(
    scene: CompiledScene,
    meta: SceneMeta,
    cam: CameraParams,
    sampler,
    cfg: RenderConfig,
    px,
    py,
    sample_idx,
    differentiable: bool = False,
    return_live: bool = False,
):
    """Camera raygen + Li for a batch of (pixel, sample) lanes.

    px, py: [N] int32 pixel coords; sample_idx: [N] uint32 global sample
    indices (wave offset included — deterministic across waves,
    src/cpu/integrator.cpp:20).
    Returns (radiance [N, 3] scaled by exposure, ray_count []) — plus a
    [max_depth] per-depth active count when return_live=True.
    """
    lane_state = sampler.init_lanes(
        px.astype(jnp.uint32), py.astype(jnp.uint32), sample_idx
    )
    u_film = sampler.get2d(lane_state, jnp.uint32(0))
    u_lens = sampler.get2d(lane_state, jnp.uint32(2))
    o, d = generate_rays(cam, px, py, u_film, u_lens)
    out = li(
        scene, meta, sampler, lane_state, o, d, cfg,
        mis=cfg.integrator == "mis", differentiable=differentiable,
        return_live=return_live,
    )
    L, rays = out[0], out[1]
    if cfg.clamp is not None:
        # Per-sample radiance clamp (production firefly suppression the
        # reference lacks — its only defense is GMoN's bucket trim,
        # estimator.hpp:148-198). Applied PRE-exposure so the knob is
        # scene-relative; biased like every clamp, off by default.
        L = jnp.minimum(L, jnp.float32(cfg.clamp))
    L = L * cam.exposure_scale
    if return_live:
        return L, rays, out[2]
    return L, rays
