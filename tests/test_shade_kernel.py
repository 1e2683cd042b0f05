"""Shade-kernel math (kernels/shade_math.py) vs the render/bsdf.py path.

The fused shade kernel re-expresses bsdf_sample / bsdf_f / bsdf_pdf in
component-SoA form with LUT fetches hoisted out; these tests assert the two
implementations agree lane-by-lane over randomized materials covering every
lobe (metal / dielectric / glossy / clearcoat, smooth + rough, thin,
anisotropy rotation, regularization).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yart_tpu.ops import lut
from yart_tpu.ops.vecmath import (
    frame_from_normal_tangent,
    shading_tangent,
    world_to_local,
)
from yart_tpu.render import bsdf as B
from yart_tpu.kernels import shade_math as SM


def _rand_units(rng, n):
    v = rng.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


@pytest.fixture(scope="module")
def lanes():
    rng = np.random.default_rng(7)
    n_l = 512
    n = _rand_units(rng, n_l)
    d = _rand_units(rng, n_l)
    ls_wi = _rand_units(rng, n_l)
    u = rng.uniform(size=(n_l, 2)).astype(np.float32)
    uc = rng.uniform(size=n_l).astype(np.float32)
    uc2 = rng.uniform(size=n_l).astype(np.float32)

    rough = rng.uniform(size=n_l).astype(np.float32)
    rough[:64] = rng.uniform(0.0, 0.03, size=64)  # smooth band
    mat = dict(
        base=rng.uniform(0.05, 1.0, size=(n_l, 3)).astype(np.float32),
        metallic=rng.uniform(size=n_l).astype(np.float32),
        roughness=rough,
        transmission=rng.uniform(size=n_l).astype(np.float32),
        ior=rng.uniform(1.05, 2.2, size=n_l).astype(np.float32),
        anisotropic=rng.uniform(size=n_l).astype(np.float32),
        aniso_rotation=rng.uniform(-3.0, 3.0, size=n_l).astype(np.float32),
        clearcoat=rng.uniform(size=n_l).astype(np.float32),
        cc_roughness=rng.uniform(size=n_l).astype(np.float32),
        emission=np.where(
            rng.uniform(size=(n_l, 1)) < 0.3,
            rng.uniform(0.5, 5.0, size=(n_l, 3)),
            0.0,
        ).astype(np.float32),
        thin=(rng.uniform(size=n_l) < 0.3),
        volume_color=rng.uniform(size=(n_l, 3)).astype(np.float32),
        volume_density=rng.uniform(0.0, 2.0, size=n_l).astype(np.float32),
    )
    acc_rough = rng.uniform(0.0, 1.0, size=n_l).astype(np.float32)
    return dict(n=n, d=d, ls_wi=ls_wi, u=u, uc=uc, uc2=uc2, mat=mat,
                acc_rough=acc_rough)


def _lane_material(mat):
    z = jnp.zeros(mat["metallic"].shape[0], jnp.int32) - 1
    return B.LaneMaterial(
        base=jnp.asarray(mat["base"]),
        metallic=jnp.asarray(mat["metallic"]),
        roughness=jnp.asarray(mat["roughness"]),
        roughness_base=jnp.asarray(mat["roughness"]),
        transmission=jnp.asarray(mat["transmission"]),
        ior=jnp.asarray(mat["ior"]),
        anisotropic=jnp.asarray(mat["anisotropic"]),
        aniso_rotation=jnp.asarray(mat["aniso_rotation"]),
        clearcoat=jnp.asarray(mat["clearcoat"]),
        cc_roughness=jnp.asarray(mat["cc_roughness"]),
        cc_roughness_base=jnp.asarray(mat["cc_roughness"]),
        emission=jnp.asarray(mat["emission"]),
        thin=jnp.asarray(mat["thin"]),
        volume_color=jnp.asarray(mat["volume_color"]),
        volume_density=jnp.asarray(mat["volume_density"]),
    )


def _component_inputs(lanes):
    m = lanes["mat"]
    n = lanes["n"]
    d = lanes["d"]

    def v3(a):
        a = jnp.asarray(a)
        return (a[:, 0], a[:, 1], a[:, 2])

    return dict(
        n=v3(n), d=v3(d), ls_wi=v3(lanes["ls_wi"]),
        u0=jnp.asarray(lanes["u"][:, 0]), u1=jnp.asarray(lanes["u"][:, 1]),
        uc=jnp.asarray(lanes["uc"]), uc2=jnp.asarray(lanes["uc2"]),
        acc_rough=jnp.asarray(lanes["acc_rough"]),
        reg_threshold=jnp.float32(0.5),
        base=v3(m["base"]), metallic=jnp.asarray(m["metallic"]),
        roughness=jnp.asarray(m["roughness"]),
        roughness_base=jnp.asarray(m["roughness"]),
        transmission=jnp.asarray(m["transmission"]),
        ior=jnp.asarray(m["ior"]),
        anisotropic=jnp.asarray(m["anisotropic"]),
        aniso_rotation=jnp.asarray(m["aniso_rotation"]),
        clearcoat=jnp.asarray(m["clearcoat"]),
        cc_roughness=jnp.asarray(m["cc_roughness"]),
        cc_roughness_base=jnp.asarray(m["cc_roughness"]),
        emission=v3(m["emission"]), thin=jnp.asarray(m["thin"]),
        volume_color=v3(m["volume_color"]),
        volume_density=jnp.asarray(m["volume_density"]),
    )


GATES = (True, True, True, True)


def _stack(v):
    return np.stack([np.asarray(c) for c in v], axis=-1)


def test_sample_f_pdf_equivalence(lanes):
    tables = lut.load_tables()
    mat = _lane_material(lanes["mat"])
    n = jnp.asarray(lanes["n"])
    d = jnp.asarray(lanes["d"])
    tg = shading_tangent(n)
    fx, fy, fz = frame_from_normal_tangent(n, tg)
    wo_local = world_to_local(-d, fx, fy, fz)
    wi_l_local = world_to_local(jnp.asarray(lanes["ls_wi"]), fx, fy, fz)
    regularized = jnp.asarray(lanes["acc_rough"]) > 0.5

    @jax.jit
    def ref():
        smp = B.bsdf_sample(
            tables, mat, wo_local, jnp.asarray(lanes["u"]),
            jnp.asarray(lanes["uc"]), jnp.asarray(lanes["uc2"]),
            regularized, meta=None,
        )
        f_l = B.bsdf_f(tables, mat, wo_local, wi_l_local, meta=None)
        pdf_b = B.bsdf_pdf(tables, mat, wo_local, wi_l_local, meta=None)
        return smp, f_l, pdf_b

    @jax.jit
    def comp():
        inp = _component_inputs(lanes)
        cand = SM.candidates(inp, GATES)
        fet = SM.run_fetches(tables, cand["coords"])
        smp = SM.bsdf_sample_c(inp, cand, fet, GATES)
        f_l = SM.bsdf_f_c(inp, cand, fet, GATES)
        pdf_b = SM.bsdf_pdf_c(inp, cand, fet, GATES)
        return smp, f_l, pdf_b

    smp_r, f_r, pdf_r = jax.tree_util.tree_map(np.asarray, ref())
    smp_c, f_c, pdf_c = jax.tree_util.tree_map(np.asarray, comp())

    # Lanes whose one-sample lobe choice sits within float noise of a
    # selection threshold can legitimately pick different lobes; exclude
    # only exact flag mismatches that stem from that (expected ~0 at fixed
    # seed) and require everything else to match tightly.
    flags_match = smp_r.flags == smp_c["flags"]
    assert flags_match.mean() > 0.995, f"flags differ on {(~flags_match).sum()} lanes"
    sel = flags_match

    def close(a, b, name, rtol=3e-4, atol=3e-5):
        a = np.asarray(a)[sel]
        b = np.asarray(b)[sel]
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, err_msg=name)

    close(smp_r.wi, _stack(smp_c["wi"]), "wi")
    close(smp_r.pdf, smp_c["pdf"], "pdf")
    close(smp_r.f, _stack(smp_c["f"]), "f", rtol=1e-3, atol=1e-4)
    close(smp_r.Le, _stack(smp_c["Le"]), "Le")
    close(smp_r.roughness, smp_c["roughness"], "roughness")
    np.testing.assert_allclose(
        f_r, _stack(f_c), rtol=1e-3, atol=1e-4, err_msg="bsdf_f"
    )
    np.testing.assert_allclose(
        pdf_r, pdf_c, rtol=1e-3, atol=1e-4, err_msg="bsdf_pdf"
    )


def _render(scene, meta, cfg, size=(12, 12), spp=4):
    from yart_tpu.config import CameraConfig
    from yart_tpu.ops.qmc import make_sampler
    from yart_tpu.render.camera import build_camera
    from yart_tpu.render.integrator import render_wave

    cam = build_camera(
        CameraConfig(image_size=size, focal_length=28.0,
                     position=(0, 1.0, 3.4), forward=(0, 0, -1))
    )
    sampler = make_sampler(cfg.sampler, spp, size, cfg.seed)
    w, h = size
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), spp), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), spp), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(spp), w * h), jnp.uint32)
    img, rays = jax.jit(
        lambda: render_wave(scene, meta, cam, sampler, cfg, px, py, sidx)
    )()
    return np.asarray(img), float(rays)


def _assert_images_equivalent(a, b, rays_a, rays_b):
    # The two op orderings agree to float noise EXCEPT on lanes whose
    # one-sample lobe / roulette / NEE decision sits within an ulp of its
    # threshold under XLA's refused vs fused rounding — those flip to a
    # different (equally valid) estimator sample. Eagerly there are zero
    # flips (verified); under jit allow a handful of lanes while requiring
    # everything else to match tightly and the estimate to be unbiased.
    diff = np.abs(a - b)
    scale = np.maximum(np.abs(a), 1.0)
    rel = diff / scale
    assert (rel < 1e-3).mean() > 0.99, f"flip fraction {(rel >= 1e-3).mean()}"
    assert np.median(rel) < 1e-5
    assert abs(a.mean() - b.mean()) < 0.02 * max(a.mean(), 1e-6)
    assert abs(rays_a - rays_b) <= max(8.0, 0.005 * rays_a)


@pytest.mark.parametrize("integrator", ["mis", "naive"])
def test_integrator_xla_shade_matches_classic(integrator):
    import dataclasses

    from yart_tpu.config import RenderConfig
    from yart_tpu.scene.procedural import cornell_box

    scene, meta = cornell_box(extra_materials=True).compile()
    base = RenderConfig(samples=4, max_depth=4, integrator=integrator)
    a, ra = _render(scene, meta, base)
    b, rb = _render(
        scene, meta, dataclasses.replace(base, shade_kernel="xla")
    )
    _assert_images_equivalent(a, b, ra, rb)


def test_integrator_xla_shade_env_scene():
    import dataclasses

    from yart_tpu.config import RenderConfig
    from yart_tpu.scene.procedural import furnace

    scene, meta = furnace().compile()
    base = RenderConfig(samples=4, max_depth=4)
    a, ra = _render(scene, meta, base)
    b, rb = _render(
        scene, meta, dataclasses.replace(base, shade_kernel="xla")
    )
    _assert_images_equivalent(a, b, ra, rb)


def test_integrator_pallas_shade_matches_xla():
    """The Pallas shade kernel (interpret mode on CPU) vs the XLA assembly
    of the same component math — same ops, same order, so the agreement is
    float-exact up to the f32 packing of bools."""
    import dataclasses

    from yart_tpu.config import RenderConfig
    from yart_tpu.scene.procedural import cornell_box

    scene, meta = cornell_box(extra_materials=True).compile()
    base = RenderConfig(samples=4, max_depth=4)
    a, ra = _render(
        scene, meta, dataclasses.replace(base, shade_kernel="xla")
    )
    b, rb = _render(
        scene, meta, dataclasses.replace(base, shade_kernel="pallas")
    )
    _assert_images_equivalent(a, b, ra, rb)


def test_pallas_dead_block_passthrough(lanes):
    """All-inactive blocks take the blive skip; outputs must equal the
    finish() passthrough semantics (state copied, zero contributions)."""
    from yart_tpu.kernels.pallas_shade import shade_pallas

    inp = _component_inputs(lanes)
    n_l = lanes["n"].shape[0]
    zero3 = (jnp.zeros(n_l), jnp.zeros(n_l), jnp.zeros(n_l))
    inp.update(
        o=zero3, p=inp["n"], atten=(jnp.ones(n_l),) * 3,
        last_p=zero3, last_pdf=jnp.ones(n_l),
        found=jnp.zeros(n_l, bool), active=jnp.zeros(n_l, bool),
        specular_prev=jnp.zeros(n_l, bool),
        depth0=jnp.zeros(n_l, bool), rr_on=jnp.ones(n_l, bool),
        light_neg=jnp.ones(n_l, bool), hit_back=jnp.zeros(n_l, bool),
        hit_t=jnp.ones(n_l), u_rr=jnp.asarray(lanes["uc"]),
        pdf_area=jnp.zeros(n_l), sel_p=jnp.zeros(n_l),
        ls_Li=zero3, ls_pdf=jnp.ones(n_l), ls_select_p=jnp.ones(n_l),
        ls_n=inp["n"], ls_p=zero3, ls_valid=jnp.ones(n_l, bool),
        ls_is_env=jnp.zeros(n_l, bool),
    )
    out = shade_pallas(inp, GATES, mis=True, any_lights=True)
    assert not np.asarray(out["active"]).any()
    assert not np.asarray(out["nee_need"]).any()
    np.testing.assert_array_equal(_stack(out["L_emit"]), 0.0)
    np.testing.assert_array_equal(_stack(out["contrib"]), 0.0)
    np.testing.assert_array_equal(_stack(out["o"]), 0.0)
    np.testing.assert_array_equal(_stack(out["d"]), _stack(inp["d"]))
    np.testing.assert_array_equal(_stack(out["atten"]), 1.0)
    np.testing.assert_array_equal(np.asarray(out["last_pdf"]), 1.0)
    np.testing.assert_array_equal(
        np.asarray(out["shadow_tmax"]), -1.0
    )


def test_inkernel_draws_bit_exact():
    """Component-form ZSobol / Hash draws (shade_math.zsobol_get*_c,
    hash_get1d_c) must reproduce ops/qmc.py BIT-exactly — the property that
    keeps images identical when the pallas shade kernel computes its own
    sampler dims."""
    from yart_tpu.ops.qmc import (
        HashSampler,
        U32,
        ZSobolSampler,
        sobol_matrix_dim1,
    )

    rng = np.random.default_rng(3)
    n_l = 256
    px = jnp.asarray(rng.integers(0, 512, n_l), jnp.uint32)
    py = jnp.asarray(rng.integers(0, 512, n_l), jnp.uint32)
    sidx = jnp.asarray(rng.integers(0, 8, n_l), jnp.uint32)

    zs = ZSobolSampler(8, (512, 512), seed=0)
    st = zs.init_lanes(px, py, sidx)
    matrix1 = tuple(int(x) for x in sobol_matrix_dim1())
    for dim in (4, 7, 12, 27):
        ref1 = np.asarray(zs.get1d(st, jnp.uint32(dim)))
        got1 = np.asarray(SM.zsobol_get1d_c(
            st.hi, st.lo, zs._perm_c[dim], zs._seed_1d[dim],
            zs.n_base4_digits, zs.log2spp,
        ))
        np.testing.assert_array_equal(ref1, got1, err_msg=f"get1d dim {dim}")

        ref2 = np.asarray(zs.get2d(st, jnp.uint32(dim)))
        ga, gb = SM.zsobol_get2d_c(
            st.hi, st.lo, zs._perm_c[dim], zs._seed_2d_a[dim],
            zs._seed_2d_b[dim], zs.n_base4_digits, zs.log2spp, matrix1,
        )
        np.testing.assert_array_equal(ref2[:, 0], np.asarray(ga))
        np.testing.assert_array_equal(ref2[:, 1], np.asarray(gb))

    hs = HashSampler(8, (512, 512), seed=0)
    sth = hs.init_lanes(px, py, sidx)
    for dim in (4, 7, 12):
        ref = np.asarray(hs.get1d(sth, jnp.uint32(dim)))
        got = np.asarray(SM.hash_get1d_c(
            sth, jnp.uint32(dim) * U32(0xC2B2AE35)
        ))
        np.testing.assert_array_equal(ref, got, err_msg=f"hash dim {dim}")


def test_draws_pallas_bit_exact():
    """The draws kernel end-to-end (pack + pallas + unpack, interpret on
    CPU) vs the sampler's own XLA draws."""
    from yart_tpu.kernels.pallas_shade import draws_pallas, sampler_draw_setup
    from yart_tpu.ops.qmc import HashSampler, ZSobolSampler

    rng = np.random.default_rng(5)
    n_l = 300  # deliberately not a block multiple (exercises padding)
    px = jnp.asarray(rng.integers(0, 256, n_l), jnp.uint32)
    py = jnp.asarray(rng.integers(0, 256, n_l), jnp.uint32)
    sidx = jnp.asarray(rng.integers(0, 4, n_l), jnp.uint32)

    for sampler in (ZSobolSampler(4, (256, 256)), HashSampler(4, (256, 256))):
        st = sampler.init_lanes(px, py, sidx)
        dim0 = jnp.uint32(12)
        setup = sampler_draw_setup(sampler, st, dim0)
        assert setup is not None
        out = draws_pallas(setup, n_l)
        u = np.asarray(sampler.get2d(st, dim0))
        u_l = np.asarray(sampler.get2d(st, dim0 + 5))
        np.testing.assert_array_equal(np.asarray(out["u0"]), u[:, 0])
        np.testing.assert_array_equal(np.asarray(out["u1"]), u[:, 1])
        np.testing.assert_array_equal(
            np.asarray(out["uc"]), np.asarray(sampler.get1d(st, dim0 + 2)))
        np.testing.assert_array_equal(
            np.asarray(out["uc2"]), np.asarray(sampler.get1d(st, dim0 + 3)))
        np.testing.assert_array_equal(
            np.asarray(out["uc_l"]), np.asarray(sampler.get1d(st, dim0 + 4)))
        np.testing.assert_array_equal(np.asarray(out["ul0"]), u_l[:, 0])
        np.testing.assert_array_equal(np.asarray(out["ul1"]), u_l[:, 1])
        np.testing.assert_array_equal(
            np.asarray(out["u_rr"]), np.asarray(sampler.get1d(st, dim0 + 7)))


def test_pallas_shade_mesh_invariance():
    """The pallas shade path must partition over a device mesh and stay
    bit-identical to the single-device render (8-virtual-device conftest
    mesh; samplers are counter-based so sharding cannot change streams)."""
    import dataclasses

    from yart_tpu.config import CameraConfig, RenderConfig
    from yart_tpu.render.renderer import Renderer
    from yart_tpu.scene.procedural import cornell_box

    scene, meta = cornell_box(extra_materials=True).compile()
    cam = CameraConfig(image_size=(16, 16), focal_length=28.0,
                       position=(0, 1.0, 3.4), forward=(0, 0, -1))
    cfg = dataclasses.replace(
        RenderConfig(samples=4, max_depth=4, first_wave_samples=4,
                     max_wave_samples=4, tonemap="none"),
        shade_kernel="pallas",
    )
    r1 = Renderer(scene, meta, cam, cfg, devices=None).render().hdr
    r4 = Renderer(scene, meta, cam, cfg, devices=4).render().hdr
    np.testing.assert_array_equal(r1, r4)


def test_integrator_pallas_shade_textured():
    """Textured scene (atlas-resolved materials + normal maps enter the
    kernel as inputs): pallas vs classic."""
    import dataclasses

    from yart_tpu.config import CameraConfig, RenderConfig
    from yart_tpu.ops.qmc import make_sampler
    from yart_tpu.render.camera import build_camera
    from yart_tpu.render.integrator import render_wave
    from yart_tpu.scene.procedural import textured_box_scene

    scene, meta = textured_box_scene().compile()
    size = (10, 10)
    cam = build_camera(
        CameraConfig(image_size=size, focal_length=26.0,
                     position=(0.0, 1.2, 4.0), forward=(0, -0.15, -1))
    )
    spp = 4
    w, h = size
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), spp), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), spp), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(spp), w * h), jnp.uint32)

    imgs = {}
    for mode in ("off", "pallas"):
        cfg = dataclasses.replace(
            RenderConfig(samples=spp, max_depth=4), shade_kernel=mode
        )
        sampler = make_sampler(cfg.sampler, cfg.samples, size, cfg.seed)
        img, rays = jax.jit(
            lambda cfg=cfg, sampler=sampler: render_wave(
                scene, meta, cam, sampler, cfg, px, py, sidx
            )
        )()
        imgs[mode] = (np.asarray(img), float(rays))
    a, ra = imgs["off"]
    b, rb = imgs["pallas"]
    _assert_images_equivalent(a, b, ra, rb)
