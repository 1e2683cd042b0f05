"""Image-level parity vs the reference oracle.

tests/goldens/oracle_images.npz holds full 16x16 HDR renders produced by the
REFERENCE's own integrators (tools/oracle/make_goldens.py: patched-copy build
of /root/reference with a mean estimator) at 8192 spp. Here the same scenes
render through yart_tpu and must agree per pixel within a computed noise
bound — not just in aggregate means (the round-1 gap: quadrant means only).

Noise model: both sides are Monte Carlo with independent sample streams, so
|a - b| per pixel is bounded by k * (sigma_a + sigma_b). The per-pixel
sample variance of the yart render is measured directly from its own
samples; the oracle term scales that by sqrt(spp_test / spp_oracle).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yart_tpu.config import CameraConfig, RenderConfig
from yart_tpu.ops.qmc import make_sampler
from yart_tpu.render.camera import build_camera
from yart_tpu.render.integrator import render_wave
from yart_tpu.scene.procedural import cornell_box, furnace

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "oracle_images.npz")
RES = 16
SPP = 512


@pytest.fixture(scope="module")
def oracle():
    if not os.path.exists(GOLDENS):
        pytest.skip("oracle_images.npz not generated")
    return np.load(GOLDENS)


def _render(scene, meta, cam_cfg, spp=SPP, mis=True):
    """Render RES x RES, returning (mean image, per-pixel sample std)."""
    cam = build_camera(cam_cfg)
    cfg = RenderConfig(
        samples=spp, max_depth=30, integrator="mis" if mis else "naive"
    )
    sampler = make_sampler(cfg.sampler, cfg.samples, (RES, RES), cfg.seed)
    yy, xx = np.meshgrid(np.arange(RES), np.arange(RES), indexing="ij")
    img = np.zeros((RES * RES, 3), np.float64)
    m2 = np.zeros((RES * RES, 3), np.float64)
    chunk = 64  # samples per pass (memory-bounded)
    fn = jax.jit(
        lambda scene, px, py, sidx: render_wave(
            scene, meta, cam, sampler, cfg, px, py, sidx
        )
    )
    px = jnp.asarray(np.repeat(xx.reshape(-1), chunk), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), chunk), jnp.int32)
    for base in range(0, spp, chunk):
        sidx = jnp.asarray(
            np.tile(np.arange(chunk) + base, RES * RES), jnp.uint32
        )
        rad, _ = fn(scene, px, py, sidx)
        r = np.asarray(rad, np.float64).reshape(RES * RES, chunk, 3)
        img += r.sum(axis=1)
        m2 += (r ** 2).sum(axis=1)
    mean = img / spp
    var = np.maximum(m2 / spp - mean ** 2, 0.0)
    std_of_mean = np.sqrt(var / spp)
    return mean.reshape(RES, RES, 3), std_of_mean.reshape(RES, RES, 3)


def _assert_image_parity(ours, std, ref, spp_ref, label, k=5.0, floor=2e-3,
                         frac=0.01, mean_rel=0.0):
    # Oracle noise approximated from ours scaled to its spp. `frac` widens
    # for scenes with near-specular caustics whose firefly distribution is
    # heavy-tailed (the 5-sigma Gaussian model undercovers); `mean_rel`
    # widens the whole-image mean check where the re-baked multiscatter
    # LUTs' documented ±0.006 table delta is amplified by the (1-E)/E
    # compensation gain (metal/aniso energies shift ~1%).
    std_ref = std * np.sqrt(SPP / spp_ref)
    bound = k * (std + std_ref) + floor
    delta = np.abs(ours - ref)
    bad = delta > bound
    frac_bad = bad.mean()
    assert frac_bad < frac, (
        f"{label}: {frac_bad:.1%} of channels outside the {k}-sigma bound; "
        f"worst delta {delta.max():.4f} vs bound {bound[bad].min() if bad.any() else 0:.4f}"
    )
    # Whole-image mean must agree much tighter than any pixel.
    mean_tol = k * float(np.mean(std)) / RES + 1e-3
    mean_tol = max(mean_tol, 5e-3, mean_rel * abs(float(ref.mean())))
    assert abs(ours.mean() - ref.mean()) < mean_tol, (
        f"{label}: image means differ {ours.mean():.4f} vs {ref.mean():.4f}"
    )


def test_cornell_mis_image_parity(oracle):
    scene, meta = cornell_box(boxes=False).compile()
    cam = CameraConfig(
        image_size=(RES, RES), focal_length=28.0,
        position=(0, 1.0, 3.4), forward=(0, 0, -1),
    )
    ours, std = _render(scene, meta, cam, mis=True)
    _assert_image_parity(
        ours, std, oracle["cornell_mis"], int(oracle["spp"]), "cornell mis"
    )


def test_cornell_naive_image_parity(oracle):
    scene, meta = cornell_box(boxes=False).compile()
    cam = CameraConfig(
        image_size=(RES, RES), focal_length=28.0,
        position=(0, 1.0, 3.4), forward=(0, 0, -1),
    )
    ours, std = _render(scene, meta, cam, mis=False)
    _assert_image_parity(
        ours, std, oracle["cornell_naive"], int(oracle["spp"]), "cornell naive"
    )


def test_furnace_naive_image_parity(oracle):
    scene, meta = furnace(env_value=0.5).compile()
    cam = CameraConfig(
        image_size=(RES, RES), focal_length=30.0,
        position=(0, 0, 3.5), forward=(0, 0, -3.5),
    )
    ours, std = _render(scene, meta, cam, mis=False)
    _assert_image_parity(
        ours, std, oracle["furnace_naive"], int(oracle["spp"]), "furnace naive"
    )


def test_furnace_mis_image_parity(oracle):
    scene, meta = furnace(env_value=0.5).compile()
    cam = CameraConfig(
        image_size=(RES, RES), focal_length=30.0,
        position=(0, 0, 3.5), forward=(0, 0, -3.5),
    )
    ours, std = _render(scene, meta, cam, mis=True)
    _assert_image_parity(
        ours, std, oracle["furnace_mis"], int(oracle["spp"]), "furnace mis"
    )


def _furnace_parity(oracle, key, mis=True, **mat_kwargs):
    if key not in oracle.files:
        pytest.skip(f"{key} not in oracle goldens (regenerate with "
                    "tools/oracle/make_goldens.py)")
    scene, meta = furnace(env_value=0.5, **mat_kwargs).compile()
    cam = CameraConfig(
        image_size=(RES, RES), focal_length=30.0,
        position=(0, 0, 3.5), forward=(0, 0, -3.5),
    )
    ours, std = _render(scene, meta, cam, mis=mis)
    _assert_image_parity(ours, std, oracle[key], int(oracle["spp"]), key,
                         mean_rel=0.015)


def test_glass_mis_image_parity(oracle):
    """Rough dielectric (reflect + refract + ggxGlassE compensation,
    parametric.cpp:462-575) — the McLaren canopy lobe."""
    _furnace_parity(oracle, "glass_mis", roughness=0.2, transmission=1.0,
                    ior=1.5)


def test_glass_naive_image_parity(oracle):
    _furnace_parity(oracle, "glass_naive", mis=False, roughness=0.2,
                    transmission=1.0, ior=1.5)


def test_thinglass_mis_image_parity(oracle):
    """Thin transmission (flip trick, parametric.cpp:527-536)."""
    _furnace_parity(oracle, "thinglass_mis", roughness=0.2,
                    transmission=1.0, ior=1.5, thin=True)


def test_clearcoat_mis_image_parity(oracle):
    """Clearcoat layer over glossy (Fresnel-weighted attenuation,
    parametric.cpp:732-832) — the McLaren paint lobe."""
    _furnace_parity(oracle, "clearcoat_mis", roughness=0.6, clearcoat=1.0,
                    cc_roughness=0.1)


def test_metal_mis_image_parity(oracle):
    """Rough conductor (Schlick F + Turquin compensation,
    parametric.cpp:260-352)."""
    _furnace_parity(oracle, "metal_mis", roughness=0.3, metallic=1.0)


def test_aniso_mis_image_parity(oracle):
    """Anisotropic GGX with rotation (alphas aspect + frame rotation,
    bsdf.hpp:177-187, parametric.cpp:50-51)."""
    _furnace_parity(oracle, "aniso_mis", roughness=0.35, metallic=1.0,
                    anisotropic=0.8, aniso_rotation=0.7)


def test_cornell_mat_mis_image_parity(oracle):
    """The full multi-lobe MIS interplay in one image: diffuse walls, a
    rough-metal tall box and a near-specular glass short box under an area
    light — geometry replicated exactly in the oracle harness (f32 vertex
    literals). Caustic pixels carry huge variance at these sample counts;
    the measured per-pixel std widens the bound accordingly."""
    if "cornellmat_mis" not in oracle.files:
        pytest.skip("cornellmat_mis not in oracle goldens")
    scene, meta = cornell_box(extra_materials=True).compile()
    cam = CameraConfig(
        image_size=(RES, RES), focal_length=28.0,
        position=(0, 1.0, 3.4), forward=(0, 0, -1),
    )
    ours, std = _render(scene, meta, cam, mis=True)
    _assert_image_parity(
        ours, std, oracle["cornellmat_mis"], int(oracle["spp"]),
        "cornell-mat mis", frac=0.025,
    )


@pytest.mark.parametrize("name", ["probe_aniso", "probe_mixed", "probe_thin"])
def test_bsdf_probe_parity(oracle, name):
    """Lane-level f/pdf vs the reference BSDF on a deterministic direction
    grid (tools/oracle probe mode) — catches frame/rotation/sign quirks
    that image noise can hide (this harness found the reference's
    unrotated pdfImpl and its signed-cos thin transmission). f tolerance
    is bounded by the re-baked LUT delta (~±0.006 on the glass tables);
    pdf carries no LUTs except glossy kappa and must match tightly."""
    if name not in oracle.files:
        pytest.skip(f"{name} not in oracle goldens")
    import jax.numpy as jnp

    from yart_tpu.ops import lut
    from yart_tpu.render import bsdf as B

    rows = np.asarray(oracle[name], np.float64)
    r, m, t, cc, ccr, thin, ior, aniso, arot = (
        float(x) for x in oracle[name + "_args"]
    )
    n = rows.shape[0]
    wo = jnp.asarray(rows[:, 0:3], jnp.float32)
    wi = jnp.asarray(rows[:, 3:6], jnp.float32)
    ones = jnp.ones((n,), jnp.float32)
    mat = B.LaneMaterial(
        base=jnp.tile(jnp.asarray([[0.8, 0.6, 0.4]], jnp.float32), (n, 1)),
        metallic=ones * m, roughness=ones * r, roughness_base=ones * r,
        transmission=ones * t, ior=ones * ior, anisotropic=ones * aniso,
        aniso_rotation=ones * arot, clearcoat=ones * cc,
        cc_roughness=ones * ccr, cc_roughness_base=ones * ccr,
        emission=jnp.zeros((n, 3)), thin=jnp.full((n,), bool(thin)),
        volume_color=jnp.ones((n, 3)), volume_density=jnp.zeros((n,)),
    )
    tables = lut.load_tables()
    f = np.asarray(B.bsdf_f(tables, mat, wo, wi, meta=None), np.float64)
    pdf = np.asarray(B.bsdf_pdf(tables, mat, wo, wi, meta=None), np.float64)
    f_ref = rows[:, 6:9]
    pdf_ref = rows[:, 9]
    relf = np.abs(f - f_ref) / np.maximum(np.abs(f_ref), 1e-3)
    relp = np.abs(pdf - pdf_ref) / np.maximum(np.abs(pdf_ref), 1e-3)
    assert relf.max() < 0.05, f"{name}: f max rel {relf.max():.4f}"
    assert relp.max() < 0.01, f"{name}: pdf max rel {relp.max():.5f}"


@pytest.mark.parametrize("name", ["probe_aniso", "probe_mixed", "probe_thin"])
def test_bsdf_sample_probe_parity(oracle, name):
    """Lane-level bsdf_sample vs the reference on deterministic (wo, u, uc,
    uc2): flags, wi, f, pdf must agree. The sample path uses the ROTATED
    pdf (unlike pdfImpl) — this pins that asymmetry. Lobe selections whose
    thresholds involve re-baked LUT values (kappa, p_coat) may flip on a
    few lanes; those are excluded (bounded fraction)."""
    key = name + "_smp"
    if key not in oracle.files:
        pytest.skip(f"{key} not in oracle goldens")
    import jax.numpy as jnp

    from yart_tpu.ops import lut
    from yart_tpu.render import bsdf as B

    rows = np.asarray(oracle[key], np.float64)
    r, m, t, cc, ccr, thin, ior, aniso, arot = (
        float(x) for x in oracle[name + "_args"]
    )
    n = rows.shape[0]
    wo = jnp.asarray(rows[:, 0:3], jnp.float32)
    u = jnp.asarray(rows[:, 3:5], jnp.float32)
    uc = jnp.asarray(rows[:, 5], jnp.float32)
    uc2 = jnp.asarray(rows[:, 6], jnp.float32)
    ones = jnp.ones((n,), jnp.float32)
    mat = B.LaneMaterial(
        base=jnp.tile(jnp.asarray([[0.8, 0.6, 0.4]], jnp.float32), (n, 1)),
        metallic=ones * m, roughness=ones * r, roughness_base=ones * r,
        transmission=ones * t, ior=ones * ior, anisotropic=ones * aniso,
        aniso_rotation=ones * arot, clearcoat=ones * cc,
        cc_roughness=ones * ccr, cc_roughness_base=ones * ccr,
        emission=jnp.zeros((n, 3)), thin=jnp.full((n,), bool(thin)),
        volume_color=jnp.ones((n, 3)), volume_density=jnp.zeros((n,)),
    )
    tables = lut.load_tables()
    smp = B.bsdf_sample(
        tables, mat, wo, u, uc, uc2, jnp.zeros((n,), bool), meta=None
    )
    flags_ref = rows[:, 7].astype(np.int32)
    flags = np.asarray(smp.flags)
    match = flags == flags_ref
    assert match.mean() > 0.97, (
        f"{name}: flags mismatch on {(~match).sum()}/{n} lanes"
    )
    # ABSORBED lanes terminate: the reference zeroes wi/pdf, we carry the
    # rejected direction — neither is ever consumed. Compare live lanes.
    match = match & (flags_ref != 0)
    wi_ref = rows[:, 8:11]
    f_ref = rows[:, 11:14]
    pdf_ref = rows[:, 14]
    wi = np.asarray(smp.wi, np.float64)[match]
    f = np.asarray(smp.f, np.float64)[match]
    pdf = np.asarray(smp.pdf, np.float64)[match]
    np.testing.assert_allclose(wi, wi_ref[match], rtol=1e-3, atol=2e-3,
                               err_msg=f"{name} wi")
    relf = np.abs(f - f_ref[match]) / np.maximum(np.abs(f_ref[match]), 1e-3)
    relp = np.abs(pdf - pdf_ref[match]) / np.maximum(
        np.abs(pdf_ref[match]), 1e-3
    )
    # Two re-baked-table amplifiers make isolated lanes diverge by tens of
    # percent while the formulas match exactly: (a) glass/metal f divides
    # by the multiscatter energy E, tiny at grazing; (b) backside cosines
    # EXTRAPOLATE off the table edge with |frac| up to ~15 (the reference's
    # size_t-cast quirk), multiplying the last-bin delta. Bound the tail,
    # not just the max.
    for rel, what in ((relf.max(axis=1), "f"), (relp, "pdf")):
        assert (rel > 0.06).mean() < 0.02, (
            f"{name}: {int((rel > 0.06).sum())} lanes over 6% {what} delta"
        )
        assert rel.max() < 0.6, f"{name}: sample {what} max rel {rel.max():.4f}"


def test_sampler_stream_bit_parity(oracle):
    """Our counter-based ZSobol reproduces the reference's sequential
    SobolSampler<FastOwenScrambler> BIT-EXACTLY per (pixel, sample, dim) —
    the k-th sequential get1D uses dim k-1 pre-increment (sampler.hpp:
    89-106), so matched seeds give matched streams (SURVEY.md hard part 3).
    This pins the base-4 permutations, mixBits, the generated dim-1 Sobol
    matrix, FastOwen scrambling AND the float conversion (float(v)*2^-32
    rounds to nearest; a top-24-bit truncation is one 2^-24 off on half
    of all draws)."""
    if "probe_draws" not in oracle.files:
        pytest.skip("probe_draws not in oracle goldens")
    from yart_tpu.ops.qmc import ZSobolSampler

    rows = np.asarray(oracle["probe_draws"], np.float64)
    px = jnp.asarray(rows[:, 0], jnp.uint32)
    py = jnp.asarray(rows[:, 1], jnp.uint32)
    s = jnp.asarray(rows[:, 2], jnp.uint32)
    zs = ZSobolSampler(8, (512, 512), seed=0)
    st = zs.init_lanes(px, py, s)
    for d in range(16):
        np.testing.assert_array_equal(
            np.asarray(zs.get1d(st, jnp.uint32(d))),
            rows[:, 3 + d].astype(np.float32), err_msg=f"get1d dim {d}",
        )
    for k in range(8):
        got = np.asarray(zs.get2d(st, jnp.uint32(2 * k)))
        np.testing.assert_array_equal(
            got, rows[:, 19 + 2 * k: 21 + 2 * k].astype(np.float32),
            err_msg=f"get2d dim {2 * k}",
        )
