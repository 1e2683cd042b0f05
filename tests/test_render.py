"""End-to-end render tests: furnace energy conservation, Cornell box
structure, determinism, checkpoint resume (SURVEY.md §4.2-4.3)."""

import os

import numpy as np
import pytest

from yart_tpu.config import CameraConfig, RenderConfig
from yart_tpu.render.renderer import Renderer, wave_plan
from yart_tpu.scene.procedural import cornell_box, furnace

SMALL = dict(first_wave_samples=16, max_wave_samples=16)


@pytest.fixture(scope="module")
def furnace_scene():
    return furnace(env_value=0.5).compile()


@pytest.fixture(scope="module")
def cornell_scene():
    return cornell_box().compile()


def furnace_cam(n=24):
    return CameraConfig(
        image_size=(n, n), focal_length=30.0, position=(0, 0, 3.5),
        forward=(0, 0, -3.5),
    )


def cornell_cam(n=32):
    return CameraConfig(
        image_size=(n, n), focal_length=28.0, position=(0, 1.0, 3.4),
        forward=(0, 0, -1),
    )


def test_furnace_white_naive(furnace_scene):
    """White diffuse sphere in a 0.5 env must disappear under the naive
    (unbiased) integrator. Reference oracle value: 0.4899 (tools/oracle)."""
    scene, meta = furnace_scene
    cfg = RenderConfig(samples=64, max_depth=24, integrator="naive",
                       tonemap="none", estimator="mean",
                       first_wave_samples=64, max_wave_samples=64)
    res = Renderer(scene, meta, furnace_cam(16), cfg).render()
    img = res.hdr
    assert np.isfinite(img).all()
    center = img[6:10, 6:10]
    assert abs(center.mean() - 0.49) < 0.02, center.mean()


def test_furnace_mis_matches_reference(furnace_scene):
    """The MIS integrator reproduces the reference's (biased) furnace value:
    oracle MIS = 0.3786 at these settings (see tools/oracle/README.md)."""
    scene, meta = furnace_scene
    cfg = RenderConfig(samples=64, max_depth=24, integrator="mis",
                       tonemap="none", estimator="mean",
                       first_wave_samples=64, max_wave_samples=64)
    res = Renderer(scene, meta, furnace_cam(16), cfg).render()
    center = res.hdr[6:10, 6:10]
    assert abs(center.mean() - 0.3786) < 0.025, center.mean()


def test_cornell_structure(cornell_scene):
    scene, meta = cornell_scene
    cfg = RenderConfig(samples=16, max_depth=6, tonemap="none",
                       estimator="mean", **SMALL)
    res = Renderer(scene, meta, cornell_cam(), cfg).render()
    img = res.hdr
    assert np.isfinite(img).all()
    assert img.mean() > 0.01  # not black
    left = img[8:24, :6].mean(axis=(0, 1))
    right = img[8:24, -6:].mean(axis=(0, 1))
    assert left[0] > left[1] * 1.5, left  # red wall
    assert right[1] > right[0] * 1.5, right  # green wall


def test_determinism(cornell_scene):
    scene, meta = cornell_scene
    cfg = RenderConfig(samples=4, max_depth=4, tonemap="none",
                       estimator="mean", first_wave_samples=4,
                       max_wave_samples=4)
    r1 = Renderer(scene, meta, cornell_cam(16), cfg).render().hdr
    r2 = Renderer(scene, meta, cornell_cam(16), cfg).render().hdr
    np.testing.assert_array_equal(r1, r2)


def test_wave_plan():
    assert wave_plan(64, 1, 16) == [1, 2, 4, 8, 16, 16, 16, 1]
    assert wave_plan(4, 4, 16) == [4]
    assert wave_plan(1, 1, 16) == [1]
    assert sum(wave_plan(2048, 1, 16)) == 2048


def test_checkpoint_resume(tmp_path, cornell_scene):
    scene, meta = cornell_scene
    cfg = RenderConfig(samples=8, max_depth=4, tonemap="none",
                       estimator="mean", first_wave_samples=4,
                       max_wave_samples=4)
    ck = str(tmp_path / "ck.npz")
    # Full render in one go.
    full = Renderer(scene, meta, cornell_cam(16), cfg).render().hdr

    # Render the first wave only (same total-spp config: the ZSobol stream
    # depends on log2(total spp)), checkpointing.
    r = Renderer(scene, meta, cornell_cam(16), cfg)
    r.render(checkpoint=ck, max_waves=1)
    assert os.path.exists(ck)

    # Resume to the full sample count.
    r2 = Renderer(scene, meta, cornell_cam(16), cfg)
    resumed = r2.render(checkpoint=ck).hdr
    np.testing.assert_allclose(resumed, full, atol=1e-5)


def test_checkpoint_write_is_atomic(tmp_path, cornell_scene, monkeypatch):
    """A kill mid-checkpoint-write must never corrupt the resume state:
    the write goes to a temp file and is os.replace()d in, so an
    interrupted write leaves the previous checkpoint intact."""
    scene, meta = cornell_scene
    cfg = RenderConfig(samples=8, max_depth=4, tonemap="none",
                       estimator="mean", first_wave_samples=4,
                       max_wave_samples=4)
    ck = str(tmp_path / "ck.npz")
    full = Renderer(scene, meta, cornell_cam(16), cfg).render().hdr

    r = Renderer(scene, meta, cornell_cam(16), cfg)
    r.render(checkpoint=ck, max_waves=1)
    good = open(ck, "rb").read()

    # Simulate a kill mid-write on the NEXT checkpoint: savez writes
    # garbage then dies before the rename.
    import numpy as _np

    def dying_savez(path, **kw):
        with open(path if str(path).endswith(".npz") else path + ".npz",
                  "wb") as f:
            f.write(b"partial garbage")
        raise KeyboardInterrupt

    monkeypatch.setattr(_np, "savez", dying_savez)
    try:
        Renderer(scene, meta, cornell_cam(16), cfg).render(
            checkpoint=ck, max_waves=1
        )
    except KeyboardInterrupt:
        pass
    monkeypatch.undo()

    # The live checkpoint file is byte-identical to the last good write...
    assert open(ck, "rb").read() == good
    # ...and resuming from it still completes to the full image.
    resumed = Renderer(scene, meta, cornell_cam(16), cfg).render(
        checkpoint=ck
    ).hdr
    np.testing.assert_allclose(resumed, full, atol=1e-5)


def test_naive_vs_mis_agree(cornell_scene):
    """The naive integrator is the correctness oracle for MIS
    (src/main.cpp:17, SURVEY.md §4): both must converge to the same image."""
    scene, meta = cornell_scene
    base = dict(max_depth=5, tonemap="none", estimator="mean",
                first_wave_samples=64, max_wave_samples=64)
    cfg_mis = RenderConfig(samples=64, integrator="mis", **base)
    cfg_nai = RenderConfig(samples=64, integrator="naive", seed=1, **base)
    img_m = Renderer(scene, meta, cornell_cam(12), cfg_mis).render().hdr
    img_n = Renderer(scene, meta, cornell_cam(12), cfg_nai).render().hdr
    # Naive is noisy at 64spp: compare image means loosely.
    assert abs(img_m.mean() - img_n.mean()) / max(img_m.mean(), 1e-9) < 0.35, (
        img_m.mean(), img_n.mean(),
    )


def test_uniform_light_sampler_converges_same(cornell_scene):
    """UniformLightSampler vs PowerLightSampler (light-sampler.cpp:11-29 vs
    32-93): both unbiased, same image in expectation."""
    scene, meta = cornell_scene
    base = dict(max_depth=4, tonemap="none", estimator="mean",
                first_wave_samples=64, max_wave_samples=64)
    img_p = Renderer(scene, meta, cornell_cam(12),
                     RenderConfig(samples=64, light_sampler="power", **base)
                     ).render().hdr
    img_u = Renderer(scene, meta, cornell_cam(12),
                     RenderConfig(samples=64, light_sampler="uniform", seed=1,
                                  **base)).render().hdr
    assert abs(img_p.mean() - img_u.mean()) / max(img_p.mean(), 1e-9) < 0.2


def test_abort_hook(cornell_scene):
    scene, meta = cornell_scene
    cfg = RenderConfig(samples=8, max_depth=3, tonemap="none",
                       estimator="mean", first_wave_samples=4,
                       max_wave_samples=4)
    calls = []

    def should_abort():
        calls.append(1)
        return len(calls) > 1  # abort before the second wave

    res = Renderer(scene, meta, cornell_cam(12), cfg).render(
        should_abort=should_abort
    )
    assert res.samples_taken == 4  # only the first wave ran


def test_env_rotation():
    """Rotating the env light rotates the lighting (light.cpp:208,228)."""
    import numpy as np
    from yart_tpu.scene.builder import SceneBuilder
    from yart_tpu.scene.procedural import uv_sphere

    def make(rot):
        b = SceneBuilder()
        m = b.add_material(roughness=1.0)
        verts, normals, idx = uv_sphere((0, 0, 0), 1.0, 12, 24)
        b.add_mesh(verts, idx, m, normals=normals)
        img = np.zeros((16, 16, 3), np.float32)
        img[:, :8] = 4.0  # bright half
        b.set_env(img, rotation=rot)
        return b.compile()

    th = np.pi / 2
    rot = np.asarray(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
        np.float32,
    )
    cfg = RenderConfig(samples=16, max_depth=3, tonemap="none",
                       estimator="mean", first_wave_samples=16,
                       max_wave_samples=16)
    cam = CameraConfig(image_size=(16, 16), focal_length=30.0,
                       position=(0, 0, 3.5), forward=(0, 0, -3.5))
    a = Renderer(*make(None), cam, cfg).render().hdr
    b = Renderer(*make(rot), cam, cfg).render().hdr
    # The lighting moved: images differ but both stay valid renders.
    assert not np.allclose(a, b, atol=1e-3)
    assert np.isfinite(b).all() and b.mean() > 0.01


def test_chunk_pipeline_and_callbacks(cornell_scene):
    """The pipelined chunk loop (round 4): identical image for any
    in-flight depth and chunk size, with per-chunk callbacks firing in
    order and the lazy partial preview well-formed."""
    import dataclasses

    scene, meta = cornell_scene
    cfg = RenderConfig(samples=4, max_depth=3, tonemap="none",
                       estimator="mean", first_wave_samples=2,
                       max_wave_samples=2)
    cam = cornell_cam(16)
    ref = Renderer(scene, meta, cam, cfg).render()

    for inflight in (1, 3):
        cfg_i = dataclasses.replace(cfg, chunk_inflight=inflight)
        chunks = []

        def on_chunk(cd, merged_hdr):
            chunks.append((cd.wave, cd.chunk))
            if cd.chunk == 0:
                img = merged_hdr()
                assert img.shape == (16, 16, 3)
                assert np.isfinite(img).all()

        res = Renderer(scene, meta, cam, cfg_i).render(
            on_chunk=on_chunk, chunk_pixels=64,  # 16*16/64 = 4 chunks
        )
        np.testing.assert_array_equal(res.hdr, ref.hdr)
        assert res.samples_taken == ref.samples_taken
        # 2 waves x 4 chunks, in order within each wave
        assert chunks == [(w, c) for w in range(2) for c in range(4)]


def test_radiance_clamp(cornell_scene):
    """cfg.clamp bounds per-sample radiance (firefly knob): a clamp at 0
    gives a black image, a huge clamp changes nothing, and a mid clamp
    never exceeds the bound on a tonemap-free mean render."""
    import dataclasses

    scene, meta = cornell_scene
    base = RenderConfig(samples=4, max_depth=3, tonemap="none",
                        estimator="mean", first_wave_samples=4)
    cam = cornell_cam(12)
    ref = Renderer(scene, meta, cam, base).render()
    hi = Renderer(
        scene, meta, cam, dataclasses.replace(base, clamp=1e9)
    ).render()
    np.testing.assert_array_equal(hi.hdr, ref.hdr)
    zero = Renderer(
        scene, meta, cam, dataclasses.replace(base, clamp=0.0)
    ).render()
    assert np.all(zero.hdr == 0.0)
    mid = Renderer(
        scene, meta, cam, dataclasses.replace(base, clamp=0.5)
    ).render()
    assert mid.hdr.max() <= 0.5 + 1e-6
    assert np.all(mid.hdr <= ref.hdr + 1e-6)


def test_compact_depth_bit_identical(cornell_scene):
    """Staged wavefront compaction (cfg.compact_depth): images and ray
    counts are BIT-identical with compaction on/off — per-lane sampler
    state rides through the compaction gather, and every draw is a pure
    function of it. Covers the overflow path too (factor so large the
    cap underfits the survivors)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from yart_tpu.ops.qmc import make_sampler
    from yart_tpu.render.camera import build_camera
    from yart_tpu.render.integrator import render_wave

    scene, meta = cornell_scene
    size = (16, 16)
    spp = 4
    cam = build_camera(CameraConfig(
        image_size=size, focal_length=28.0, position=(0, 1.0, 3.4),
        forward=(0, 0, -1),
    ))
    sampler = make_sampler("zsobol", spp, size, 0)
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), spp), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), spp), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(spp), 256), jnp.uint32)
    base = RenderConfig(samples=spp, max_depth=6)
    a, ra = jax.jit(
        lambda: render_wave(scene, meta, cam, sampler, base, px, py, sidx)
    )()
    # (depth, factor): normal case, aggressive cap (exercises overflow
    # lanes at depth 1 where most survive), immediate compaction.
    for cd, cf in ((3, 4), (1, 8), (2, 2)):
        cfg = dataclasses.replace(
            base, compact_depth=cd, compact_factor=cf
        )
        b, rb = jax.jit(
            lambda: render_wave(scene, meta, cam, sampler, cfg, px, py,
                                sidx)
        )()
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert float(ra) == float(rb)


# ---- round 5: per-wave compaction autotune ------------------------------

def test_choose_compaction_rules():
    """Decision logic on synthetic retirement curves (counts per depth)."""
    from yart_tpu.render.renderer import choose_compaction

    n, d = 1000, 8
    # Fast env retirement (atrium-like): 20% live at depth 2.
    live = np.array([1000, 450, 200, 90, 40, 18, 8, 3], np.float64)
    ch = choose_compaction(live, n, d)
    assert ch is not None
    split, factor = ch
    # Feasible: live at the split fits the cap with 20% headroom.
    assert live[split] <= 0.8 * n / factor
    # Closed room, no RR retirement: nearly everything stays live.
    live = np.array([1000, 990, 930, 880, 840, 800, 760, 730], np.float64)
    assert choose_compaction(live, n, d) is None
    # Everything dead after bounce 1: nothing left to compact profitably
    # (the while_loop already exits).
    live = np.array([1000, 0, 0, 0, 0, 0, 0, 0], np.float64)
    assert choose_compaction(live, n, d) is None
    # Windowed interior: env-lit but slow retirement — must NOT compact
    # at a tight cap; any accepted choice must be feasible.
    live = np.array([1000, 920, 800, 700, 610, 530, 460, 400], np.float64)
    ch = choose_compaction(live, n, d)
    if ch is not None:
        split, factor = ch
        assert live[split] <= 0.8 * n / factor


def test_autotune_windowed_interior_overrides_env_guess(cornell_scene):
    """An env-lit but enclosed interior (windowed_interior) must measure
    its way OFF the has_env static guess: the first wave runs with the
    (2, 4) guess, later waves with the autotuned choice — and the image
    must equal a compaction-off render bit-for-bit (compaction is
    value-transparent)."""
    import dataclasses

    from yart_tpu.scene.procedural import windowed_interior

    scene, meta = windowed_interior().compile()
    assert meta.has_env
    cam = CameraConfig(image_size=(16, 16), focal_length=28.0,
                       position=(0, 1.0, 0.8), forward=(0, 0, -1))
    cfg = RenderConfig(samples=4, max_depth=8, tonemap="none",
                       estimator="mean", first_wave_samples=2,
                       max_wave_samples=2)
    waves = []
    r = Renderer(scene, meta, cam, cfg)
    img = r.render(on_wave=lambda wd, _: waves.append(wd)).hdr
    assert len(waves) == 2
    # Wave 0 ran the static env guess; the autotune must measure the slow
    # retirement (window only) and pick something feasible — for this
    # scene the live fraction at depth 2 is far above 0.8/4, so the
    # (2, 4) guess must NOT survive.
    assert waves[0].compact == (2, 4)
    assert waves[0].live is not None and waves[0].live[0] > 0
    n0 = 16 * 16 * 2
    if waves[1].compact is not None:
        s_, f_ = waves[1].compact
        assert waves[1].live[s_] <= 0.8 * n0 / f_ * 1.05
    else:
        assert waves[1].compact is None
    # A high live fraction at depth 2 rules the static guess infeasible.
    assert waves[0].live[2] > 0.8 * n0 / 4
    assert waves[1].compact != (2, 4)

    # Value transparency: identical image with compaction forced off.
    cfg_off = dataclasses.replace(cfg, compact_depth=None)
    img_off = Renderer(scene, meta, cam, cfg_off).render().hdr
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img_off))


def test_autotune_closed_scene_stays_off(cornell_scene):
    """Cornell (no env): static guess is off; the autotune may enable
    compaction only with a measured-feasible choice, and the image must
    stay identical to the forced-off render."""
    import dataclasses

    scene, meta = cornell_scene
    cfg = RenderConfig(samples=4, max_depth=6, tonemap="none",
                       estimator="mean", first_wave_samples=2,
                       max_wave_samples=2)
    waves = []
    img = Renderer(scene, meta, cornell_cam(16), cfg).render(
        on_wave=lambda wd, _: waves.append(wd)
    ).hdr
    assert waves[0].compact is None  # static guess for a no-env scene
    cfg_off = dataclasses.replace(cfg, compact_depth=None)
    img_off = Renderer(scene, meta, cornell_cam(16), cfg_off).render().hdr
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img_off))


# ---- round 5: specular-chain path regularization ------------------------

def test_regularize_specular_kills_chain_caustics():
    """camera -> smooth glass -> smooth chrome -> bright light is a pure
    specular chain: accumulated-roughness regularization (the reference's
    only lever, mis-integrator.cpp:90-92) never fires on it, so such
    paths produce caustic fireflies. cfg.regularize_specular=1 roughens
    the SECOND specular vertex: the spike tail must drop at equal spp
    (same seeds) while the image mean stays in the same energy range."""
    import dataclasses

    import numpy as _np

    from yart_tpu.scene.builder import SceneBuilder
    from yart_tpu.scene.procedural import _quad, uv_sphere

    b = SceneBuilder()
    floor = b.add_material(base_color=(0.3, 0.3, 0.3, 1.0), roughness=1.0)
    chrome = b.add_material(base_color=(0.95, 0.95, 0.95, 1.0),
                            metallic=1.0, roughness=0.0)
    glass = b.add_material(base_color=(1.0, 1.0, 1.0, 1.0),
                           transmission=1.0, roughness=0.0, ior=1.5,
                           thin=False)
    light = b.add_material(emission=(1.0, 1.0, 1.0),
                           emission_strength=400.0)
    fv, fi = _quad([-6, 0, -6], [6, 0, -6], [6, 0, 6], [-6, 0, 6])
    b.add_mesh(fv, fi, floor)
    v, n, i = uv_sphere((0.0, 0.8, 0.0), 0.8, 16, 32)
    b.add_mesh(v, i, chrome, normals=n)
    # Glass pane between camera and sphere.
    gv, gi = _quad([-2, 0.0, 2.0], [2, 0.0, 2.0], [2, 2.5, 2.0],
                   [-2, 2.5, 2.0])
    b.add_mesh(gv, gi, glass)
    # Small bright light off to the side (seen via the chrome).
    lv, li_ = _quad([2.5, 2.4, 0.4], [2.9, 2.4, 0.4], [2.9, 2.8, 0.4],
                    [2.5, 2.8, 0.4])
    b.add_mesh(lv, li_, light)
    scene, meta = b.compile()

    cam = CameraConfig(image_size=(24, 24), focal_length=30.0,
                       position=(0.0, 1.1, 4.2), forward=(0, -0.1, -1))
    base = RenderConfig(samples=16, max_depth=5, tonemap="none",
                        estimator="mean", first_wave_samples=16,
                        max_wave_samples=16)
    img_off = Renderer(scene, meta, cam, base).render().hdr
    cfg_reg = dataclasses.replace(base, regularize_specular=1)
    img_reg = Renderer(scene, meta, cam, cfg_reg).render().hdr

    lum = lambda im: _np.asarray(im) @ _np.asarray(
        [0.2126, 0.7152, 0.0722], _np.float32)
    l_off, l_reg = lum(img_off), lum(img_reg)
    assert _np.isfinite(l_reg).all()
    # CPU test scale (24^2 x 16spp) cannot reproduce production firefly
    # statistics (measured: this scene's tail is clean at this spp —
    # pure smooth chains are deterministic and the near-specular spike
    # class needs flagship scene complexity; the quality evidence is the
    # equal-spp roadster render comparison, BASELINE.md round 5). What
    # IS checkable here: the mechanism fires (the images differ — the
    # second specular vertex sampled a roughened lobe), the brightest
    # chain-lit pixel does not get brighter, and energy is conserved to
    # Monte-Carlo noise.
    assert (l_reg != l_off).any()
    assert l_reg.max() <= l_off.max() * 1.001, (l_off.max(), l_reg.max())
    assert abs(l_reg.mean() - l_off.mean()) < 0.25 * l_off.mean()
