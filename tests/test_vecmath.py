import jax.numpy as jnp
import numpy as np
import pytest

from yart_tpu.ops import vecmath as vm


def rand_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_normalize_and_length():
    v = jnp.asarray([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]])
    n = vm.normalize(v)
    np.testing.assert_allclose(np.asarray(vm.length(n))[0], 1.0, atol=1e-6)
    assert np.all(np.asarray(n)[1] == 0.0)  # safe on zero vectors


def test_reflect_involution():
    wo = jnp.asarray(rand_dirs(128, 1))
    n = jnp.asarray(rand_dirs(128, 2))
    r = vm.reflect(wo, n)
    # |r| == |wo| and angle preserved: r.n == wo.n
    np.testing.assert_allclose(np.asarray(vm.length(r)), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(vm.dot(r, n)), np.asarray(vm.dot(wo, n)), atol=1e-5
    )


def test_refract_snell():
    # wi pointing away from surface (z up), ior 1.5
    wi = vm.normalize(jnp.asarray([[0.5, 0.0, 0.8]], jnp.float32))
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    wt, tir = vm.refract(wi, n, 1.5)
    assert not bool(tir[0])
    sin_i = np.sqrt(1 - float(vm.dot(wi, n)[0]) ** 2)
    wt = np.asarray(vm.normalize(wt))[0]
    sin_t = np.sqrt(max(0.0, 1 - wt[2] ** 2))
    np.testing.assert_allclose(sin_i, 1.5 * sin_t, atol=1e-5)


def test_refract_tir():
    # Grazing from the dense side must report TIR
    wi = vm.normalize(jnp.asarray([[0.9, 0.0, -0.2]], jnp.float32))
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    _, tir = vm.refract(wi, n, 1.5)
    assert bool(tir[0])


def test_fresnel_dielectric_limits():
    f0 = float(vm.fresnel_dielectric(jnp.asarray(1.0), 1.5))
    # Normal incidence: ((1-n)/(1+n))^2 = 0.04
    np.testing.assert_allclose(f0, 0.04, atol=1e-4)
    fg = float(vm.fresnel_dielectric(jnp.asarray(1e-4), 1.5))
    np.testing.assert_allclose(fg, 1.0, atol=1e-2)  # grazing -> 1
    # Below-surface TIR region
    ftir = float(vm.fresnel_dielectric(jnp.asarray(-0.2), 1.5))
    assert ftir == 1.0


def test_fresnel_schlick_matches_dielectric_at_normal():
    f = np.asarray(vm.fresnel_schlick(jnp.asarray([0.04, 0.04, 0.04]), 1.0))
    np.testing.assert_allclose(f, 0.04, atol=1e-6)


def test_octahedral_roundtrip():
    d = jnp.asarray(rand_dirs(4096, 3))
    uv = vm.octahedral_uv(d)
    assert np.all((np.asarray(uv) >= 0) & (np.asarray(uv) <= 1))
    d2 = vm.inv_octahedral_uv(uv)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-4)


def test_spherical_roundtrip():
    d = jnp.asarray(rand_dirs(1024, 4))
    uv = vm.spherical_uv(d)
    d2 = vm.inv_spherical_uv(uv)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-4)


def test_frames_orthonormal():
    n = jnp.asarray(rand_dirs(256, 5))
    for fx, fy, fz in [
        vm.frame_from_normal(n),
        vm.frame_from_normal_tangent(n, jnp.asarray(rand_dirs(256, 6))),
    ]:
        np.testing.assert_allclose(np.asarray(vm.dot(fx, fy)), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(vm.dot(fx, fz)), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(vm.dot(fy, fz)), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(vm.length(fx)), 1.0, atol=1e-4)
    # wtl/ltw round trip
    fx, fy, fz = vm.frame_from_normal(n)
    w = jnp.asarray(rand_dirs(256, 7))
    l = vm.world_to_local(w, fx, fy, fz)
    w2 = vm.local_to_world(l, fx, fy, fz)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)


def test_shading_tangent():
    n = jnp.asarray(rand_dirs(256, 8))
    tg = vm.shading_tangent(n)
    np.testing.assert_allclose(np.asarray(vm.dot(tg, n)), 0.0, atol=1e-3)
    # Degenerate +Y normal falls back to +X
    ny = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    np.testing.assert_allclose(np.asarray(vm.shading_tangent(ny))[0], [1, 0, 0])
