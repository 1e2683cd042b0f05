"""Parity details of the light stack: UniformInfiniteLight no-NEE semantics
(light.cpp:83-135), env portal bounds (light.cpp:147-155), and two-sided
area-light power (light.hpp:78, light.cpp:36-38)."""

import numpy as np
import jax.numpy as jnp

from yart_tpu.render import lights
from yart_tpu.scene.builder import SceneBuilder
from yart_tpu.scene.procedural import uv_sphere


def _sphere_builder():
    b = SceneBuilder()
    m = b.add_material(roughness=1.0)
    pos, nrm, tri = uv_sphere((0, 0, 0), 1.0, n_theta=8, n_phi=12)
    b.add_mesh(pos, tri, m, normals=nrm)
    return b


def test_uniform_env_not_sampled():
    b = _sphere_builder()
    b.set_env_uniform((0.5, 0.5, 0.5))
    scene, meta = b.compile()
    assert meta.has_env and not meta.env_sampleable

    d = jnp.asarray(np.random.default_rng(0).normal(size=(64, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # pdf == 0: BSDF rays hitting the env get full MIS weight.
    np.testing.assert_array_equal(np.asarray(lights.env_pdf(scene, d, meta)), 0.0)
    # Le on miss still present.
    np.testing.assert_allclose(
        np.asarray(lights.env_le(scene, d, meta)), 0.5, rtol=1e-6
    )
    # NEE draws that pick the env are invalid (wasted, like the reference).
    p = jnp.zeros((64, 3))
    uc = jnp.linspace(0.0, 0.99, 64)
    u = jnp.tile(jnp.asarray([[0.3, 0.7]]), (64, 1))
    ls = lights.sample_light(scene, meta, p, uc, u)
    picked_env = np.asarray(ls.is_env)
    assert picked_env.any()
    assert not np.asarray(ls.valid)[picked_env].any()


def test_env_portal_bounds():
    b = _sphere_builder()
    img = np.ones((16, 16, 3), np.float32)
    bounds = (0.25, 0.25, 0.75, 0.75)
    b.set_env(img, bounds=bounds)
    scene, meta = b.compile()
    assert meta.env_portal

    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.uniform(size=(256, 2)), jnp.float32)
    p = jnp.zeros((256, 3))
    uc = jnp.zeros((256,))  # always picks the (only) infinite light
    ls = lights.sample_light(scene, meta, p, uc, u)
    # Sampled directions map inside the portal rect.
    from yart_tpu.ops.vecmath import octahedral_uv

    uv = np.asarray(octahedral_uv(ls.wi @ scene.env_rotation.T))
    v = np.asarray(ls.valid)
    assert v.all()
    assert (uv[:, 0] >= 0.24).all() and (uv[:, 0] <= 0.76).all()
    assert (uv[:, 1] >= 0.24).all() and (uv[:, 1] <= 0.76).all()

    # Le outside the portal is zero, inside is the image value.
    from yart_tpu.ops.vecmath import inv_octahedral_uv

    uv_out = jnp.asarray([[0.1, 0.1], [0.9, 0.5], [0.5, 0.9]], jnp.float32)
    uv_in = jnp.asarray([[0.5, 0.5], [0.3, 0.6]], jnp.float32)
    d_out = inv_octahedral_uv(uv_out)
    d_in = inv_octahedral_uv(uv_in)
    np.testing.assert_array_equal(
        np.asarray(lights.env_le(scene, d_out, meta)), 0.0
    )
    assert (np.asarray(lights.env_le(scene, d_in, meta)) > 0.5).all()
    # pdf vanishes outside, positive inside.
    np.testing.assert_array_equal(
        np.asarray(lights.env_pdf(scene, d_out, meta)), 0.0
    )
    assert (np.asarray(lights.env_pdf(scene, d_in, meta)) > 0.0).all()


def test_two_sided_doubles_power():
    def build(two_sided):
        b = SceneBuilder()
        m = b.add_material(emission=(1.0, 2.0, 3.0), two_sided=two_sided)
        quad = np.asarray(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
        )
        b.add_mesh(quad, np.asarray([[0, 1, 2], [0, 2, 3]]), m)
        return b.compile()

    s1, m1 = build(False)
    s2, m2 = build(True)
    np.testing.assert_allclose(
        np.asarray(s2.light_power), 2.0 * np.asarray(s1.light_power), rtol=1e-6
    )
    assert np.asarray(s2.light_two_sided).all()
    assert not np.asarray(s1.light_two_sided).any()
