import jax.numpy as jnp
import numpy as np

from yart_tpu.ops import warps


def grid_u(n):
    rng = np.random.default_rng(42)
    return jnp.asarray(rng.random((n, 2), np.float32))


def test_cosine_hemisphere_distribution():
    u = grid_u(1 << 16)
    w = np.asarray(warps.sample_cosine_hemisphere(u))
    assert np.all(w[:, 2] >= 0)
    np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-4)
    # E[cos theta] for pdf cos/pi is 2/3
    np.testing.assert_allclose(w[:, 2].mean(), 2.0 / 3.0, atol=5e-3)


def test_disk_uniform():
    u = grid_u(1 << 16)
    p = np.asarray(warps.sample_disk_uniform(u))
    r2 = (p ** 2).sum(-1)
    assert np.all(r2 <= 1.0 + 1e-5)
    # Uniform disk: E[r^2] = 1/2
    np.testing.assert_allclose(r2.mean(), 0.5, atol=5e-3)


def test_sphere_uniform():
    u = grid_u(1 << 16)
    w = np.asarray(warps.sample_sphere_uniform(u))
    np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.abs(w.mean(0)), 0.0, atol=1e-2)


def test_triangle_uniform():
    u = grid_u(1 << 16)
    b = np.asarray(warps.sample_tri_uniform(u))
    assert np.all(b >= -1e-6) and np.all(b <= 1 + 1e-6)
    np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-5)
    # Each barycentric has mean 1/3 under uniform sampling
    np.testing.assert_allclose(b.mean(0), 1.0 / 3.0, atol=5e-3)


def test_polygon_contained_in_unit_circle():
    u = grid_u(1 << 14)
    for sides in (3, 5, 6, 8):
        p = np.asarray(warps.sample_poly_uniform(u, sides))
        assert np.all((p ** 2).sum(-1) <= 1.0 + 1e-5)
        # Polygon area fraction of sampled points' bounding circle
        # E[|p|^2] is smaller for fewer sides
    p6 = np.asarray(warps.sample_poly_uniform(u, 6))
    p3 = np.asarray(warps.sample_poly_uniform(u, 3))
    assert (p3 ** 2).sum(-1).mean() < (p6 ** 2).sum(-1).mean()


def test_gaussian_jitter_stats():
    u = grid_u(1 << 16)
    j = np.asarray(warps.pixel_jitter_gaussian(u, 0.3))
    np.testing.assert_allclose(j.mean(0), 0.0, atol=5e-3)
    np.testing.assert_allclose(j.std(0), 0.3, atol=5e-3)


def test_sample_linear_density():
    u = jnp.linspace(0, 1, 1 << 14)
    x = np.asarray(warps.sample_linear(u, 0.0, 2.0))
    # pdf f(x) = 2x on [0,1]: mean = 2/3
    np.testing.assert_allclose(x.mean(), 2.0 / 3.0, atol=2e-3)


def test_bilinear_pdf_integrates_to_one():
    rng = np.random.default_rng(0)
    w = jnp.asarray([0.2, 1.0, 3.0, 0.5])
    grid = jnp.asarray(rng.random((1 << 14, 2), np.float32))
    pdf = np.asarray(warps.bilinear_pdf(grid, w))
    np.testing.assert_allclose(pdf.mean(), 1.0, atol=2e-2)
