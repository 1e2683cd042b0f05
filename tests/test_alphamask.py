"""Baked per-triangle alpha bitmasks (scene/alphamask.py): conservativeness
of the bake and the in-kernel cull's exactness (certainly-transparent hits
never reach the gated re-cast loop, and gated results stay identical to the
stack traversal)."""

import numpy as np
import jax.numpy as jnp
import pytest

from yart_tpu.scene.builder import SceneBuilder


def _half_alpha_scene(grid=32):
    """One unit quad at z=0 whose texture's LEFT half (u < 0.5) has alpha
    identically 0 and right half alpha 1, plus an opaque backstop quad at
    z=-1 so culled lanes still hit something behind."""
    b = SceneBuilder()
    tex = np.zeros((grid, grid, 4), np.float32)
    tex[..., 0:3] = 0.7
    tex[:, grid // 2 :, 3] = 1.0  # right half opaque (x = u axis)
    t = b.add_texture("rgba", tex)
    m_cut = b.add_material(base_color=(1, 1, 1, 1), roughness=0.8,
                           tex_base=t, has_alpha=True)
    m_solid = b.add_material(base_color=(0.5, 0.5, 0.5, 1), roughness=0.8)
    quad = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64
    )
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    b.add_mesh(quad, idx, m_cut, uvs=uvs)
    back = quad.copy()
    back[:, 2] = -1.0
    b.add_mesh(back, idx, m_solid, uvs=uvs)
    return b.compile()


def test_bake_conservative_and_tight():
    """Mask bit 0 => bilinear alpha is identically 0 over the cell (checked
    by dense sampling through the PRODUCTION sampler); decisively-opaque
    interior cells keep bit 1."""
    import jax

    from yart_tpu.render.texture import sample_stack

    scene, meta = _half_alpha_scene()
    c = meta.cluster_size
    pack = np.asarray(scene.clus_pack)
    w0 = pack[:, 5, 0:c].view(np.int32)
    w1 = pack[:, 5, c : 2 * c].view(np.int32)

    # Locate the two cutout triangles in pack order via tri_pack material.
    tri_mat = np.asarray(scene.tri_pack[:, 9]).view(np.int32)
    has_alpha = np.asarray(scene.materials.has_alpha)
    n_tris = meta.n_tris
    shade = np.asarray(scene.shade_pack)

    rng = np.random.default_rng(3)
    checked_zero = 0
    checked_one = 0
    for t in range(n_tris):
        if not has_alpha[tri_mat[t]]:
            continue
        # cluster + lane of triangle t
        first = pack[:, 4, 0].view(np.int32)
        ci = int(np.searchsorted(first, t, side="right") - 1)
        lane = t - int(first[ci])
        bits = (np.uint64(np.uint32(w0[ci, lane]))
                | (np.uint64(np.uint32(w1[ci, lane])) << np.uint64(32)))
        uv0, uv1, uv2 = shade[t, 9:11], shade[t, 11:13], shade[t, 13:15]
        for iu in range(8):
            for iv in range(8):
                bit = (bits >> np.uint64(iu * 8 + iv)) & np.uint64(1)
                if bit:
                    checked_one += 1
                    continue
                # dense-sample alpha over the cell: must be identically 0
                u = (iu + rng.random(64)) / 8.0
                v = (iv + rng.random(64)) / 8.0
                uv = (
                    (1 - u - v)[:, None] * uv0
                    + u[:, None] * uv1
                    + v[:, None] * uv2
                )
                a = np.asarray(
                    sample_stack(
                        scene.tex_rgba,
                        jnp.zeros(64, jnp.int32),
                        jnp.asarray(uv, jnp.float32),
                    )
                )[:, 3]
                assert (a == 0.0).all(), (t, iu, iv, a.max())
                checked_zero += 1
    # the half-transparent texture must yield BOTH kinds of cells
    assert checked_zero > 10, "no culled cells baked — mask is vacuous"
    assert checked_one > 10


def test_amask_culls_certain_empty_hits():
    """Raw fused traversal with amask=True skips hits in the alpha==0 half
    (returning the backstop quad behind) while amask=False reports the
    front quad; the gated loop produces identical FINAL results either
    way, matching the stack path."""
    from yart_tpu.render.blocktrace import (
        intersect_blocktrace,
        intersect_blocktrace_gated,
    )
    from yart_tpu.render.intersect import intersect_bvh8

    scene, meta = _half_alpha_scene()
    n = 256
    rng = np.random.default_rng(7)
    # rays straight down the -z axis through both texture halves
    x = rng.random(n)
    y = rng.random(n) * 0.4 + 0.3  # stay inside the quad
    o = np.stack([x, y, np.full(n, 2.0)], axis=1).astype(np.float32)
    d = np.tile(np.asarray([[0.0, 0.0, -1.0]], np.float32), (n, 1))
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)

    h_raw = intersect_blocktrace(scene, meta, o_j, d_j, 100.0,
                                 interpret=True)
    h_cull = intersect_blocktrace(scene, meta, o_j, d_j, 100.0,
                                  amask=True, interpret=True)
    t_raw = np.asarray(h_raw.t)
    t_cull = np.asarray(h_cull.t)
    # The cutout quad's texture-u == world x (uv0=(0,0) at x=0): u < 0.5
    # is the transparent half. The conservative cull granularity is the
    # 8x8 BARYCENTRIC grid, and for these triangles tex_u = bary_u +
    # bary_v, so a cell's tex_u upper corner overshoots the hit by up to
    # 2/8 plus a bilinear texel: only x < ~0.2 is certainly culled.
    left = x < 0.2
    right = x > 0.55
    assert np.allclose(t_raw[left], 2.0, atol=1e-3)  # front quad hit
    assert np.allclose(t_cull[left], 3.0, atol=1e-3)  # culled -> backstop
    assert np.allclose(t_cull[right], t_raw[right])  # opaque half intact

    seed = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    hg = intersect_blocktrace_gated(
        scene, meta, o_j, d_j, 100.0, alpha_seed=seed, interpret=True
    )
    hs = intersect_bvh8(scene, meta, o_j, d_j, 100.0, alpha_seed=seed)
    np.testing.assert_array_equal(np.asarray(hg.mask), np.asarray(hs.mask))
    m = np.asarray(hg.mask)
    np.testing.assert_allclose(
        np.asarray(hg.t)[m], np.asarray(hs.t)[m], rtol=2e-5, atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(hg.tri)[m], np.asarray(hs.tri)[m]
    )


def test_amask_instanced_matches_baked():
    """Prototype packs carry the baked masks too (builder shares the
    texture list into proto sub-compiles): the instanced gated traversal
    culls and re-casts identically to the baked scene."""
    from yart_tpu.render.blocktrace import intersect_blocktrace_gated

    def build(instanced):
        b = SceneBuilder()
        grid = 32
        tex = np.zeros((grid, grid, 4), np.float32)
        tex[..., 0:3] = 0.7
        tex[:, grid // 2 :, 3] = 1.0
        t = b.add_texture("rgba", tex)
        m_cut = b.add_material(base_color=(1, 1, 1, 1), roughness=0.8,
                               tex_base=t, has_alpha=True)
        quad = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64
        )
        uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64)
        idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        if instanced:
            pid = b.add_prototype(quad, idx, m_cut, uvs=uvs)
            for dz in (0.0, -1.0):
                tf = np.eye(4)
                tf[2, 3] = dz
                b.add_instance(pid, tf)
        else:
            b.add_mesh(quad, idx, m_cut, uvs=uvs)
            back = quad.copy()
            back[:, 2] = -1.0
            b.add_mesh(back, idx, m_cut, uvs=uvs)
        return b.compile()

    sc_b, meta_b = build(False)
    sc_i, meta_i = build(True)
    assert meta_i.n_instances
    # proto pack row 5 must carry a non-trivial mask
    pack_i = np.asarray(sc_i.clus_pack)
    assert (pack_i[:, 5, :].view(np.int32) != -1).any()

    n = 128
    rng = np.random.default_rng(11)
    x = rng.random(n)
    y = rng.random(n) * 0.4 + 0.3
    o = jnp.asarray(
        np.stack([x, y, np.full(n, 2.0)], axis=1).astype(np.float32)
    )
    d = jnp.asarray(np.tile([[0.0, 0.0, -1.0]], (n, 1)).astype(np.float32))
    seed = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    hb = intersect_blocktrace_gated(
        sc_b, meta_b, o, d, 100.0, alpha_seed=seed, interpret=True
    )
    hi = intersect_blocktrace_gated(
        sc_i, meta_i, o, d, 100.0, alpha_seed=seed, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(hb.mask), np.asarray(hi.mask))
    m = np.asarray(hb.mask)
    np.testing.assert_allclose(
        np.asarray(hb.t)[m], np.asarray(hi.t)[m], rtol=2e-5, atol=2e-5
    )
