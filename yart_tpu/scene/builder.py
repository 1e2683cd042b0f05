"""Host-side scene builder -> CompiledScene.

Replaces the reference's build-a-graph-in-main approach (src/main.cpp:19-107,
src/core/scene.hpp:11-169): meshes are added with optional 4x4 transforms,
pre-transformed to world space, concatenated, and compiled into flat device
arrays with one global SAH BVH, a material table, an area-light power table
(src/core/light-sampler.cpp:32-50) and an env-map sampling distribution
(src/core/light.cpp:156-193).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from yart_tpu.ops.distribution import build_alias
from yart_tpu.scene.bvh import build_bvh, collapse_bvh8
from yart_tpu.scene.types import (
    CompiledScene,
    FlatBVH,
    MaterialTable,
    SceneMeta,
    TextureStack,
)

_PI = float(np.pi)


def _env_rows_from_image(img, pdf_cells):
    # Lazy import: render.lights imports scene.types, whose package pulls
    # in this module.
    from yart_tpu.render.lights import env_rows_from_image

    return env_rows_from_image(img, pdf_cells)


@dataclasses.dataclass
class MaterialDesc:
    """Host-side material description (parametric.hpp:16-37 parameters)."""

    base_color: tuple = (0.8, 0.8, 0.8, 1.0)
    metallic: float = 0.0
    roughness: float = 0.5
    transmission: float = 0.0
    ior: float = 1.5
    anisotropic: float = 0.0
    aniso_rotation: float = 0.0
    clearcoat: float = 0.0
    cc_roughness: float = 0.0
    emission: tuple = (0.0, 0.0, 0.0)
    emission_strength: float = 1.0
    # Two-sided area-light emission (light.hpp:78; doubles power,
    # light.cpp:36-38 — the reference's flag affects only power).
    two_sided: bool = False
    normal_scale: float = 1.0
    thin: bool = True  # thinTransmission: gltf loader hardcodes true (gltf.cpp:104-105)
    volume_color: tuple = (1.0, 1.0, 1.0)
    volume_density: float = 0.0
    # Texture slots (indices into the builder's per-kind stacks; -1 = none)
    tex_base: int = -1
    tex_mr: int = -1
    tex_transmission: int = -1
    tex_normal: int = -1
    tex_clearcoat: int = -1
    tex_emission: int = -1
    has_alpha: bool = False

    @property
    def is_emissive(self) -> bool:
        e = np.asarray(self.emission, np.float32) * self.emission_strength
        return bool(np.any(e > 0.0)) or self.tex_emission >= 0


def _empty_stack(channels: int) -> TextureStack:
    return TextureStack(
        data=jnp.zeros((1, 1, channels), jnp.float32),
        table=jnp.zeros((0, 4), jnp.int32),
        qrows=jnp.zeros((1, 4 * channels), jnp.float32),
    )


def _stack_from_list(textures: List[np.ndarray], channels: int) -> TextureStack:
    """Shelf-pack [H, W, C] arrays into one atlas (see TextureStack). Repeat
    wrap happens in the sampler via per-texture true sizes; the bilinear
    fetch clamps inside each rect, so no border duplication is needed."""
    if not textures:
        return _empty_stack(channels)
    max_w = max(t.shape[1] for t in textures)
    atlas_w = 1
    while atlas_w < max_w:
        atlas_w *= 2
    atlas_w = max(atlas_w, 64)

    # Place tallest-first on left-to-right shelves.
    order = sorted(range(len(textures)), key=lambda i: -textures[i].shape[0])
    table = np.zeros((len(textures), 4), np.int32)
    x = y = shelf_h = 0
    for i in order:
        th, tw = textures[i].shape[:2]
        if x + tw > atlas_w:
            y += shelf_h
            x = 0
            shelf_h = 0
        table[i] = (x, y, tw, th)
        x += tw
        shelf_h = max(shelf_h, th)
    atlas_h = y + shelf_h

    data = np.zeros((atlas_h, atlas_w, channels), np.float32)
    for i, t in enumerate(textures):
        x0, y0, tw, th = table[i]
        data[y0 : y0 + th, x0 : x0 + tw] = t.reshape(th, tw, channels)
    from yart_tpu.render.texture import qrows_from_data

    return TextureStack(
        jnp.asarray(data), jnp.asarray(table),
        qrows_from_data(jnp.asarray(data)),
    )


class SceneBuilder:
    def __init__(self) -> None:
        self._materials: List[MaterialDesc] = []
        self._positions: List[np.ndarray] = []
        self._normals: List[np.ndarray] = []
        self._tangents: List[np.ndarray] = []
        self._uvs: List[np.ndarray] = []
        self._tris: List[np.ndarray] = []
        self._tri_mat: List[np.ndarray] = []
        self._vtx_offset = 0
        self._protos: List[dict] = []
        self._instances: List[tuple] = []
        self._env_image: Optional[np.ndarray] = None
        self._env_scale = 1.0
        self._env_rotation = np.eye(3, dtype=np.float32)
        self._env_bounds = (0.0, 0.0, 1.0, 1.0)
        self._env_sampleable = True
        self._background = (0.0, 0.0, 0.0)
        # Texture stacks: storage-encoded [H, W, C] float arrays.
        self.textures_rgba: List[np.ndarray] = []
        self.textures_rgb: List[np.ndarray] = []
        self.textures_2ch: List[np.ndarray] = []
        self.textures_mono: List[np.ndarray] = []

    # -- authoring ---------------------------------------------------------

    def add_material(self, **kwargs) -> int:
        self._materials.append(MaterialDesc(**kwargs))
        return len(self._materials) - 1

    def add_material_desc(self, desc: MaterialDesc) -> int:
        self._materials.append(desc)
        return len(self._materials) - 1

    def add_texture(self, kind: str, data: np.ndarray) -> int:
        """kind in {rgba, rgb, 2ch, mono}; data already storage-encoded."""
        stack = {
            "rgba": self.textures_rgba,
            "rgb": self.textures_rgb,
            "2ch": self.textures_2ch,
            "mono": self.textures_mono,
        }[kind]
        stack.append(np.asarray(data, np.float32))
        return len(stack) - 1

    def add_mesh(
        self,
        positions: np.ndarray,
        indices: np.ndarray,
        material,
        normals: Optional[np.ndarray] = None,
        uvs: Optional[np.ndarray] = None,
        tangents: Optional[np.ndarray] = None,
        transform: Optional[np.ndarray] = None,
    ) -> None:
        """Add a triangle mesh instance, pre-transformed to world space.

        material: scalar material index or per-face [T] array.
        transform: optional [4, 4] row-major affine matrix.
        """
        positions = np.asarray(positions, np.float64).reshape(-1, 3)
        indices = np.asarray(indices, np.int64).reshape(-1, 3)
        nv = positions.shape[0]

        if normals is None:
            normals = _face_normals_to_vertices(positions, indices)
        normals = np.asarray(normals, np.float64).reshape(nv, 3)
        if uvs is None:
            uvs = np.zeros((nv, 2), np.float64)
        uvs = np.asarray(uvs, np.float64).reshape(nv, 2)
        if tangents is None:
            tangents = np.zeros((nv, 4), np.float64)
            tangents[:, 0] = 1.0
            tangents[:, 3] = 1.0
        tangents = np.asarray(tangents, np.float64).reshape(nv, 4)

        if transform is not None:
            m = np.asarray(transform, np.float64).reshape(4, 4)
            positions = positions @ m[:3, :3].T + m[:3, 3]
            # Normals use the inverse-transpose (src/math/transform.hpp:46-52).
            nrm_m = np.linalg.inv(m[:3, :3]).T
            normals = normals @ nrm_m.T
            n_len = np.linalg.norm(normals, axis=-1, keepdims=True)
            normals = normals / np.maximum(n_len, 1e-20)
            t_xyz = tangents[:, :3] @ m[:3, :3].T
            t_len = np.linalg.norm(t_xyz, axis=-1, keepdims=True)
            tangents = np.concatenate(
                [t_xyz / np.maximum(t_len, 1e-20), tangents[:, 3:]], axis=1
            )

        t = indices.shape[0]
        mat = np.broadcast_to(np.asarray(material, np.int32), (t,)).copy()

        self._positions.append(positions.astype(np.float32))
        self._normals.append(normals.astype(np.float32))
        self._tangents.append(tangents.astype(np.float32))
        self._uvs.append(uvs.astype(np.float32))
        self._tris.append((indices + self._vtx_offset).astype(np.int32))
        self._tri_mat.append(mat)
        self._vtx_offset += nv

    def add_prototype(
        self,
        positions: np.ndarray,
        indices: np.ndarray,
        material,
        normals: Optional[np.ndarray] = None,
        uvs: Optional[np.ndarray] = None,
        tangents: Optional[np.ndarray] = None,
    ) -> int:
        """Register an object-space prototype mesh for instancing. The
        reference shares one Mesh across scene-graph Nodes
        (src/core/scene.hpp:48-66); here a prototype owns its heavy
        per-triangle data (traversal packs, shading rows) ONCE and each
        instance adds a transform plus 4-byte/tri id maps. Returns the
        prototype id for `add_instance`."""
        positions = np.asarray(positions, np.float64).reshape(-1, 3)
        indices = np.asarray(indices, np.int64).reshape(-1, 3)
        nv = positions.shape[0]
        if normals is None:
            normals = _face_normals_to_vertices(positions, indices)
        normals = np.asarray(normals, np.float64).reshape(nv, 3)
        if uvs is None:
            uvs = np.zeros((nv, 2), np.float64)
        uvs = np.asarray(uvs, np.float64).reshape(nv, 2)
        if tangents is None:
            tangents = np.zeros((nv, 4), np.float64)
            tangents[:, 0] = 1.0
            tangents[:, 3] = 1.0
        tangents = np.asarray(tangents, np.float64).reshape(nv, 4)
        t = indices.shape[0]
        mat = np.broadcast_to(np.asarray(material, np.int32), (t,)).copy()
        self._protos.append(
            dict(positions=positions, normals=normals, uvs=uvs,
                 tangents=tangents, tris=indices, tri_mat=mat)
        )
        return len(self._protos) - 1

    def add_instance(self, proto: int, transform=None) -> None:
        """Instance a prototype with an optional [4, 4] row-major affine
        transform. Mirrored transforms (negative determinant) are rejected:
        they flip triangle winding, which would silently invert the
        back-side/volume semantics (parametric.cpp:834-838)."""
        m = (
            np.eye(4, dtype=np.float64)
            if transform is None
            else np.asarray(transform, np.float64).reshape(4, 4)
        )
        det = np.linalg.det(m[:3, :3])
        if det <= 0:
            raise ValueError(
                f"instance transform must be orientation-preserving "
                f"(det={det:g})"
            )
        self._instances.append((int(proto), m))

    def set_env(
        self, image: np.ndarray, scale: float = 1.0, rotation=None,
        bounds=None,
    ) -> None:
        """Octahedral-projected HDR environment image [H, W, 3]
        (the reference stores env maps octahedrally, src/main.cpp:81-84).
        `rotation`: optional [3, 3] world->map matrix (the reference env
        light's transform, light.cpp:208-214,228).
        `bounds`: optional portal crop (u0, v0, u1, v1) in map UV space
        (light.cpp:147-155): radiance and importance sampling are restricted
        to the rect. The reference's crop half-mixes equirect surface-area
        normalization into the octahedral pdf (its own TODO at
        light.cpp:147-148); here the pdf stays the correct octahedral
        measure (uv area 1 == 4pi sr) with out-of-rect weights zeroed."""
        self._env_image = np.asarray(image, np.float32)
        self._env_scale = float(scale)
        self._env_sampleable = True
        if rotation is not None:
            self._env_rotation = np.asarray(rotation, np.float32).reshape(3, 3)
        if bounds is not None:
            self._env_bounds = tuple(float(b) for b in bounds)

    def set_env_uniform(self, color) -> None:
        """UniformInfiniteLight (light.cpp:83-135): constant radiance that
        contributes ONLY on ray miss — its pdf is 0 and NEE never samples it
        (the reference disables sample(), light.cpp:105-133), though it still
        occupies the light sampler's reserved infinite-light probability."""
        self._env_image = np.broadcast_to(
            np.asarray(color, np.float32), (1, 1, 3)
        ).copy()
        self._env_scale = 1.0
        self._env_sampleable = False
        self._env_bounds = (0.0, 0.0, 1.0, 1.0)

    def set_background(self, color) -> None:
        self._background = tuple(color)

    def _compile_env(self, radius: float) -> dict:
        # Environment light (light.cpp:137-193). Importance sampling is an
        # alias table over the (W-1)x(H-1) bilinear base-cell grid so the
        # sampling cell and the radiance fetch share one index (see
        # scene/types.py env_* fields and render/lights.py).
        if self._env_image is not None:
            env_img = self._env_image * self._env_scale
            h, w = env_img.shape[:2]
            wc, hc = max(w - 1, 1), max(h - 1, 1)
            # Octahedral maps cover the full sphere uniformly in area, so no
            # sin(theta) weight (the reference's sinTheta term at
            # light.cpp:157-168 is an acknowledged leftover from equirect —
            # "TODO: do we need the sine term?"; we weight by mean RGB). The
            # cell weight integrates the bilinear quad (mean of corners).
            texw = env_img.mean(axis=-1)
            x1 = np.minimum(np.arange(wc) + 1, w - 1)
            y1 = np.minimum(np.arange(hc) + 1, h - 1)
            weight = 0.25 * (
                texw[:hc, :wc] + texw[:hc, x1] + texw[y1, :wc]
                + texw[y1][:, x1]
            )
            # Portal crop (light.cpp:147-155): zero sampling weight outside
            # the bounds rect (cell-center test).
            u0, vv0, u1, vv1 = self._env_bounds
            if (u0, vv0, u1, vv1) != (0.0, 0.0, 1.0, 1.0):
                uc = (np.arange(wc) + 0.5) / wc
                vc = (np.arange(hc) + 0.5) / hc
                inside = (
                    ((uc >= u0) & (uc < u1))[None, :]
                    & ((vc >= vv0) & (vc < vv1))[:, None]
                )
                weight = np.where(inside, weight, 0.0)
            prob, alias, pdf_cells = build_alias(weight)
            env_alias = np.stack(
                [prob, alias.view(np.float32), pdf_cells, pdf_cells[alias]],
                axis=1,
            ).astype(np.float32)
            env_lavg = env_img.reshape(-1, 3).mean(axis=0)
            env_power = 4.0 * _PI * _PI * radius * radius * float(env_lavg.mean())
            has_env = True
        else:
            env_img = np.zeros((1, 1, 3), np.float32)
            wc = hc = 1
            prob, alias, pdf_cells = build_alias(np.ones(1, np.float32))
            env_alias = np.stack(
                [prob, alias.view(np.float32), pdf_cells, pdf_cells[alias]],
                axis=1,
            ).astype(np.float32)
            env_lavg = np.zeros(3, np.float32)
            env_power = 0.0
            has_env = False

        return dict(env_img=env_img, env_alias=env_alias,
                pdf_cells=pdf_cells, env_lavg=env_lavg,
                env_power=env_power, has_env=has_env, wc=wc, hc=hc)

    # -- compile -----------------------------------------------------------

    def compile(self, max_leaf: int = 4, n_bins: int = 20, cluster_size: int = 128):
        if self._instances:
            return self._compile_instanced(max_leaf, n_bins, cluster_size)
        assert self._tris, "scene has no geometry"
        positions = np.concatenate(self._positions)
        normals = np.concatenate(self._normals)
        tangents = np.concatenate(self._tangents)
        uvs = np.concatenate(self._uvs)
        tri_v = np.concatenate(self._tris)
        tri_mat = np.concatenate(self._tri_mat)

        v0 = positions[tri_v[:, 0]]
        v1 = positions[tri_v[:, 1]]
        v2 = positions[tri_v[:, 2]]
        # Native C++ SAH build when available (yart_tpu/native), numpy fallback.
        from yart_tpu.native import build_bvh_native

        hb = build_bvh_native(v0, v1, v2, max_leaf=max_leaf, n_bins=n_bins)
        if hb is None:
            hb = build_bvh(v0, v1, v2, max_leaf=max_leaf, n_bins=n_bins)

        # Permute triangles into leaf order.
        tri_v = tri_v[hb.tri_order]
        tri_mat = tri_mat[hb.tri_order]
        v0, v1, v2 = v0[hb.tri_order], v1[hb.tri_order], v2[hb.tri_order]

        # Area lights: every triangle of an emissive material
        # (gltf.cpp:299-314), with globally-unique light indices.
        emissive_mats = np.asarray(
            [m.is_emissive for m in self._materials], bool
        )
        is_light = emissive_mats[tri_mat] if len(self._materials) else np.zeros(len(tri_mat), bool)
        light_tri = np.nonzero(is_light)[0].astype(np.int32)
        tri_light = np.full(tri_v.shape[0], -1, np.int32)
        tri_light[light_tri] = np.arange(light_tri.size, dtype=np.int32)

        emission_table = np.asarray(
            [
                np.asarray(m.emission, np.float32) * np.float32(m.emission_strength)
                for m in self._materials
            ]
            or np.zeros((0, 3), np.float32),
            np.float32,
        )
        l_emission = emission_table[tri_mat[light_tri]] if light_tri.size else np.zeros((0, 3), np.float32)
        e1 = v1[light_tri] - v0[light_tri]
        e2 = v2[light_tri] - v0[light_tri]
        l_area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).astype(np.float32)
        ts_table = np.asarray(
            [m.two_sided for m in self._materials] or [False], bool
        )
        two_sided = (
            ts_table[tri_mat[light_tri]]
            if light_tri.size
            else np.zeros(0, bool)
        )
        # power = |Le| * A * pi * (2 if twoSided) (light.cpp:36-38)
        l_power = (
            np.linalg.norm(l_emission, axis=-1)
            * l_area
            * _PI
            * np.where(two_sided, 2.0, 1.0)
        ).astype(np.float32)
        l_cdf = np.concatenate([[0.0], np.cumsum(l_power)]).astype(np.float32)
        # Pre-pack light triangle geometry so device-side light sampling is
        # gather-free (one-hot matmul over [L, ...] tables).
        if light_tri.size:
            ltv = tri_v[light_tri]
            l_verts = np.stack(
                [positions[ltv[:, k]] for k in range(3)], axis=1
            ).astype(np.float32)
            l_norms = np.stack(
                [normals[ltv[:, k]] for k in range(3)], axis=1
            ).astype(np.float32)
        else:
            l_verts = np.zeros((0, 3, 3), np.float32)
            l_norms = np.zeros((0, 3, 3), np.float32)

        # Scene bounds and radius (bounding sphere of the root AABB).
        lo = positions.min(axis=0)
        hi = positions.max(axis=0)
        center = (lo + hi) * 0.5
        radius = float(np.linalg.norm(hi - lo) * 0.5)

        env = self._compile_env(radius)
        env_img = env["env_img"]
        env_alias = env["env_alias"]
        pdf_cells = env["pdf_cells"]
        env_lavg = env["env_lavg"]
        env_power = env["env_power"]
        has_env = env["has_env"]
        wc, hc = env["wc"], env["hc"]

        materials = _material_table(self._materials)

        # Packed gather rows (device traversal/shading fetch ONE row each).
        bits = lambda a: np.ascontiguousarray(a, np.int32).view(np.float32)
        node_pack = np.concatenate(
            [
                hb.node_min,
                hb.node_max,
                bits(hb.left)[:, None],
                bits(hb.count)[:, None],
            ],
            axis=1,
        ).astype(np.float32)
        tri_pack = np.zeros((tri_v.shape[0], 12), np.float32)
        tri_pack[:, 0:3] = v0
        tri_pack[:, 3:6] = v1
        tri_pack[:, 6:9] = v2
        tri_pack[:, 9] = bits(tri_mat)
        tri_pack[:, 10] = bits(tri_light)
        shade_pack = np.zeros((tri_v.shape[0], 32), np.float32)
        shade_pack[:, 0:9] = normals[tri_v].reshape(-1, 9)
        shade_pack[:, 9:15] = uvs[tri_v].reshape(-1, 6)
        shade_pack[:, 15:27] = tangents[tri_v].reshape(-1, 12)
        shade_pack[:, 27] = bits(tri_mat)
        shade_pack[:, 28] = bits(tri_light)

        # 8-wide BVH for the TPU traversal (binary kept as oracle/fallback).
        from yart_tpu.native import collapse_bvh8_native

        hb8 = collapse_bvh8_native(hb)
        if hb8 is None:
            hb8 = collapse_bvh8(hb)

        # Bin-trace pipeline tables (scene/clusters.py): triangle clusters +
        # coarse BVH8 + matmul-MT rows.
        from yart_tpu.scene.clusters import build_coarse, cut_clusters, woop_rows

        c_size = int(cluster_size)
        cut = cut_clusters(hb, c_size)
        coarse = build_coarse(cut)
        cut = coarse.cut
        clus_pack = woop_rows(v0, v1, v2, cut, c_size)
        if any(m.has_alpha for m in self._materials):
            # Conservative alpha bitmasks in pack row 5: the gated
            # traversal culls certainly-transparent candidates in-kernel
            # (scene/alphamask.py), collapsing the re-cast tail.
            from yart_tpu.scene.alphamask import (
                bake_tri_masks, write_mask_rows,
            )

            masks = bake_tri_masks(
                uvs[tri_v], tri_mat,
                np.asarray([m.has_alpha for m in self._materials], bool),
                np.asarray(
                    [m.tex_base for m in self._materials], np.int64
                ),
                self.textures_rgba,
            )
            write_mask_rows(clus_pack, masks, cut.first, cut.count, c_size)
        # Block-trace cluster boxes, SoA lane-padded (render/blocktrace.py).
        n_clus = int(cut.first.shape[0])
        n_clus_pad = max(128, -(-n_clus // 512) * 512 if n_clus > 128 else 128)
        clus_box = np.zeros((8, n_clus_pad), np.float32)
        # Pad boxes at +BIG: the slab test min/max-normalizes inverted
        # bounds, so a lo>hi sentinel would become a REAL box around the
        # origin. A degenerate far box gives entry >= t_cur (or NaN after
        # margins), so pad ids are never selected for the cluster DMA.
        clus_box[0:3, :] = 3.0e38
        clus_box[3:6, :] = 3.0e38
        clus_box[0:3, :n_clus] = cut.lo.T
        clus_box[3:6, :n_clus] = cut.hi.T
        wide_pack = np.concatenate(
            [
                hb8.boxes.reshape(-1, 48),
                bits(hb8.child).reshape(-1, 8),
            ],
            axis=1,
        ).astype(np.float32)

        scene = CompiledScene(
            positions=jnp.asarray(positions),
            normals=jnp.asarray(normals),
            tangents=jnp.asarray(tangents),
            uvs=jnp.asarray(uvs),
            tri_v=jnp.asarray(tri_v),
            tri_mat=jnp.asarray(tri_mat),
            tri_light=jnp.asarray(tri_light),
            bvh=FlatBVH(
                node_min=jnp.asarray(hb.node_min),
                node_max=jnp.asarray(hb.node_max),
                left=jnp.asarray(hb.left),
                count=jnp.asarray(hb.count),
            ),
            node_pack=jnp.asarray(node_pack),
            wide_pack=jnp.asarray(wide_pack),
            tri_pack=jnp.asarray(tri_pack),
            shade_pack=jnp.asarray(shade_pack),
            materials=materials,
            light_tri=jnp.asarray(light_tri),
            light_emission=jnp.asarray(l_emission),
            light_area=jnp.asarray(l_area),
            light_power=jnp.asarray(l_power),
            light_cdf=jnp.asarray(l_cdf),
            light_two_sided=jnp.asarray(two_sided),
            light_verts=jnp.asarray(l_verts),
            light_norms=jnp.asarray(l_norms),
            env_image=jnp.asarray(env_img),
            env_bounds=jnp.asarray(self._env_bounds, jnp.float32),
            env_alias=jnp.asarray(env_alias),
            env_pdf_cells=jnp.asarray(pdf_cells),
            env_rows=_env_rows_from_image(
                jnp.asarray(env_img), jnp.asarray(pdf_cells)
            ),
            env_lavg=jnp.asarray(env_lavg, jnp.float32),
            env_power=jnp.asarray(env_power, jnp.float32),
            env_rotation=jnp.asarray(self._env_rotation),
            tex_rgba=_stack_from_list(self.textures_rgba, 4),
            tex_rgb=_stack_from_list(self.textures_rgb, 3),
            tex_2ch=_stack_from_list(self.textures_2ch, 2),
            tex_mono=_stack_from_list(self.textures_mono, 1),
            scene_center=jnp.asarray(center, jnp.float32),
            scene_radius=jnp.asarray(radius, jnp.float32),
            background=jnp.asarray(self._background, jnp.float32),
            clus_pack=jnp.asarray(clus_pack),
            clus_first=jnp.asarray(cut.first),
            coarse_pack=jnp.asarray(coarse.wide_pack),
            clus_box=jnp.asarray(clus_box),
        )
        meta = SceneMeta(
            n_tris=int(tri_v.shape[0]),
            n_materials=len(self._materials),
            n_lights=int(light_tri.size),
            has_env=has_env,
            env_sampleable=self._env_sampleable,
            env_portal=self._env_bounds != (0.0, 0.0, 1.0, 1.0),
            env_wc=wc,
            env_hc=hc,
            max_leaf=max_leaf,
            bvh_depth=hb.depth,
            wide_depth=hb8.depth,
            any_alpha=any(m.has_alpha for m in self._materials),
            # transparent() == thin && transmission > 0 (parametric.cpp:80-82)
            any_transparent=any(
                m.thin and m.transmission > 0.0 for m in self._materials
            ),
            any_metallic=any(
                m.metallic > 0.0 or m.tex_mr >= 0 for m in self._materials
            ),
            any_transmissive=any(
                m.transmission > 0.0 or m.tex_transmission >= 0
                for m in self._materials
            ),
            any_clearcoat=any(
                m.clearcoat > 0.0 or m.tex_clearcoat >= 0
                for m in self._materials
            ),
            any_anisotropy=any(
                m.anisotropic != 0.0 for m in self._materials
            ),
            n_clusters=int(cut.first.shape[0]),
            n_clus_pad=n_clus_pad,
            cluster_size=c_size,
            coarse_depth=coarse.depth,
            coarse_max_leaf=coarse.max_leaf,
            any_textures=any(
                m.tex_base >= 0
                or m.tex_mr >= 0
                or m.tex_transmission >= 0
                or m.tex_normal >= 0
                or m.tex_clearcoat >= 0
                or m.tex_emission >= 0
                for m in self._materials
            ),
        )
        return scene, meta

    def _compile_instanced(self, max_leaf: int, n_bins: int,
                           cluster_size: int):
        """Compile a scene with instanced prototypes.

        Per-prototype traversal data (SAH BVH, cluster packs, shading rows)
        is compiled ONCE in object space via a nested compile; instances
        contribute a [4, 4] transform row, per-virtual-triangle id maps
        (tri_aux, 4 B/column/tri), and world-space area-light registration.
        Traversal runs per instance with rays mapped into object space by
        the UNNORMALIZED inverse transform, so the hit parameter t is the
        world parameter and closest-hit merging across instances is a plain
        min (render/intersect.py _intersect_instanced)."""
        import dataclasses as _dc

        # Legacy add_mesh records (already world space) join as identity
        # instances of their own prototypes so mixed scenes compile
        # uniformly.
        if self._tris:
            v_off = 0
            for k in range(len(self._tris)):
                nv = self._positions[k].shape[0]
                pid = len(self._protos)
                self._protos.append(dict(
                    positions=self._positions[k].astype(np.float64),
                    normals=self._normals[k].astype(np.float64),
                    uvs=self._uvs[k].astype(np.float64),
                    tangents=self._tangents[k].astype(np.float64),
                    tris=(self._tris[k].astype(np.int64) - v_off),
                    tri_mat=self._tri_mat[k],
                ))
                self._instances.append((pid, np.eye(4, dtype=np.float64)))
                v_off += nv
            self._positions = []
            self._normals = []
            self._uvs = []
            self._tangents = []
            self._tris = []
            self._tri_mat = []
            self._vtx_offset = 0

        # --- per-prototype object-space traversal compiles ---
        proto_scenes = []
        proto_metas = []
        for pr in self._protos:
            sb = SceneBuilder()
            sb._materials = self._materials  # shared (no copy)
            # Shared so the proto compile can bake alpha bitmasks into its
            # object-space pack (scene/alphamask.py); the proto's own
            # texture stacks are transient (the instanced scene rebuilds
            # them once below).
            sb.textures_rgba = self.textures_rgba
            sb.add_mesh(
                pr["positions"], pr["tris"], pr["tri_mat"],
                normals=pr["normals"], uvs=pr["uvs"],
                tangents=pr["tangents"],
            )
            ps, pm = sb.compile(
                max_leaf=max_leaf, n_bins=n_bins, cluster_size=cluster_size
            )
            proto_scenes.append(ps)
            proto_metas.append(pm)

        n_proto = len(self._protos)
        inst_proto = tuple(int(p) for p, _ in self._instances)
        n_inst = len(self._instances)
        proto_ntris = [int(ps.tri_v.shape[0]) for ps in proto_scenes]
        proto_shade_base = np.concatenate(
            [[0], np.cumsum(proto_ntris)]
        ).astype(np.int64)
        inst_ntris = np.asarray([proto_ntris[p] for p in inst_proto])
        inst_tri_base = np.concatenate(
            [[0], np.cumsum(inst_ntris)]
        ).astype(np.int64)
        n_virt = int(inst_tri_base[-1])

        # Host views of per-proto leaf-ordered triangle data.
        proto_v012 = [np.asarray(ps.tri_pack[:, 0:9]) for ps in proto_scenes]
        proto_nrm9 = [
            np.asarray(ps.shade_pack[:, 0:9]) for ps in proto_scenes
        ]
        proto_mat = [np.asarray(ps.tri_mat) for ps in proto_scenes]

        # Instance transform rows: inverse 3x4 (world->object, rays),
        # forward 3x4 (points/tangents), normal matrix 3x3 (inv-transpose).
        inst_rows = np.zeros((n_inst, 40), np.float32)
        emission_table = np.asarray(
            [
                np.asarray(m.emission, np.float32)
                * np.float32(m.emission_strength)
                for m in self._materials
            ]
            or np.zeros((0, 3), np.float32),
            np.float32,
        )
        emissive_mats = np.asarray(
            [m.is_emissive for m in self._materials], bool
        )
        ts_table = np.asarray(
            [m.two_sided for m in self._materials] or [False], bool
        )

        tri_aux = np.zeros((max(n_virt, 1), 8), np.int32)
        lights = dict(tri=[], emission=[], area=[], two=[], verts=[],
                      norms=[])
        lo = np.full(3, np.inf)
        hi = np.full(3, -np.inf)
        n_light = 0
        for i, (p, m) in enumerate(self._instances):
            inv = np.linalg.inv(m)
            nrm_m = np.linalg.inv(m[:3, :3]).T
            inst_rows[i, 0:12] = inv[:3, :4].reshape(-1)
            inst_rows[i, 12:24] = m[:3, :4].reshape(-1)
            inst_rows[i, 24:33] = nrm_m.reshape(-1)

            base = int(inst_tri_base[i])
            tp = proto_ntris[p]
            sl = slice(base, base + tp)
            tri_aux[sl, 0] = (
                proto_shade_base[p] + np.arange(tp)
            ).astype(np.int32)
            tri_aux[sl, 1] = i
            tri_aux[sl, 2] = -1
            tri_aux[sl, 3] = proto_mat[p]

            # Instance world bounds from the prototype vertex bounds'
            # 8 transformed corners.
            pl = self._protos[p]["positions"].min(axis=0)
            ph = self._protos[p]["positions"].max(axis=0)
            cs = np.array(
                [[x, y, z] for x in (pl[0], ph[0]) for y in (pl[1], ph[1])
                 for z in (pl[2], ph[2])]
            )
            wc8 = cs @ m[:3, :3].T + m[:3, 3]
            lo = np.minimum(lo, wc8.min(axis=0))
            hi = np.maximum(hi, wc8.max(axis=0))

            # Area lights per emissive instance triangle (world space).
            em_mask = (
                emissive_mats[proto_mat[p]]
                if len(self._materials)
                else np.zeros(tp, bool)
            )
            em_idx = np.nonzero(em_mask)[0]
            if em_idx.size:
                v9 = proto_v012[p][em_idx]  # [E, 9] object space
                v = v9.reshape(-1, 3, 3) @ m[:3, :3].T + m[:3, 3]
                nn = proto_nrm9[p][em_idx].reshape(-1, 3, 3) @ nrm_m.T
                nn = nn / np.maximum(
                    np.linalg.norm(nn, axis=-1, keepdims=True), 1e-20
                )
                tri_aux[base + em_idx, 2] = (
                    n_light + np.arange(em_idx.size)
                ).astype(np.int32)
                lights["tri"].append(base + em_idx)
                lights["emission"].append(
                    emission_table[proto_mat[p][em_idx]]
                )
                e1 = v[:, 1] - v[:, 0]
                e2 = v[:, 2] - v[:, 0]
                lights["area"].append(
                    0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
                )
                lights["two"].append(ts_table[proto_mat[p][em_idx]])
                lights["verts"].append(v)
                lights["norms"].append(nn)
                n_light += em_idx.size

        if n_light:
            light_tri = np.concatenate(lights["tri"]).astype(np.int32)
            l_emission = np.concatenate(lights["emission"]).astype(np.float32)
            l_area = np.concatenate(lights["area"]).astype(np.float32)
            two_sided = np.concatenate(lights["two"])
            l_verts = np.concatenate(lights["verts"]).astype(np.float32)
            l_norms = np.concatenate(lights["norms"]).astype(np.float32)
        else:
            light_tri = np.zeros(0, np.int32)
            l_emission = np.zeros((0, 3), np.float32)
            l_area = np.zeros(0, np.float32)
            two_sided = np.zeros(0, bool)
            l_verts = np.zeros((0, 3, 3), np.float32)
            l_norms = np.zeros((0, 3, 3), np.float32)
        l_power = (
            np.linalg.norm(l_emission, axis=-1) * l_area * _PI
            * np.where(two_sided, 2.0, 1.0)
        ).astype(np.float32)
        l_cdf = np.concatenate([[0.0], np.cumsum(l_power)]).astype(np.float32)

        center = (lo + hi) * 0.5
        radius = float(np.linalg.norm(hi - lo) * 0.5)
        env = self._compile_env(radius)
        materials = _material_table(self._materials)
        tex_rgba = _stack_from_list(self.textures_rgba, 4)
        tex_rgb = _stack_from_list(self.textures_rgb, 3)
        tex_2ch = _stack_from_list(self.textures_2ch, 2)
        tex_mono = _stack_from_list(self.textures_mono, 1)

        # Share one materials table + texture stacks across the prototype
        # scenes (their per-hit gates fetch textures during traversal).
        proto_scenes = [
            ps._replace(
                materials=materials, tex_rgba=tex_rgba, tex_rgb=tex_rgb,
                tex_2ch=tex_2ch, tex_mono=tex_mono,
            )
            for ps in proto_scenes
        ]

        shade_pack = np.concatenate(
            [np.asarray(ps.shade_pack) for ps in proto_scenes]
        )

        # --- single-pass instanced block-trace tables: every (instance,
        # proto-cluster) pair becomes one traversal cluster sharing the
        # prototype's object-space pack row; its world AABB comes from the
        # transformed object-box corners. ---
        pack_all = np.concatenate(
            [np.asarray(ps.clus_pack) for ps in proto_scenes]
        )
        proto_nclus = [pm.n_clusters for pm in proto_metas]
        proto_clus_base = np.concatenate(
            [[0], np.cumsum(proto_nclus)]
        ).astype(np.int64)
        proto_clus_first = [
            np.asarray(ps.clus_first) for ps in proto_scenes
        ]
        proto_clus_lohi = [
            (
                np.asarray(ps.clus_box)[0:3, : proto_nclus[k]].T,
                np.asarray(ps.clus_box)[3:6, : proto_nclus[k]].T,
            )
            for k, ps in enumerate(proto_scenes)
        ]
        ic_src, ic_inst, ic_fid, ic_lo, ic_hi = [], [], [], [], []
        for i, (p, m) in enumerate(self._instances):
            nc = proto_nclus[p]
            ic_src.append(proto_clus_base[p] + np.arange(nc))
            ic_inst.append(np.full(nc, i))
            ic_fid.append(int(inst_tri_base[i]) + proto_clus_first[p])
            plo, phi = proto_clus_lohi[p]
            # 8 transformed corners per object box -> world AABB.
            corners = np.stack(
                [
                    np.where(
                        np.asarray(
                            [(ix >> a) & 1 for a in range(3)], bool
                        )[None, :],
                        phi,
                        plo,
                    )
                    for ix in range(8)
                ],
                axis=1,
            )  # [nc, 8, 3]
            wcor = corners @ m[:3, :3].T + m[:3, 3]
            ic_lo.append(wcor.min(axis=1))
            ic_hi.append(wcor.max(axis=1))
        n_ic = int(sum(proto_nclus[p] for p, _ in self._instances))
        ic_src = np.concatenate(ic_src).astype(np.int32)
        ic_inst = np.concatenate(ic_inst).astype(np.int32)
        ic_fid = np.concatenate(ic_fid).astype(np.int32)
        ic_lo = np.concatenate(ic_lo).astype(np.float32)
        ic_hi = np.concatenate(ic_hi).astype(np.float32)
        n_ic_pad = max(128, -(-n_ic // 512) * 512 if n_ic > 128 else 128)
        ic_box = np.zeros((8, n_ic_pad), np.float32)
        ic_box[0:6, :] = 3.0e38  # far-box pad sentinel (see compile())
        ic_box[0:3, :n_ic] = ic_lo.T
        ic_box[3:6, :n_ic] = ic_hi.T
        pad_i = np.zeros(n_ic_pad - n_ic, np.int32)
        ic_src = np.concatenate([ic_src, pad_i])
        ic_inst = np.concatenate([ic_inst, pad_i])
        ic_fid = np.concatenate([ic_fid, pad_i])
        inst_flat = inst_rows[:, 0:12].reshape(-1).astype(np.float32)

        z1 = jnp.zeros((1,), jnp.float32)
        z13 = jnp.zeros((1, 3), jnp.float32)
        zi1 = jnp.zeros((1,), jnp.int32)
        dummy_bvh = FlatBVH(node_min=z13, node_max=z13, left=zi1, count=zi1)
        scene = CompiledScene(
            positions=z13,
            normals=z13,
            tangents=jnp.zeros((1, 4), jnp.float32),
            uvs=jnp.zeros((1, 2), jnp.float32),
            tri_v=jnp.zeros((1, 3), jnp.int32),
            tri_mat=zi1,
            tri_light=zi1,
            bvh=dummy_bvh,
            node_pack=jnp.zeros((1, 8), jnp.float32),
            wide_pack=jnp.zeros((1, 56), jnp.float32),
            tri_pack=jnp.zeros((1, 12), jnp.float32),
            shade_pack=jnp.asarray(shade_pack),
            materials=materials,
            light_tri=jnp.asarray(light_tri),
            light_emission=jnp.asarray(l_emission),
            light_area=jnp.asarray(l_area),
            light_power=jnp.asarray(l_power),
            light_cdf=jnp.asarray(l_cdf),
            light_two_sided=jnp.asarray(two_sided),
            light_verts=jnp.asarray(l_verts),
            light_norms=jnp.asarray(l_norms),
            env_image=jnp.asarray(env["env_img"]),
            env_bounds=jnp.asarray(self._env_bounds, jnp.float32),
            env_alias=jnp.asarray(env["env_alias"]),
            env_pdf_cells=jnp.asarray(env["pdf_cells"]),
            env_rows=_env_rows_from_image(
                jnp.asarray(env["env_img"]), jnp.asarray(env["pdf_cells"])
            ),
            env_lavg=jnp.asarray(env["env_lavg"], jnp.float32),
            env_power=jnp.asarray(env["env_power"], jnp.float32),
            env_rotation=jnp.asarray(self._env_rotation),
            tex_rgba=tex_rgba,
            tex_rgb=tex_rgb,
            tex_2ch=tex_2ch,
            tex_mono=tex_mono,
            scene_center=jnp.asarray(center, jnp.float32),
            scene_radius=jnp.asarray(radius, jnp.float32),
            background=jnp.asarray(self._background, jnp.float32),
            clus_pack=jnp.asarray(pack_all),
            clus_first=zi1,
            coarse_pack=jnp.zeros((1, 56), jnp.float32),
            clus_box=jnp.asarray(ic_box),
            protos=tuple(proto_scenes),
            inst_rows=jnp.asarray(inst_rows),
            inst_tri_base=jnp.asarray(inst_tri_base[:-1], jnp.int32),
            tri_aux=jnp.asarray(tri_aux),
            clus_src=jnp.asarray(ic_src),
            clus_inst=jnp.asarray(ic_inst),
            clus_fid=jnp.asarray(ic_fid),
            inst_flat=jnp.asarray(inst_flat),
            # diff_geometry for instanced scenes (integrator._refit_hit):
            # shared object-space prototype vertices + leaf-ordered
            # triangles concatenated per proto — tri_aux col 0 (the shade
            # row) indexes this space directly, and vertex grads
            # accumulate across every instance of a prototype.
            proto_pos=jnp.asarray(
                np.concatenate(
                    [np.asarray(ps.positions) for ps in proto_scenes]
                ),
                jnp.float32,
            ),
            proto_tri=jnp.asarray(
                np.concatenate([
                    np.asarray(ps.tri_v)
                    + np.int32(base)
                    for ps, base in zip(
                        proto_scenes,
                        np.concatenate(
                            [[0], np.cumsum([
                                int(ps.positions.shape[0])
                                for ps in proto_scenes
                            ])]
                        )[:-1],
                    )
                ]),
                jnp.int32,
            ),
        )
        meta = SceneMeta(
            n_tris=n_virt,
            n_materials=len(self._materials),
            n_lights=int(light_tri.size),
            has_env=env["has_env"],
            env_sampleable=self._env_sampleable,
            env_portal=self._env_bounds != (0.0, 0.0, 1.0, 1.0),
            env_wc=env["wc"],
            env_hc=env["hc"],
            max_leaf=max_leaf,
            bvh_depth=1,
            wide_depth=1,
            any_alpha=proto_metas[0].any_alpha,
            any_transparent=proto_metas[0].any_transparent,
            any_metallic=proto_metas[0].any_metallic,
            any_transmissive=proto_metas[0].any_transmissive,
            any_clearcoat=proto_metas[0].any_clearcoat,
            any_anisotropy=proto_metas[0].any_anisotropy,
            any_textures=proto_metas[0].any_textures,
            n_instances=n_inst,
            inst_proto=inst_proto,
            proto_metas=tuple(proto_metas),
            n_inst_clusters=n_ic,
            n_clus_pad=n_ic_pad,
            cluster_size=int(cluster_size),
        )
        return scene, meta


def _material_table(mats: List[MaterialDesc]) -> MaterialTable:
    if not mats:
        mats = [MaterialDesc()]
    f32 = lambda rows: jnp.asarray(np.asarray(rows, np.float32))
    i32 = lambda rows: jnp.asarray(np.asarray(rows, np.int32))
    return MaterialTable(
        base_color=f32([m.base_color for m in mats]),
        metallic=f32([m.metallic for m in mats]),
        roughness=f32([m.roughness for m in mats]),
        transmission=f32([m.transmission for m in mats]),
        ior=f32([m.ior for m in mats]),
        anisotropic=f32([m.anisotropic for m in mats]),
        aniso_rotation=f32([m.aniso_rotation for m in mats]),
        clearcoat=f32([m.clearcoat for m in mats]),
        cc_roughness=f32([m.cc_roughness for m in mats]),
        emission=f32(
            [
                np.asarray(m.emission, np.float32) * np.float32(m.emission_strength)
                for m in mats
            ]
        ),
        normal_scale=f32([m.normal_scale for m in mats]),
        thin=jnp.asarray([m.thin for m in mats]),
        volume_color=f32([m.volume_color for m in mats]),
        volume_density=f32([m.volume_density for m in mats]),
        tex_base=i32([m.tex_base for m in mats]),
        tex_mr=i32([m.tex_mr for m in mats]),
        tex_transmission=i32([m.tex_transmission for m in mats]),
        tex_normal=i32([m.tex_normal for m in mats]),
        tex_clearcoat=i32([m.tex_clearcoat for m in mats]),
        tex_emission=i32([m.tex_emission for m in mats]),
        has_alpha=jnp.asarray([m.has_alpha for m in mats]),
    )


def _face_normals_to_vertices(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals for meshes without authored normals."""
    v0 = positions[indices[:, 0]]
    v1 = positions[indices[:, 1]]
    v2 = positions[indices[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)
    out = np.zeros_like(positions)
    for k in range(3):
        np.add.at(out, indices[:, k], fn)
    n = np.linalg.norm(out, axis=-1, keepdims=True)
    return out / np.maximum(n, 1e-20)
