"""Compiled scene: flat SoA device arrays.

The reference keeps a pointer-based scene graph (src/core/scene.hpp:11-169)
with per-node transforms, per-mesh BVHs and virtual BSDF/Light objects, and
transforms rays into object space during traversal
(src/cpu/ray-integrator.cpp:20-54). The TPU design instead *compiles* the
scene once on the host:

- every mesh instance is pre-transformed to world space and concatenated into
  one global triangle soup (no per-node ray transforms in the hot loop),
- ONE global SAH BVH over all world-space triangles replaces per-mesh BVHs +
  scene-graph recursion (reference is bottom-level-only, README.md:46),
- materials become a `[M, P]` parameter table (the GLTF loader only ever
  constructs ParametricBSDF, src/gltf/gltf.cpp:152-175, so one uber-material
  table is lossless),
- emissive triangles become rows of an area-light table with a power CDF
  (src/core/light.cpp:16-81, light-sampler.cpp:32-93),
- the environment light is an octahedral image + piecewise-constant 2D
  distribution (src/core/light.cpp:137-242).

Everything in `CompiledScene` is a jnp array (a valid pytree, shardable /
donate-able); static python metadata lives in `SceneMeta`.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp



class MaterialTable(NamedTuple):
    """Parametric uber-material parameters, one row per material
    (src/bsdf/parametric.hpp:16-37). All leading dims [M]."""

    base_color: jnp.ndarray  # [M, 4] rgba factor
    metallic: jnp.ndarray  # [M]
    roughness: jnp.ndarray  # [M]
    transmission: jnp.ndarray  # [M]
    ior: jnp.ndarray  # [M]
    anisotropic: jnp.ndarray  # [M]
    aniso_rotation: jnp.ndarray  # [M] radians (KHR_materials_anisotropy)
    clearcoat: jnp.ndarray  # [M]
    cc_roughness: jnp.ndarray  # [M]
    emission: jnp.ndarray  # [M, 3] (already scaled by emission strength)
    normal_scale: jnp.ndarray  # [M]
    thin: jnp.ndarray  # [M] bool: thin transmission
    volume_color: jnp.ndarray  # [M, 3]
    volume_density: jnp.ndarray  # [M]
    # Texture slot indices into the texture stacks; -1 = untextured.
    tex_base: jnp.ndarray  # [M] RGBA
    tex_mr: jnp.ndarray  # [M] 2ch (metallic, roughness)
    tex_transmission: jnp.ndarray  # [M] mono
    tex_normal: jnp.ndarray  # [M] RGB
    tex_clearcoat: jnp.ndarray  # [M] mono
    tex_emission: jnp.ndarray  # [M] RGB
    has_alpha: jnp.ndarray  # [M] bool (parametric.cpp:59-62)


class TextureStack(NamedTuple):
    """Texture atlas for one channel count — the TPU analog of the
    reference's typed texture pools (src/core/scene.hpp:120-169).

    All textures of a channel class are shelf-packed into ONE [H, W, C]
    image (a padded per-texture stack would allocate every texture at the
    max H x W — fifty 256^2 maps plus one 4k map would cost fifty-one 4k
    slabs). No border texels are needed: the reference's bilinear fetch
    scales by (size - 1) and clamps the base texel to size - 2
    (src/core/texture.cpp:21-35), so a lookup never reads outside its own
    rect. Data is stored in the reference's storage encoding (gamma-2 for
    sRGB color, linear otherwise, texture.hpp:80-84).
    """

    data: jnp.ndarray  # [H, W, C] float32 storage-encoded atlas
    table: jnp.ndarray  # [n_tex, 4] int32 (x0, y0, w, h) rects
    # Per-texel 2x2 quad rows (render/texture.py qrows_from_data): one row
    # gather serves a whole bilinear fetch — per-lane gathers cost ~10
    # ns/row regardless of width (tools/diag_gather.py), so 4 separate
    # corner gathers per sample were 4x the cost for the same bytes.
    qrows: jnp.ndarray  # [H*W, 4C]


class FlatBVH(NamedTuple):
    """Flattened binary SAH BVH (reference node: src/core/bvh.hpp:21-33).

    Inner node i: children at left[i] and left[i]+1, count[i] == 0.
    Leaf node i:  triangles [left[i], left[i]+count[i]) — triangle arrays are
    permuted at compile time so each leaf is contiguous.
    """

    node_min: jnp.ndarray  # [N, 3]
    node_max: jnp.ndarray  # [N, 3]
    left: jnp.ndarray  # [N] int32
    count: jnp.ndarray  # [N] int32


class CompiledScene(NamedTuple):
    """The full scene as one pytree of device arrays."""

    # Geometry (world space, SoA; reference: src/core/mesh.hpp:15-128)
    positions: jnp.ndarray  # [V, 3]
    normals: jnp.ndarray  # [V, 3]
    tangents: jnp.ndarray  # [V, 4] xyz + handedness w
    uvs: jnp.ndarray  # [V, 2]
    tri_v: jnp.ndarray  # [T, 3] int32 vertex indices
    tri_mat: jnp.ndarray  # [T] int32
    tri_light: jnp.ndarray  # [T] int32, -1 = not emissive
    bvh: FlatBVH
    # Packed hot-path rows (one gather instead of many; int fields bitcast
    # into the f32 rows):
    node_pack: jnp.ndarray  # [Nn, 8] min(3) max(3) left count
    wide_pack: jnp.ndarray  # [M8, 56] 8x(min3 max3) + 8 bitcast child refs
    tri_pack: jnp.ndarray  # [T, 12] v0 v1 v2 mat light pad(2)... see builder
    shade_pack: jnp.ndarray  # [T, 32] n0 n1 n2 uv0 uv1 uv2 t0 t1 t2 mat light

    materials: MaterialTable

    # Area lights (src/core/light.cpp:16-81)
    light_tri: jnp.ndarray  # [L] int32 triangle index
    light_emission: jnp.ndarray  # [L, 3]
    light_area: jnp.ndarray  # [L] world-space area
    light_power: jnp.ndarray  # [L] scalar power for the sampler
    light_cdf: jnp.ndarray  # [L+1] cumulative power, unnormalized
    light_two_sided: jnp.ndarray  # [L] bool
    light_verts: jnp.ndarray  # [L, 3, 3] triangle vertices (prepacked)
    light_norms: jnp.ndarray  # [L, 3, 3] vertex normals (prepacked)

    # Environment light (octahedral; src/core/light.cpp:137-242).
    # Importance sampling is an alias table over the (W-1)x(H-1) bilinear
    # base-cell grid (ops/distribution.py build_alias) — O(1), one row
    # gather per draw; env_rows packs each cell's 2x2 texel quad + its
    # sampling pdf so radiance AND pdf come from a single row fetch
    # (per-lane gathers cost ~10 ns/row flat, tools/diag_gather.py).
    env_image: jnp.ndarray  # [H, W, 3] linear HDR (1x1 zeros if absent)
    env_bounds: jnp.ndarray  # [4] portal crop (u0, v0, u1, v1); full = 0,0,1,1
    env_alias: jnp.ndarray  # [K, 4] (prob, alias bits, pdf, pdf_alias)
    env_pdf_cells: jnp.ndarray  # [K] uv-square density per cell
    env_rows: jnp.ndarray  # [K, 16] 2x2 rgb quad (12) + pdf + pad(3)
    env_lavg: jnp.ndarray  # [3]
    env_power: jnp.ndarray  # []
    env_rotation: jnp.ndarray  # [3, 3] world->map rotation (light.cpp:208,228)

    # Texture stacks by channel count; empty stacks have n_tex == 0.
    tex_rgba: TextureStack
    tex_rgb: TextureStack
    tex_2ch: TextureStack
    tex_mono: TextureStack

    scene_center: jnp.ndarray  # [3]
    scene_radius: jnp.ndarray  # []
    background: jnp.ndarray  # [3] (src/core/renderer.hpp:52)

    # Bin-trace pipeline (scene/clusters.py, render/bintrace.py):
    clus_pack: jnp.ndarray  # [n_clus, 8, 3C] matmul-MT triangle rows
    clus_first: jnp.ndarray  # [n_clus] i32 first triangle of each cluster
    coarse_pack: jnp.ndarray  # [Gc, 56] coarse BVH8 over cluster AABBs
    # Block-trace pipeline (render/blocktrace.py): cluster AABBs in SoA
    # rows (lo.xyz, hi.xyz, 2 pad), lane-padded; pad clusters are inverted
    # boxes that no ray can enter.
    clus_box: jnp.ndarray  # [8, n_clus_pad] f32

    # Instancing (reference shares one Mesh across Nodes, scene.hpp:48-66;
    # here prototypes own object-space traversal/shading data ONCE and
    # instances are transforms + 4-byte/tri id maps — the heavy per-tri
    # packs are shared). Empty ([0]-shaped) when meta.n_instances == 0.
    # (None / empty defaults keep legacy pytrees unchanged; defaults must
    # not build device arrays at class-definition time.)
    protos: tuple = ()  # tuple[CompiledScene]: per-prototype traversal scenes
    inst_rows: object = None  # [I, 40] inv 3x4 | fwd 3x4 | normal 3x3 | pad
    inst_tri_base: object = None  # [I] i32 first virtual tri per instance
    tri_aux: object = None  # [Tv, 8] i32: shade row, inst, light, mat
    # Single-pass instanced block-trace (kernels/pallas_fusedtrace.py with
    # instanced=True): every (instance, prototype-cluster) pair is one
    # traversal cluster — world AABB in clus_box, shared object-space pack
    # row via clus_src, the ray transform fetched from SMEM per candidate.
    clus_src: object = None  # [n_ic_pad] i32 pack row per instance-cluster
    clus_inst: object = None  # [n_ic_pad] i32 instance per instance-cluster
    clus_fid: object = None  # [n_ic_pad] i32 first GLOBAL tri per ic
    inst_flat: object = None  # [I * 12] f32 inverse 3x4 rows (SMEM)
    # Differentiable-geometry support for instanced scenes (diff mode
    # only; integrator._refit_hit): shared OBJECT-space prototype
    # vertices + concatenated proto triangles, so vertex gradients
    # accumulate across every instance of a prototype.
    proto_pos: object = None  # [sum V_p, 3] f32 object-space vertices
    proto_tri: object = None  # [sum T_p, 3] i32 into proto_pos


@dataclasses.dataclass(frozen=True)
class SceneMeta:
    """Static (python) scene facts that control tracing/compilation."""

    n_tris: int
    n_materials: int
    n_lights: int
    has_env: bool
    max_leaf: int
    bvh_depth: int  # max traversal stack depth needed
    wide_depth: int = 8  # 8-ary tree depth (stack bound = 7 * wide_depth)
    # UniformInfiniteLight semantics (light.cpp:83-135): when False the env
    # contributes only on miss — pdf 0, never NEE-sampled.
    env_sampleable: bool = True
    env_portal: bool = False  # portal bounds crop active (light.cpp:147-155)
    env_wc: int = 1  # env sampling grid = (W-1) x (H-1) bilinear base cells
    env_hc: int = 1
    any_alpha: bool = False  # any material has alpha-tested transparency
    any_textures: bool = False
    any_transparent: bool = False  # any thin-transmissive (NEE-transparent) material
    # Static lobe usage — lets the BSDF skip whole lobes at trace time:
    any_metallic: bool = True
    any_transmissive: bool = True
    any_clearcoat: bool = True
    any_anisotropy: bool = True
    # Bin-trace pipeline facts (scene/clusters.py):
    n_clusters: int = 1
    cluster_size: int = 128  # C: triangle capacity per cluster
    coarse_depth: int = 1  # coarse wide-tree depth (stack bound = 7 * depth)
    coarse_max_leaf: int = 2  # max clusters per coarse leaf
    bintrace_k: int = 12  # K: cluster slots per ray per round
    n_clus_pad: int = 128  # clus_box lane padding (multiple of 128)
    # Instancing statics: per-instance prototype ids and per-proto metas
    # (tuples so the dataclass stays hashable for jit static args).
    n_instances: int = 0
    inst_proto: tuple = ()  # tuple[int] per instance
    proto_metas: tuple = ()  # tuple[SceneMeta] per prototype
    n_inst_clusters: int = 0  # instance-cluster count (single-pass trace)
