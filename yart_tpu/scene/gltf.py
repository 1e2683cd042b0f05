"""GLTF 2.0 / GLB scene loader.

Feature-parity port of the reference loader (src/gltf/gltf.cpp) written
against the raw glTF JSON (no fastgltf): GLB container + external/data-URI
buffers, POSITION/NORMAL/TEXCOORD_0/TANGENT accessors, per-node TRS or
matrix transforms applied through the SceneBuilder (world-space pretransform
replaces the reference's runtime scene graph), and the full material mapping:

- baseColorFactor + sRGB RGBA texture (gltf.cpp:69-77)
- metallic/roughness factors + channels (G, B) of the MR texture as a 2ch
  non-color texture (gltf.cpp:79-89)
- KHR_materials_transmission factor + mono texture (gltf.cpp:91-103)
- thinTransmission hardcoded true (gltf.cpp:104-105)
- KHR_materials_anisotropy strength/rotation (gltf.cpp:108-113)
- KHR_materials_clearcoat factor/roughness (default ccr 0.03, gltf.cpp:115-121)
- emissiveFactor x KHR_materials_emissive_strength + sRGB texture
  (gltf.cpp:123-133)
- normalTexture + scale (gltf.cpp:136-145)
- KHR_materials_volume: attenuationColor, density = 1/attenuationDistance
  (gltf.cpp:147-153)

Emissive-material triangles auto-register as area lights inside
SceneBuilder.compile (gltf.cpp:299-314).
"""

from __future__ import annotations

import base64
import io
import json
import os
import struct
from typing import Dict, List, Optional

import numpy as np

from yart_tpu.ops.color import gamma2_encode_np, srgb_decode_np
from yart_tpu.scene.builder import MaterialDesc, SceneBuilder

class GltfError(ValueError):
    """Malformed glTF/GLB input. Raised LOUDLY for any structural defect
    (truncated chunks, accessor overruns, unknown componentTypes, missing
    buffers) — this loader must never emit garbage geometry from a bad
    file. Validation role of fastgltf in the reference
    (src/gltf/gltf.cpp:323-337)."""


_COMPONENT_DTYPES = {
    5120: np.int8,
    5121: np.uint8,
    5122: np.int16,
    5123: np.uint16,
    5125: np.uint32,
    5126: np.float32,
}
_TYPE_COUNTS = {
    "SCALAR": 1,
    "VEC2": 2,
    "VEC3": 3,
    "VEC4": 4,
    "MAT4": 16,
}


class _Gltf:
    def __init__(self, doc: dict, buffers: List[bytes], base_dir: str):
        self.doc = doc
        self.buffers = buffers
        self.base_dir = base_dir

    def _view_buffer(self, bv_idx, what: str):
        """Resolve a bufferView -> (view dict, backing bytes), validating
        every index and length instead of trusting numpy/IndexError."""
        views = self.doc.get("bufferViews", [])
        if not (0 <= bv_idx < len(views)):
            raise GltfError(
                f"{what}: bufferView {bv_idx} out of range "
                f"(file has {len(views)})"
            )
        bv = views[bv_idx]
        bi = bv.get("buffer", 0)
        if not (0 <= bi < len(self.buffers)):
            raise GltfError(
                f"{what}: bufferView {bv_idx} references buffer {bi} "
                f"but the file has {len(self.buffers)} buffer(s)"
            )
        buf = self.buffers[bi]
        end = bv.get("byteOffset", 0) + bv.get("byteLength", 0)
        if end > len(buf):
            raise GltfError(
                f"{what}: bufferView {bv_idx} spans bytes "
                f"[{bv.get('byteOffset', 0)}, {end}) but buffer {bi} holds "
                f"only {len(buf)} bytes (truncated file?)"
            )
        return bv, buf

    def accessor(self, idx: int) -> np.ndarray:
        accs = self.doc.get("accessors", [])
        if not (0 <= idx < len(accs)):
            raise GltfError(
                f"accessor {idx} out of range (file has {len(accs)})"
            )
        acc = accs[idx]
        n = acc["count"]
        if acc["type"] not in _TYPE_COUNTS:
            raise GltfError(f"accessor {idx}: unknown type {acc['type']!r}")
        ncomp = _TYPE_COUNTS[acc["type"]]
        if acc["componentType"] not in _COMPONENT_DTYPES:
            raise GltfError(
                f"accessor {idx}: unknown componentType "
                f"{acc['componentType']} (spec values: "
                f"{sorted(_COMPONENT_DTYPES)})"
            )
        dtype = _COMPONENT_DTYPES[acc["componentType"]]
        itemsize = np.dtype(dtype).itemsize * ncomp

        if "bufferView" not in acc:
            out = np.zeros((n, ncomp), dtype)
        else:
            bv, buf = self._view_buffer(acc["bufferView"], f"accessor {idx}")
            offset = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
            stride = bv.get("byteStride", itemsize)
            need = offset + (
                (n - 1) * stride + itemsize if n else 0
            )
            if need > len(buf):
                raise GltfError(
                    f"accessor {idx}: count={n} stride={stride} at byte "
                    f"offset {offset} needs {need} bytes but buffer holds "
                    f"{len(buf)} (accessor overrun / truncated buffer)"
                )
            if stride == itemsize:
                out = np.frombuffer(
                    buf, dtype, count=n * ncomp, offset=offset
                ).reshape(n, ncomp)
            else:
                raw = np.frombuffer(
                    buf, np.uint8, count=(n - 1) * stride + itemsize, offset=offset
                )
                out = np.lib.stride_tricks.as_strided(
                    raw.view(dtype),
                    shape=(n, ncomp),
                    strides=(stride, np.dtype(dtype).itemsize),
                ).copy()
        if "sparse" in acc:
            # Sparse accessor overlay (glTF 2.0 §3.6.2.3): substitute
            # `count` elements of the (possibly zero-initialized) base.
            sp = acc["sparse"]
            out = np.array(out)  # writable copy
            si = sp["indices"]
            sbv, sbuf = self._view_buffer(
                si["bufferView"], f"accessor {idx} sparse indices"
            )
            if si["componentType"] not in _COMPONENT_DTYPES:
                raise GltfError(
                    f"accessor {idx}: sparse indices componentType "
                    f"{si['componentType']} unknown"
                )
            sdt = _COMPONENT_DTYPES[si["componentType"]]
            soff = sbv.get("byteOffset", 0) + si.get("byteOffset", 0)
            if soff + sp["count"] * np.dtype(sdt).itemsize > len(sbuf):
                raise GltfError(
                    f"accessor {idx}: sparse indices overrun buffer"
                )
            sidx = np.frombuffer(
                sbuf, sdt, count=sp["count"], offset=soff
            ).astype(np.int64)
            if sp["count"] and (sidx.min() < 0 or sidx.max() >= n):
                raise GltfError(
                    f"accessor {idx}: sparse index "
                    f"{int(sidx.max())} outside accessor count {n}"
                )
            sv = sp["values"]
            vbv, vbuf = self._view_buffer(
                sv["bufferView"], f"accessor {idx} sparse values"
            )
            voff = vbv.get("byteOffset", 0) + sv.get("byteOffset", 0)
            if voff + sp["count"] * itemsize > len(vbuf):
                raise GltfError(
                    f"accessor {idx}: sparse values overrun buffer"
                )
            vals = np.frombuffer(
                vbuf, dtype, count=sp["count"] * ncomp, offset=voff
            ).reshape(sp["count"], ncomp)
            out[sidx] = vals
        if acc.get("normalized") and dtype != np.float32:
            info = np.iinfo(dtype)
            out = out.astype(np.float32) / info.max
        return out

    def image_bytes(self, img_idx: int) -> bytes:
        img = self.doc["images"][img_idx]
        if "bufferView" in img:
            bv, buf = self._view_buffer(
                img["bufferView"], f"image {img_idx}"
            )
            off = bv.get("byteOffset", 0)
            return bytes(buf[off : off + bv["byteLength"]])
        uri = img["uri"]
        if uri.startswith("data:"):
            return base64.b64decode(uri.split(",", 1)[1])
        with open(os.path.join(self.base_dir, uri), "rb") as f:
            return f.read()


def _load_doc(path: str) -> _Gltf:
    base_dir = os.path.dirname(os.path.abspath(path))
    with open(path, "rb") as f:
        head = f.read(4)
        f.seek(0)
        data = f.read()

    if head == b"glTF":  # GLB container
        if len(data) < 12:
            raise GltfError(f"{path}: GLB header truncated ({len(data)} bytes)")
        magic, version, length = struct.unpack_from("<III", data, 0)
        if version != 2:
            raise GltfError(f"{path}: unsupported GLB version {version}")
        if length > len(data):
            raise GltfError(
                f"{path}: GLB header declares {length} bytes but the file "
                f"holds {len(data)} (truncated file)"
            )
        pos = 12
        doc = None
        bin_chunk = b""
        while pos < length:
            if pos + 8 > length:
                raise GltfError(f"{path}: GLB chunk header truncated at {pos}")
            clen, ctype = struct.unpack_from("<II", data, pos)
            if pos + 8 + clen > length:
                raise GltfError(
                    f"{path}: GLB chunk at {pos} declares {clen} bytes but "
                    f"only {length - pos - 8} remain (truncated chunk)"
                )
            chunk = data[pos + 8 : pos + 8 + clen]
            if ctype == 0x4E4F534A:  # JSON
                try:
                    doc = json.loads(chunk)
                except json.JSONDecodeError as e:
                    raise GltfError(f"{path}: GLB JSON chunk invalid: {e}")
            elif ctype == 0x004E4942:  # BIN
                bin_chunk = chunk
            pos += 8 + clen
        if doc is None:
            raise GltfError(f"{path}: GLB file has no JSON chunk")
        buffers = []
        for bidx, b in enumerate(doc.get("buffers", [])):
            if "uri" not in b:
                if b.get("byteLength", 0) > len(bin_chunk):
                    raise GltfError(
                        f"{path}: buffer {bidx} declares byteLength "
                        f"{b['byteLength']} but the BIN chunk holds "
                        f"{len(bin_chunk)} bytes (truncated BIN chunk)"
                    )
                buffers.append(bin_chunk)
            else:
                buffers.append(_load_buffer_uri(b["uri"], base_dir))
        return _Gltf(doc, buffers, base_dir)

    doc = json.loads(data)
    buffers = [
        _load_buffer_uri(b["uri"], base_dir) for b in doc.get("buffers", [])
    ]
    return _Gltf(doc, buffers, base_dir)


def _load_buffer_uri(uri: str, base_dir: str) -> bytes:
    if uri.startswith("data:"):
        return base64.b64decode(uri.split(",", 1)[1])
    with open(os.path.join(base_dir, uri), "rb") as f:
        return f.read()


def _decode_texture(
    g: _Gltf, tex_idx: int, kind: str, channels: Optional[List[int]] = None
) -> np.ndarray:
    """Decode a glTF texture to storage-encoded float32 [H, W, C].

    kind 'srgb': decode sRGB then re-encode gamma-2 (texture.hpp:78-86);
    kind 'noncolor': keep linear 8-bit values as-is.
    """
    from PIL import Image

    tex = g.doc["textures"][tex_idx]
    raw = g.image_bytes(tex["source"])
    img = Image.open(io.BytesIO(raw)).convert("RGBA")
    arr = np.asarray(img, np.uint8).astype(np.float32) / 255.0  # [H, W, 4]
    if channels is not None:
        arr = arr[..., channels]
    if kind == "srgb":
        out = arr.copy()
        out[..., :3] = gamma2_encode_np(srgb_decode_np(arr[..., :3]))
        return out
    return arr


def _node_matrix(node: dict) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float64).reshape(4, 4).T
    m = np.eye(4)
    if "scale" in node:
        m[:3, :3] = np.diag(node["scale"])
    if "rotation" in node:
        x, y, z, w = node["rotation"]
        r = np.asarray(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ]
        )
        m[:3, :3] = r @ m[:3, :3]
    if "translation" in node:
        m[:3, 3] = node["translation"]
    return m


def load(path: str, builder: Optional[SceneBuilder] = None) -> SceneBuilder:
    """Load a .gltf/.glb file into a SceneBuilder (gltf.cpp:319-365)."""
    g = _Gltf.__new__(_Gltf)
    g = _load_doc(path)
    b = builder or SceneBuilder()

    # ---- materials ----
    tex_cache: Dict[tuple, int] = {}

    def cached_texture(kind_stack: str, tex_idx: int, decode_kind: str, channels):
        key = (kind_stack, tex_idx, tuple(channels or ()))
        if key not in tex_cache:
            data = _decode_texture(g, tex_idx, decode_kind, channels)
            tex_cache[key] = b.add_texture(kind_stack, data)
        return tex_cache[key]

    mat_ids = []
    for gm in g.doc.get("materials", [{}]):
        pbr = gm.get("pbrMetallicRoughness", {})
        base = pbr.get("baseColorFactor", [1, 1, 1, 1])
        desc = MaterialDesc(
            base_color=tuple(base),
            metallic=pbr.get("metallicFactor", 1.0),
            roughness=pbr.get("roughnessFactor", 1.0),
        )
        ext = gm.get("extensions", {})

        if "baseColorTexture" in pbr:
            ti = pbr["baseColorTexture"]["index"]
            desc.tex_base = cached_texture("rgba", ti, "srgb", None)
            tex = b.textures_rgba[desc.tex_base]
            desc.has_alpha = bool(np.any(tex[..., 3] < 1.0))
        if "metallicRoughnessTexture" in pbr:
            ti = pbr["metallicRoughnessTexture"]["index"]
            # channels (G, B) = (roughness, metallic) (gltf.cpp:86-88)
            desc.tex_mr = cached_texture("2ch", ti, "noncolor", [1, 2])

        tr = ext.get("KHR_materials_transmission")
        if tr:
            desc.transmission = tr.get("transmissionFactor", 0.0)
            if "transmissionTexture" in tr:
                desc.tex_transmission = cached_texture(
                    "mono", tr["transmissionTexture"]["index"], "noncolor", [0]
                )
        desc.thin = True  # gltf.cpp:104-105

        desc.ior = ext.get("KHR_materials_ior", {}).get("ior", 1.5)

        an = ext.get("KHR_materials_anisotropy")
        if an:
            desc.anisotropic = an.get("anisotropyStrength", 0.0)
            desc.aniso_rotation = an.get("anisotropyRotation", 0.0)

        cc = ext.get("KHR_materials_clearcoat")
        desc.cc_roughness = 0.03  # default (gltf.cpp:116)
        if cc:
            desc.clearcoat = cc.get("clearcoatFactor", 0.0)
            desc.cc_roughness = cc.get("clearcoatRoughnessFactor", 0.0)

        em = gm.get("emissiveFactor", [0, 0, 0])
        strength = ext.get("KHR_materials_emissive_strength", {}).get(
            "emissiveStrength", 1.0
        )
        desc.emission = tuple(em)
        desc.emission_strength = strength
        if "emissiveTexture" in gm:
            desc.tex_emission = cached_texture(
                "rgb", gm["emissiveTexture"]["index"], "srgb", [0, 1, 2]
            )

        if "normalTexture" in gm:
            desc.tex_normal = cached_texture(
                "rgb", gm["normalTexture"]["index"], "noncolor", [0, 1, 2]
            )
            desc.normal_scale = gm["normalTexture"].get("scale", 1.0)

        vol = ext.get("KHR_materials_volume")
        if vol:
            desc.volume_color = tuple(vol.get("attenuationColor", [1, 1, 1]))
            att_dist = vol.get("attenuationDistance", float("inf"))
            desc.volume_density = 1.0 / att_dist if att_dist > 0 else 0.0
            if desc.volume_density > 0.0:
                # Beer-Lambert attenuation accrues over interior path
                # length, which thin transmission never has: a volume
                # implies solid transmission (the reference hardcodes
                # thinTransmission=true for ALL gltf materials,
                # gltf.cpp:104-105, which silently disables its own
                # KHR_volume import — deliberate divergence).
                desc.thin = False

        mat_ids.append(b.add_material_desc(desc))

    if not g.doc.get("materials"):
        mat_ids = [b.add_material()]

    # ---- meshes: concat primitives (gltf.cpp:178-270) ----
    meshes = []
    for gmesh in g.doc.get("meshes", []):
        prims = []
        for prim in gmesh.get("primitives", []):
            mode = prim.get("mode", 4)
            if mode not in (4, 5, 6):
                # POINTS/LINES/LINE_LOOP/LINE_STRIP carry no renderable
                # area — warn LOUDLY instead of silently dropping
                # (the reference's fastgltf path would also skip these).
                import warnings

                warnings.warn(
                    f"gltf: skipping primitive with non-triangle mode "
                    f"{mode} (points/lines are not renderable geometry)"
                )
                continue
            attrs = prim["attributes"]
            if "TEXCOORD_1" in attrs:
                import warnings

                warnings.warn(
                    "gltf: TEXCOORD_1 present but only TEXCOORD_0 is "
                    "sampled (matches the reference, gltf.cpp:238-246)"
                )
            pos = g.accessor(attrs["POSITION"]).astype(np.float32)
            nrm = (
                g.accessor(attrs["NORMAL"]).astype(np.float32)
                if "NORMAL" in attrs
                else None
            )
            uv = (
                g.accessor(attrs["TEXCOORD_0"]).astype(np.float32)
                if "TEXCOORD_0" in attrs
                else None
            )
            tan = (
                g.accessor(attrs["TANGENT"]).astype(np.float32)
                if "TANGENT" in attrs
                else None
            )
            if "indices" in prim:
                seq = g.accessor(prim["indices"]).reshape(-1).astype(np.int64)
                if seq.size and (seq.min() < 0 or seq.max() >= pos.shape[0]):
                    raise GltfError(
                        f"primitive index {int(seq.max())} out of range for "
                        f"{pos.shape[0]} vertices (corrupt index buffer)"
                    )
            else:
                seq = np.arange(pos.shape[0], dtype=np.int64)
            if mode == 4:  # TRIANGLES
                if seq.shape[0] % 3:
                    raise GltfError(
                        f"TRIANGLES primitive has {seq.shape[0]} indices "
                        f"(not a multiple of 3)"
                    )
                idx = seq.reshape(-1, 3)
            elif mode == 5:  # TRIANGLE_STRIP: (i, i+1, i+2), winding
                # alternates so odd triangles swap the first two indices
                n_t = seq.shape[0] - 2
                tri = np.stack([seq[:-2], seq[1:-1], seq[2:]], axis=1)
                odd = np.arange(n_t) % 2 == 1
                tri[odd] = tri[odd][:, [1, 0, 2]]
                idx = tri
            else:  # TRIANGLE_FAN: (0, i+1, i+2)
                idx = np.stack(
                    [
                        np.full(seq.shape[0] - 2, seq[0], np.int64),
                        seq[1:-1],
                        seq[2:],
                    ],
                    axis=1,
                )
            mat = mat_ids[prim.get("material", 0)] if mat_ids else 0
            prims.append((pos, nrm, uv, tan, idx, mat))
        meshes.append(prims)

    # ---- node tree with TRS transforms (gltf.cpp:272-317) ----
    nodes = g.doc.get("nodes", [])
    scene_desc = g.doc.get("scenes", [{}])[g.doc.get("scene", 0)]

    # Meshes referenced by MORE than one node become instanced prototypes
    # (the reference shares one Mesh across Nodes, scene.hpp:48-66; baking
    # would duplicate the heavy per-tri data per reference). Mirrored node
    # transforms (negative determinant) fall back to baking.
    mesh_refs: dict[int, int] = {}

    def count(node_idx: int):
        node = nodes[node_idx]
        if "mesh" in node:
            mesh_refs[node["mesh"]] = mesh_refs.get(node["mesh"], 0) + 1
        for child in node.get("children", []):
            count(child)

    for root in scene_desc.get("nodes", range(len(nodes))):
        count(root)
    proto_ids: dict[int, list] = {}

    def visit(node_idx: int, parent: np.ndarray):
        node = nodes[node_idx]
        m = parent @ _node_matrix(node)
        if "mesh" in node:
            gm = node["mesh"]
            shared = (
                mesh_refs.get(gm, 0) > 1
                and np.linalg.det(m[:3, :3]) > 0
            )
            if shared:
                if gm not in proto_ids:
                    proto_ids[gm] = [
                        b.add_prototype(
                            pos, idx, mat, normals=nrm, uvs=uv, tangents=tan
                        )
                        for pos, nrm, uv, tan, idx, mat in meshes[gm]
                    ]
                for pid in proto_ids[gm]:
                    b.add_instance(pid, m)
            else:
                for pos, nrm, uv, tan, idx, mat in meshes[gm]:
                    b.add_mesh(
                        pos, idx, mat, normals=nrm, uvs=uv, tangents=tan,
                        transform=m,
                    )
        for child in node.get("children", []):
            visit(child, m)

    for root in scene_desc.get("nodes", range(len(nodes))):
        visit(root, np.eye(4))

    return b
