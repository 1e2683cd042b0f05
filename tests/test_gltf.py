"""GLTF/GLB loader tests against synthetic assets."""

import base64
import json
import struct

import numpy as np
import pytest

from yart_tpu.scene.gltf import load


def _build_glb(tmp_path, with_texture=False):
    """Two-triangle quad with a red emissive material + a glass material."""
    positions = np.asarray(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    normals = np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1))
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    indices = np.asarray([0, 1, 2, 0, 2, 3], np.uint16)

    bin_parts = [positions.tobytes(), normals.tobytes(), uvs.tobytes(),
                 indices.tobytes()]
    offsets = []
    off = 0
    for p in bin_parts:
        offsets.append(off)
        off += len(p)
        off = (off + 3) & ~3
    bin_blob = b""
    for p, o in zip(bin_parts, offsets):
        bin_blob += b"\x00" * (o - len(bin_blob)) + p

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {"mesh": 0, "translation": [1.0, 2.0, 3.0], "scale": [2.0, 2.0, 2.0]}
        ],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                        "indices": 3,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {
                "pbrMetallicRoughness": {
                    "baseColorFactor": [0.8, 0.1, 0.1, 1.0],
                    "metallicFactor": 0.0,
                    "roughnessFactor": 0.4,
                },
                "emissiveFactor": [1.0, 0.5, 0.25],
                "extensions": {
                    "KHR_materials_emissive_strength": {"emissiveStrength": 4.0},
                    "KHR_materials_ior": {"ior": 1.33},
                    "KHR_materials_transmission": {"transmissionFactor": 0.5},
                    "KHR_materials_clearcoat": {
                        "clearcoatFactor": 0.7,
                        "clearcoatRoughnessFactor": 0.2,
                    },
                    "KHR_materials_volume": {
                        "attenuationColor": [0.9, 0.8, 0.7],
                        "attenuationDistance": 2.0,
                    },
                    "KHR_materials_anisotropy": {
                        "anisotropyStrength": 0.6,
                        "anisotropyRotation": 0.9,
                    },
                },
            }
        ],
        "buffers": [{"byteLength": len(bin_blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": offsets[0], "byteLength": 48},
            {"buffer": 0, "byteOffset": offsets[1], "byteLength": 48},
            {"buffer": 0, "byteOffset": offsets[2], "byteLength": 32},
            {"buffer": 0, "byteOffset": offsets[3], "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
    }

    js = json.dumps(doc).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    pad_bin = bin_blob + b"\x00" * ((4 - len(bin_blob) % 4) % 4)
    glb = (
        struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js) + 8 + len(pad_bin))
        + struct.pack("<II", len(js), 0x4E4F534A)
        + js
        + struct.pack("<II", len(pad_bin), 0x004E4942)
        + pad_bin
    )
    path = tmp_path / "test.glb"
    path.write_bytes(glb)
    return str(path)


def test_glb_load(tmp_path):
    path = _build_glb(tmp_path)
    b = load(path)
    scene, meta = b.compile()

    assert meta.n_tris == 2
    assert meta.n_materials == 1
    # Emissive material -> both triangles registered as area lights
    assert meta.n_lights == 2

    # Node transform applied: scale 2 then translate (1,2,3)
    pos = np.asarray(scene.positions)
    np.testing.assert_allclose(pos.min(axis=0), [1, 2, 3], atol=1e-5)
    np.testing.assert_allclose(pos.max(axis=0), [3, 4, 3], atol=1e-5)

    m = scene.materials
    np.testing.assert_allclose(
        np.asarray(m.base_color[0])[:3], [0.8, 0.1, 0.1], atol=1e-6
    )
    np.testing.assert_allclose(float(m.roughness[0]), 0.4, atol=1e-6)
    np.testing.assert_allclose(float(m.ior[0]), 1.33, atol=1e-6)
    np.testing.assert_allclose(float(m.transmission[0]), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(m.clearcoat[0]), 0.7, atol=1e-6)
    np.testing.assert_allclose(float(m.cc_roughness[0]), 0.2, atol=1e-6)
    # emissive x strength
    np.testing.assert_allclose(
        np.asarray(m.emission[0]), [4.0, 2.0, 1.0], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m.volume_color[0]), [0.9, 0.8, 0.7], atol=1e-6
    )
    np.testing.assert_allclose(float(m.volume_density[0]), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(m.anisotropic[0]), 0.6, atol=1e-6)
    # radians, passed through unconverted (gltf.cpp:108-113)
    np.testing.assert_allclose(float(m.aniso_rotation[0]), 0.9, atol=1e-6)
    # Deliberate divergence (round 4): the reference hardcodes
    # thinTransmission=true for ALL gltf materials (gltf.cpp:104-105),
    # which silently disables its own KHR_materials_volume import —
    # Beer-Lambert attenuation needs interior path length that thin
    # transmission never has. This material HAS a volume ext, so the
    # loader makes it solid; volume-free materials stay thin.
    assert not bool(m.thin[0])

    # Light power: area of 2x2 quad = 4, split into 2 tris of 2 each;
    # power = |Le| * A * pi (light.cpp:36-38)
    expected = np.linalg.norm([4.0, 2.0, 1.0]) * 2.0 * np.pi
    np.testing.assert_allclose(
        np.asarray(scene.light_power), [expected, expected], rtol=1e-5
    )


def test_glb_shared_mesh_instanced(tmp_path):
    """A mesh referenced by multiple nodes compiles as one prototype with
    per-node instances (gltf shares meshes across nodes; baking would
    duplicate the per-tri data)."""
    path = _build_glb(tmp_path)
    import json as _json
    import struct as _struct

    raw = open(path, "rb").read()
    js_len = _struct.unpack("<I", raw[12:16])[0]
    doc = _json.loads(raw[20 : 20 + js_len])
    doc["nodes"] = [
        {"mesh": 0, "translation": [0.0, 0.0, 0.0]},
        {"mesh": 0, "translation": [3.0, 0.0, 0.0]},
        {"mesh": 0, "translation": [0.0, 3.0, 0.0], "scale": [2, 2, 2]},
    ]
    doc["scenes"] = [{"nodes": [0, 1, 2]}]
    js = _json.dumps(doc).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    rest = raw[20 + js_len:]
    glb = (
        _struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js) + len(rest))
        + _struct.pack("<II", len(js), 0x4E4F534A)
        + js
        + rest
    )
    p2 = tmp_path / "shared.glb"
    p2.write_bytes(glb)

    b = load(str(p2))
    scene, meta = b.compile()
    assert meta.n_instances == 3
    assert len(scene.protos) == 1  # ONE prototype shared by all nodes
    assert meta.n_tris == 3 * meta.proto_metas[0].n_tris
    # The emissive material registers lights per instance.
    assert meta.n_lights == 3 * meta.proto_metas[0].n_tris


# ---- round-4 torture tests: strips/fans, sparse accessors, interleaved
# byteStride, TEXCOORD_1 / non-triangle warnings --------------------------

def _write_glb(tmp_path, doc, bin_blob, name="t.glb"):
    js = json.dumps(doc).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    pad_bin = bin_blob + b"\x00" * ((4 - len(bin_blob) % 4) % 4)
    glb = (
        struct.pack("<III", 0x46546C67, 2,
                    12 + 8 + len(js) + 8 + len(pad_bin))
        + struct.pack("<II", len(js), 0x4E4F534A) + js
        + struct.pack("<II", len(pad_bin), 0x004E4942) + pad_bin
    )
    path = tmp_path / name
    path.write_bytes(glb)
    return str(path)


def _quad_doc(positions, extra_prims, accessors, bin_blob, views):
    return {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": extra_prims}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [1, 1, 1, 1], "metallicFactor": 0.0,
            "roughnessFactor": 0.5}}],
        "buffers": [{"byteLength": len(bin_blob)}],
        "bufferViews": views,
        "accessors": accessors,
    }


def test_triangle_strip_and_fan(tmp_path):
    """mode 5 (STRIP) and mode 6 (FAN) triangulate instead of dropping.
    A 4-vertex strip/fan of the unit quad must produce the same 2
    triangles (up to winding parity handled per spec)."""
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                     np.float32)
    bin_blob = pos.tobytes()
    views = [{"buffer": 0, "byteOffset": 0, "byteLength": 48}]
    accessors = [
        {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
    ]
    # strip over vertex sequence 0,1,2,3
    doc = _quad_doc(pos, [{"attributes": {"POSITION": 0}, "mode": 5,
                           "material": 0}], accessors, bin_blob, views)
    b = load(_write_glb(tmp_path, doc, bin_blob, "strip.glb"))
    tris = np.concatenate(b._tris)
    assert tris.shape == (2, 3)
    # winding of the odd triangle is flipped per spec: (0,1,2), (2,1,3)
    np.testing.assert_array_equal(tris, [[0, 1, 2], [2, 1, 3]])

    # fan over 0,1,3,2 -> (0,1,3), (0,3,2)
    fan = np.asarray([0, 1, 3, 2], np.uint16)
    bin2 = pos.tobytes() + fan.tobytes()
    views2 = views + [{"buffer": 0, "byteOffset": 48, "byteLength": 8}]
    acc2 = accessors + [
        {"bufferView": 1, "componentType": 5123, "count": 4,
         "type": "SCALAR"},
    ]
    doc = _quad_doc(pos, [{"attributes": {"POSITION": 0}, "indices": 1,
                           "mode": 6, "material": 0}], acc2, bin2, views2)
    b = load(_write_glb(tmp_path, doc, bin2, "fan.glb"))
    tris = np.concatenate(b._tris)
    np.testing.assert_array_equal(tris, [[0, 1, 3], [0, 3, 2]])


def test_points_lines_warn_and_skip(tmp_path):
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    bin_blob = pos.tobytes()
    views = [{"buffer": 0, "byteOffset": 0, "byteLength": 36}]
    accessors = [
        {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
    ]
    doc = _quad_doc(pos, [
        {"attributes": {"POSITION": 0}, "mode": 0, "material": 0},
        {"attributes": {"POSITION": 0}, "mode": 4, "material": 0},
    ], accessors, bin_blob, views)
    with pytest.warns(UserWarning, match="non-triangle mode 0"):
        b = load(_write_glb(tmp_path, doc, bin_blob))
    assert np.concatenate(b._tris).shape == (1, 3)  # triangle prim kept


def test_texcoord1_warns(tmp_path):
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    uv = np.zeros((3, 2), np.float32)
    bin_blob = pos.tobytes() + uv.tobytes() + uv.tobytes()
    views = [
        {"buffer": 0, "byteOffset": 0, "byteLength": 36},
        {"buffer": 0, "byteOffset": 36, "byteLength": 24},
        {"buffer": 0, "byteOffset": 60, "byteLength": 24},
    ]
    accessors = [
        {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
        {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC2"},
        {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC2"},
    ]
    doc = _quad_doc(pos, [{"attributes": {
        "POSITION": 0, "TEXCOORD_0": 1, "TEXCOORD_1": 2}, "material": 0,
    }], accessors, bin_blob, views)
    with pytest.warns(UserWarning, match="TEXCOORD_1"):
        load(_write_glb(tmp_path, doc, bin_blob))


def test_sparse_accessor(tmp_path):
    """Sparse POSITION overlay (glTF 2.0 §3.6.2.3): base accessor with two
    vertices displaced through sparse indices/values."""
    pos = np.zeros((4, 3), np.float32)
    sparse_vals = np.asarray([[1, 0, 0], [0, 1, 0]], np.float32)
    sparse_idx = np.asarray([1, 2], np.uint16)
    idx = np.asarray([0, 1, 2, 1, 3, 2], np.uint16)
    bin_blob = (pos.tobytes() + sparse_vals.tobytes() + sparse_idx.tobytes()
                + idx.tobytes())
    views = [
        {"buffer": 0, "byteOffset": 0, "byteLength": 48},
        {"buffer": 0, "byteOffset": 48, "byteLength": 24},
        {"buffer": 0, "byteOffset": 72, "byteLength": 4},
        {"buffer": 0, "byteOffset": 76, "byteLength": 12},
    ]
    accessors = [
        {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3",
         "sparse": {
             "count": 2,
             "indices": {"bufferView": 2, "componentType": 5123},
             "values": {"bufferView": 1},
         }},
        {"bufferView": 3, "componentType": 5123, "count": 6,
         "type": "SCALAR"},
    ]
    doc = _quad_doc(pos, [{"attributes": {"POSITION": 0}, "indices": 1,
                           "material": 0}], accessors, bin_blob, views)
    b = load(_write_glb(tmp_path, doc, bin_blob))
    p = np.concatenate(b._positions)
    np.testing.assert_array_equal(p[1], [1, 0, 0])
    np.testing.assert_array_equal(p[2], [0, 1, 0])
    np.testing.assert_array_equal(p[0], [0, 0, 0])


def test_interleaved_bytestride(tmp_path):
    """Interleaved vertex buffer: POSITION+NORMAL share one bufferView
    with byteStride 24."""
    inter = np.zeros((3, 6), np.float32)
    inter[:, :3] = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    inter[:, 3:] = [0, 0, 1]
    bin_blob = inter.tobytes()
    views = [{"buffer": 0, "byteOffset": 0, "byteLength": 72,
              "byteStride": 24}]
    accessors = [
        {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
         "count": 3, "type": "VEC3"},
        {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
         "count": 3, "type": "VEC3"},
    ]
    doc = _quad_doc(inter, [{"attributes": {"POSITION": 0, "NORMAL": 1},
                             "material": 0}], accessors, bin_blob, views)
    b = load(_write_glb(tmp_path, doc, bin_blob))
    np.testing.assert_array_equal(
        np.concatenate(b._positions),
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
    )
    np.testing.assert_array_equal(
        np.concatenate(b._normals), np.tile([[0, 0, 1]], (3, 1))
    )


# ---- round-5 malformed-input matrix: every structural defect must raise
# a clear GltfError, never emit garbage geometry (fastgltf's validation
# role in the reference, src/gltf/gltf.cpp:323-337) ----------------------

from yart_tpu.scene.gltf import GltfError  # noqa: E402


def _tri_doc_bin():
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.asarray([0, 1, 2], np.uint16)
    bin_blob = pos.tobytes() + idx.tobytes()
    views = [
        {"buffer": 0, "byteOffset": 0, "byteLength": 36},
        {"buffer": 0, "byteOffset": 36, "byteLength": 6},
    ]
    accessors = [
        {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
        {"bufferView": 1, "componentType": 5123, "count": 3,
         "type": "SCALAR"},
    ]
    doc = _quad_doc(pos, [{"attributes": {"POSITION": 0}, "indices": 1,
                           "material": 0}], accessors, bin_blob, views)
    return doc, bin_blob


def test_malformed_truncated_bin_chunk(tmp_path):
    doc, bin_blob = _tri_doc_bin()
    path = _write_glb(tmp_path, doc, bin_blob, "good.glb")
    data = open(path, "rb").read()
    # Chop 16 bytes off the file; the GLB length header now overruns.
    bad = tmp_path / "trunc.glb"
    bad.write_bytes(data[:-16])
    with pytest.raises(GltfError, match="truncated"):
        load(str(bad))


def test_malformed_bin_shorter_than_declared(tmp_path):
    doc, bin_blob = _tri_doc_bin()
    # Keep the GLB container consistent but declare a bigger buffer than
    # the BIN chunk provides.
    doc["buffers"][0]["byteLength"] = len(bin_blob) + 1000
    with pytest.raises(GltfError, match="BIN chunk"):
        load(_write_glb(tmp_path, doc, bin_blob, "short.glb"))


def test_malformed_accessor_count_overrun(tmp_path):
    doc, bin_blob = _tri_doc_bin()
    doc["accessors"][0]["count"] = 10_000  # 3 vertices exist
    doc["bufferViews"][0]["byteLength"] = len(bin_blob)
    with pytest.raises(GltfError, match="overrun|needs"):
        load(_write_glb(tmp_path, doc, bin_blob, "count.glb"))


def test_malformed_accessor_byteoffset_overrun(tmp_path):
    doc, bin_blob = _tri_doc_bin()
    doc["accessors"][0]["byteOffset"] = 1 << 20
    with pytest.raises(GltfError, match="overrun|needs"):
        load(_write_glb(tmp_path, doc, bin_blob, "off.glb"))


def test_malformed_bufferview_overrun(tmp_path):
    doc, bin_blob = _tri_doc_bin()
    doc["bufferViews"][0]["byteLength"] = len(bin_blob) + 512
    with pytest.raises(GltfError, match="truncated|spans"):
        load(_write_glb(tmp_path, doc, bin_blob, "view.glb"))


def test_malformed_unknown_component_type(tmp_path):
    doc, bin_blob = _tri_doc_bin()
    doc["accessors"][1]["componentType"] = 5130  # not a spec value
    with pytest.raises(GltfError, match="componentType"):
        load(_write_glb(tmp_path, doc, bin_blob, "ctype.glb"))


def test_malformed_missing_buffer(tmp_path):
    doc, bin_blob = _tri_doc_bin()
    doc["bufferViews"][0]["buffer"] = 3  # only buffer 0 exists
    with pytest.raises(GltfError, match="buffer"):
        load(_write_glb(tmp_path, doc, bin_blob, "nobuf.glb"))


def test_malformed_accessor_index_out_of_range(tmp_path):
    doc, bin_blob = _tri_doc_bin()
    doc["meshes"][0]["primitives"][0]["attributes"]["POSITION"] = 42
    with pytest.raises(GltfError, match="accessor 42"):
        load(_write_glb(tmp_path, doc, bin_blob, "acc.glb"))


def test_malformed_vertex_index_out_of_range(tmp_path):
    doc, bin_blob = _tri_doc_bin()
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.asarray([0, 1, 9], np.uint16)  # vertex 9 of 3
    blob = pos.tobytes() + idx.tobytes()
    with pytest.raises(GltfError, match="out of range"):
        load(_write_glb(tmp_path, doc, blob, "vidx.glb"))


def test_malformed_nontriple_indices(tmp_path):
    doc, bin_blob = _tri_doc_bin()
    doc["accessors"][1]["count"] = 2  # 2 indices can't form triangles
    with pytest.raises(GltfError, match="multiple of 3"):
        load(_write_glb(tmp_path, doc, bin_blob, "n3.glb"))


def test_malformed_no_json_chunk(tmp_path):
    bad = tmp_path / "nojson.glb"
    bin_blob = b"\x00" * 8
    glb = (struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(bin_blob))
           + struct.pack("<II", len(bin_blob), 0x004E4942) + bin_blob)
    bad.write_bytes(glb)
    with pytest.raises(GltfError, match="JSON"):
        load(str(bad))


def test_malformed_bad_glb_version(tmp_path):
    doc, bin_blob = _tri_doc_bin()
    path = _write_glb(tmp_path, doc, bin_blob, "v9.glb")
    data = bytearray(open(path, "rb").read())
    struct.pack_into("<I", data, 4, 9)  # version 9
    bad = tmp_path / "ver.glb"
    bad.write_bytes(bytes(data))
    with pytest.raises(GltfError, match="version"):
        load(str(bad))


def test_malformed_sparse_index_overrun(tmp_path):
    doc, bin_blob = _tri_doc_bin()
    sidx = np.asarray([7], np.uint16)  # accessor count is 3
    sval = np.asarray([[9, 9, 9]], np.float32)
    blob = bin_blob + sidx.tobytes() + b"\x00\x00" + sval.tobytes()
    doc["bufferViews"] += [
        {"buffer": 0, "byteOffset": len(bin_blob), "byteLength": 2},
        {"buffer": 0, "byteOffset": len(bin_blob) + 4, "byteLength": 12},
    ]
    doc["buffers"][0]["byteLength"] = len(blob)
    doc["accessors"][0]["sparse"] = {
        "count": 1,
        "indices": {"bufferView": 2, "componentType": 5123},
        "values": {"bufferView": 3},
    }
    with pytest.raises(GltfError, match="sparse"):
        load(_write_glb(tmp_path, doc, blob, "sparse.glb"))
