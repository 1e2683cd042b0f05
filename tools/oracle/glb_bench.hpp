// benchglb: render a GLB scene (written by yart_tpu's io/glb_export.py)
// with the REFERENCE's own scene/material/integrator stack and report
// full-MIS Mrays/s — the reference-on-this-host comparator for the
// flagship (atrium) wave metric in BENCH_DETAIL.json.
//
// The reference's production loader is fastgltf-based
// (/root/reference/src/gltf/gltf.cpp:319-337); fastgltf is an external
// CMake dependency that is not vendored here and cannot be fetched
// (no network), so this harness parses the GLB container itself — a
// deliberately small reader for the exporter's restricted layout
// (single buffer, f32 VEC3/VEC2 attributes, u32 indices, embedded PNG)
// — and then builds the exact same reference objects the gltf loader
// would: SDRTexture pools via loadTexture<> (sRGB re-encode for base
// color, channels {G,B} for metallic-roughness, gltf.cpp:19-60),
// ParametricBSDF with the material mapping of gltf.cpp:62-176
// (thinTransmission hardcoded true, :104-105), one Mesh, emissive
// faces registered as AreaLights (:299-314). All geometry is merged
// into ONE Mesh/SahBVH: our GLB stores world-space geometry with
// identity nodes, and a single global SAH tree is FASTER for the
// reference than its per-node AABB + per-mesh BVH walk — the
// comparison errs in the reference's favor.
//
// Harness code is original (validation-only, never shipped).
#ifndef GLB_BENCH_HPP
#define GLB_BENCH_HPP

#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

namespace glbb {

// ----- minimal JSON (parses exactly the GLB JSON chunk we produce) -----
struct JVal {
  enum Kind { NUL, BOOL, NUM, STR, ARR, OBJ } kind = NUL;
  bool b = false;
  double num = 0;
  std::string str;
  std::vector<JVal> arr;
  std::vector<std::pair<std::string, JVal>> obj;

  const JVal* find(const std::string& k) const {
    for (auto& kv : obj)
      if (kv.first == k) return &kv.second;
    return nullptr;
  }
  const JVal& at(const std::string& k) const {
    const JVal* v = find(k);
    if (!v) { fprintf(stderr, "json: missing key %s\n", k.c_str()); exit(2); }
    return *v;
  }
  double numOr(const std::string& k, double d) const {
    const JVal* v = find(k);
    return v ? v->num : d;
  }
  int i(size_t idx = SIZE_MAX) const {
    return int(idx == SIZE_MAX ? num : arr[idx].num);
  }
};

struct JParser {
  const char* p;
  const char* end;
  void ws() { while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) p++; }
  JVal parse() {
    ws();
    JVal v;
    if (p >= end) return v;
    char c = *p;
    if (c == '{') {
      v.kind = JVal::OBJ; p++;
      ws();
      if (*p == '}') { p++; return v; }
      for (;;) {
        ws();
        JVal key = parse();  // string
        ws(); p++;           // ':'
        v.obj.emplace_back(key.str, parse());
        ws();
        if (*p == ',') { p++; continue; }
        p++;  // '}'
        return v;
      }
    }
    if (c == '[') {
      v.kind = JVal::ARR; p++;
      ws();
      if (*p == ']') { p++; return v; }
      for (;;) {
        v.arr.push_back(parse());
        ws();
        if (*p == ',') { p++; continue; }
        p++;  // ']'
        return v;
      }
    }
    if (c == '"') {
      v.kind = JVal::STR; p++;
      while (p < end && *p != '"') {
        if (*p == '\\' && p + 1 < end) {
          p++;
          char e = *p++;
          switch (e) {
            case 'n': v.str += '\n'; break;
            case 't': v.str += '\t'; break;
            case 'u': p += 4; v.str += '?'; break;  // not produced by exporter
            default: v.str += e;
          }
        } else {
          v.str += *p++;
        }
      }
      p++;
      return v;
    }
    if (c == 't') { v.kind = JVal::BOOL; v.b = true; p += 4; return v; }
    if (c == 'f') { v.kind = JVal::BOOL; v.b = false; p += 5; return v; }
    if (c == 'n') { p += 4; return v; }
    v.kind = JVal::NUM;
    char* q;
    v.num = strtod(p, &q);
    p = q;
    return v;
  }
};

struct Glb {
  JVal doc;
  std::vector<uint8_t> bin;
  std::vector<uint8_t> file;

  bool load(const char* path) {
    std::ifstream f(path, std::ios::binary);
    if (!f) return false;
    file.assign(std::istreambuf_iterator<char>(f), {});
    if (file.size() < 20 || memcmp(file.data(), "glTF", 4) != 0) return false;
    size_t pos = 12;
    const char* json = nullptr;
    size_t jlen = 0;
    while (pos + 8 <= file.size()) {
      uint32_t clen, ctype;
      memcpy(&clen, &file[pos], 4);
      memcpy(&ctype, &file[pos + 4], 4);
      pos += 8;
      if (ctype == 0x4E4F534A) { json = (const char*)&file[pos]; jlen = clen; }
      if (ctype == 0x004E4942) bin.assign(&file[pos], &file[pos] + clen);
      pos += clen;
    }
    if (!json) return false;
    JParser jp{json, json + jlen};
    doc = jp.parse();
    return true;
  }

  // accessor -> (ptr into bin, count); restricted to the exporter's types
  const uint8_t* accessor(int idx, int expectComp, const char* expectType,
                          uint32_t* count) const {
    const JVal& a = doc.at("accessors").arr[idx];
    if (int(a.at("componentType").num) != expectComp ||
        a.at("type").str != expectType) {
      fprintf(stderr, "accessor %d: unexpected type\n", idx);
      exit(2);
    }
    const JVal& bv = doc.at("bufferViews").arr[int(a.at("bufferView").num)];
    size_t off = size_t(bv.numOr("byteOffset", 0)) +
                 size_t(a.numOr("byteOffset", 0));
    *count = uint32_t(a.at("count").num);
    return bin.data() + off;
  }

  const uint8_t* imageBytes(int imgIdx, int32_t* len) const {
    const JVal& img = doc.at("images").arr[imgIdx];
    const JVal& bv = doc.at("bufferViews").arr[int(img.at("bufferView").num)];
    *len = int32_t(bv.at("byteLength").num);
    return bin.data() + size_t(bv.numOr("byteOffset", 0));
  }
};

}  // namespace glbb

#endif
