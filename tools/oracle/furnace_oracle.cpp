// Headless oracle harness over (patched-copy of) the read-only reference
// sources — validation only; never shipped.
#include <core/core.hpp>
#include <bsdf/parametric.hpp>
#include <cpu/mis-integrator.hpp>
#include <cpu/naive-integrator.hpp>
#include <atomic>
#include <chrono>
#include <cmath>
#include <iostream>
#include <memory>
#include <string>
#include <thread>
#include <vector>

using namespace yart;

static void addQuad(std::vector<math::float3>& verts,
                    std::vector<VertexData>& vdata, std::vector<Face>& faces,
                    math::float3 p0, math::float3 p1, math::float3 p2,
                    math::float3 p3, uint32_t mat) {
  using namespace math;
  float3 n = normalized(cross(p1 - p0, p2 - p0));
  uint32_t k = verts.size();
  for (const float3& p : {p0, p1, p2, p3}) {
    verts.push_back(p);
    vdata.push_back({n, float4(1, 0, 0, 1), float2(0, 0)});
  }
  faces.push_back({k, k + 1, k + 2, mat});
  faces.push_back({k, k + 2, k + 3, mat});
}

// Dump the full HDR buffer as text: "W H" then W*H lines of "r g b"
// (row-major, y then x) — consumed by tools/oracle/make_goldens.py.
static void dumpBuffer(const Buffer& buffer, const std::string& path,
                       uint32_t w, uint32_t h) {
  FILE* f = fopen(path.c_str(), "w");
  if (!f) return;
  fprintf(f, "%u %u\n", w, h);
  for (uint32_t y = 0; y < h; y++)
    for (uint32_t x = 0; x < w; x++) {
      auto px = buffer(x, y);
      fprintf(f, "%.9g %.9g %.9g\n", px.x(), px.y(), px.z());
    }
  fclose(f);
}

// exact f32 vertices of yart_tpu procedural.box_mesh (generated)
static const float kTallBox[24][3] = {
  {-5.149540901e-01f, 0.000000000e+00f, -3.728580475e-02f},
  {-3.728580475e-02f, 0.000000000e+00f, -1.850459278e-01f},
  {-3.728580475e-02f, 2.400000095e+00f, -1.850459278e-01f},
  {-5.149540901e-01f, 2.400000095e+00f, -3.728580475e-02f},
  {-1.850459278e-01f, 0.000000000e+00f, -6.627141833e-01f},
  {-6.627141833e-01f, 0.000000000e+00f, -5.149540901e-01f},
  {-6.627141833e-01f, 2.400000095e+00f, -5.149540901e-01f},
  {-1.850459278e-01f, 2.400000095e+00f, -6.627141833e-01f},
  {-3.728580475e-02f, 0.000000000e+00f, -1.850459278e-01f},
  {-1.850459278e-01f, 0.000000000e+00f, -6.627141833e-01f},
  {-1.850459278e-01f, 2.400000095e+00f, -6.627141833e-01f},
  {-3.728580475e-02f, 2.400000095e+00f, -1.850459278e-01f},
  {-6.627141833e-01f, 0.000000000e+00f, -5.149540901e-01f},
  {-5.149540901e-01f, 0.000000000e+00f, -3.728580475e-02f},
  {-5.149540901e-01f, 2.400000095e+00f, -3.728580475e-02f},
  {-6.627141833e-01f, 2.400000095e+00f, -5.149540901e-01f},
  {-5.149540901e-01f, 2.400000095e+00f, -3.728580475e-02f},
  {-3.728580475e-02f, 2.400000095e+00f, -1.850459278e-01f},
  {-1.850459278e-01f, 2.400000095e+00f, -6.627141833e-01f},
  {-6.627141833e-01f, 2.400000095e+00f, -5.149540901e-01f},
  {-6.627141833e-01f, 0.000000000e+00f, -5.149540901e-01f},
  {-1.850459278e-01f, 0.000000000e+00f, -6.627141833e-01f},
  {-3.728580475e-02f, 0.000000000e+00f, -1.850459278e-01f},
  {-5.149540901e-01f, 0.000000000e+00f, -3.728580475e-02f},
};
static const float kShortBox[24][3] = {
  {9.592092037e-02f, 0.000000000e+00f, 5.303770900e-01f},
  {5.803771019e-01f, 0.000000000e+00f, 6.540790796e-01f},
  {5.803771019e-01f, 1.000000000e+00f, 6.540790796e-01f},
  {9.592092037e-02f, 1.000000000e+00f, 5.303770900e-01f},
  {7.040790915e-01f, 0.000000000e+00f, 1.696228832e-01f},
  {2.196228951e-01f, 0.000000000e+00f, 4.592090845e-02f},
  {2.196228951e-01f, 1.000000000e+00f, 4.592090845e-02f},
  {7.040790915e-01f, 1.000000000e+00f, 1.696228832e-01f},
  {5.803771019e-01f, 0.000000000e+00f, 6.540790796e-01f},
  {7.040790915e-01f, 0.000000000e+00f, 1.696228832e-01f},
  {7.040790915e-01f, 1.000000000e+00f, 1.696228832e-01f},
  {5.803771019e-01f, 1.000000000e+00f, 6.540790796e-01f},
  {2.196228951e-01f, 0.000000000e+00f, 4.592090845e-02f},
  {9.592092037e-02f, 0.000000000e+00f, 5.303770900e-01f},
  {9.592092037e-02f, 1.000000000e+00f, 5.303770900e-01f},
  {2.196228951e-01f, 1.000000000e+00f, 4.592090845e-02f},
  {9.592092037e-02f, 1.000000000e+00f, 5.303770900e-01f},
  {5.803771019e-01f, 1.000000000e+00f, 6.540790796e-01f},
  {7.040790915e-01f, 1.000000000e+00f, 1.696228832e-01f},
  {2.196228951e-01f, 1.000000000e+00f, 4.592090845e-02f},
  {2.196228951e-01f, 0.000000000e+00f, 4.592090845e-02f},
  {7.040790915e-01f, 0.000000000e+00f, 1.696228832e-01f},
  {5.803771019e-01f, 0.000000000e+00f, 6.540790796e-01f},
  {9.592092037e-02f, 0.000000000e+00f, 5.303770900e-01f},
};

static int cornellMain(bool useMis, uint32_t spp, uint32_t res,
                       const std::string& dump, bool extraBoxes,
                       uint32_t benchThreads = 0) {
  using namespace math;
  std::vector<float3> verts;
  std::vector<VertexData> vdata;
  std::vector<Face> faces;
  float s = 1.0f;
  addQuad(verts, vdata, faces, {-s,0,-s},{s,0,-s},{s,0,s},{-s,0,s}, 0);
  addQuad(verts, vdata, faces, {-s,2,s},{s,2,s},{s,2,-s},{-s,2,-s}, 0);
  addQuad(verts, vdata, faces, {-s,0,-s},{-s,2,-s},{s,2,-s},{s,0,-s}, 0);
  addQuad(verts, vdata, faces, {-s,0,s},{-s,2,s},{-s,2,-s},{-s,0,-s}, 1);
  addQuad(verts, vdata, faces, {s,0,-s},{s,2,-s},{s,2,s},{s,0,s}, 2);
  addQuad(verts, vdata, faces, {-0.3f,1.995f,0.3f},{0.3f,1.995f,0.3f},
          {0.3f,1.995f,-0.3f},{-0.3f,1.995f,-0.3f}, 3);
  if (extraBoxes) {
    // cornell-mat variant: metal tall box + glass short box, geometry
    // identical to procedural.cornell_box(extra_materials=True).
    auto addBox = [&](const float (*v)[3], uint32_t mat) {
      using math::float3;
      for (int f = 0; f < 6; f++) {
        const float(*q)[3] = v + 4 * f;
        addQuad(verts, vdata, faces, float3(q[0][0], q[0][1], q[0][2]),
                float3(q[1][0], q[1][1], q[1][2]),
                float3(q[2][0], q[2][1], q[2][2]),
                float3(q[3][0], q[3][1], q[3][2]), mat);
      }
    };
    addBox(kTallBox, 4);
    addBox(kShortBox, 5);
  }

  Scene scene((Node()));
  auto mat = [&](float3 base, float3 em) {
    scene.addMaterial(std::unique_ptr<BSDF>(new ParametricBSDF(
        base, nullptr, nullptr, nullptr, nullptr, nullptr, nullptr,
        0.0f, 1.0f, 0.0f, 1.5f, 0.0f, 0.0f, 0.0f, 0.0f, em, 1.0f, false,
        float3(1), 0.0f)));
  };
  mat(float3(0.73f,0.73f,0.73f), float3(0));
  mat(float3(0.65f,0.05f,0.05f), float3(0));
  mat(float3(0.12f,0.45f,0.15f), float3(0));
  mat(float3(0,0,0), float3(15.0f, 12.75f, 10.5f));
  if (extraBoxes) {
    // metal: base (0.9, 0.7, 0.3), metallic 1, roughness 0.2
    scene.addMaterial(std::unique_ptr<BSDF>(new ParametricBSDF(
        float3(0.9f, 0.7f, 0.3f), nullptr, nullptr, nullptr, nullptr,
        nullptr, nullptr, 1.0f, 0.2f, 0.0f, 1.5f, 0.0f, 0.0f, 0.0f, 0.0f,
        float3(0), 1.0f, false, float3(1), 0.0f)));
    // glass: transmission 1, roughness 0.05, ior 1.5, solid
    scene.addMaterial(std::unique_ptr<BSDF>(new ParametricBSDF(
        float3(1, 1, 1), nullptr, nullptr, nullptr, nullptr, nullptr,
        nullptr, 0.0f, 0.05f, 1.0f, 1.5f, 0.0f, 0.0f, 0.0f, 0.0f,
        float3(0), 1.0f, false, float3(1), 0.0f)));
  }

  scene.addMesh(std::make_unique<Mesh>(verts, vdata, faces));
  Node meshNode(&scene.mesh(0));
  // Register emissive triangles as area lights (gltf.cpp:299-314 analog).
  {
    uint32_t i = 0; int32_t li = 0;
    for (const auto& tri : scene.mesh(0).triangles()) {
      const float3* em = scene.material(scene.mesh(0).material(i)).emission();
      if (em) {
        scene.addLight(AreaLight(&tri, &scene.mesh(0), *em, Transform()));
        scene.mesh(0).lightIdx(i) = li++;
      }
      i++;
    }
  }
  scene.root().appendChild(std::move(meshNode));

  if (benchThreads > 0) {
    // benchmis mode: full-image MIS render throughput (the reference's
    // production configuration, src/main.cpp:93-104) with the same
    // thread-per-slice parallelism TileRenderer uses
    // (src/cpu/tile-renderer.hpp:37,150-197) — a same-machine hardware
    // baseline for BENCH_DETAIL.json's cornell_mis metric.
    for (uint32_t pass = 0; pass < 2; pass++) {
      uint32_t threads = pass == 0 ? 1 : benchThreads;
      std::vector<std::thread> pool;
      std::atomic<uint64_t> rays{0};
      // Dynamic row-band queue, like the reference's own mutex-guarded
      // next-tile index (tile-renderer.hpp:163-167) — static slices
      // underfill threads on this scene's uneven row costs.
      std::atomic<uint32_t> nextBand{0};
      const uint32_t bandRows = 16;
      auto tb = std::chrono::steady_clock::now();
      for (uint32_t t = 0; t < threads; t++) {
        pool.emplace_back([&] {
          Buffer buf(res, res);
          Camera cam(math::uint2(res, res), 28.0f, 0.0f,
                     math::float2(36, 24), math::float3(0, 1.0f, 3.4f),
                     math::float3(0, 0, -1.0f));
          SobolSampler<FastOwenScrambler> smp(spp, math::uint2(res, res));
          std::unique_ptr<cpu::Integrator> ii;
          if (useMis)
            ii = std::make_unique<cpu::MISIntegrator>(buf, cam, smp);
          else
            ii = std::make_unique<cpu::NaiveIntegrator>(buf, cam, smp);
          ii->scene = &scene;
          ii->samples = spp;
          uint64_t r = 0;
          for (;;) {
            uint32_t lo = nextBand.fetch_add(bandRows);
            if (lo >= res) break;
            uint32_t hi = std::min(lo + bandRows, res);
            // Full-size per-thread buffer, absolute row band: bounds index
            // the target directly, so no extra pixel offset.
            ii->samplingBounds = ubounds2({0, lo}, {res, hi});
            ii->samplingOffset = math::uint2(0, 0);
            ii->render();
            r += ii->rayCount();
          }
          rays += r;
        });
      }
      for (auto& th : pool) th.join();
      auto te = std::chrono::steady_clock::now();
      double dt = std::chrono::duration<double>(te - tb).count();
      std::cout << "benchmis " << (useMis ? "mis" : "naive")
                << " threads=" << threads << ": " << rays.load() / dt / 1e6
                << " Mrays/s (" << rays.load() << " rays, " << dt << " s)"
                << std::endl;
    }
    return 0;
  }

  Buffer buffer(res, res);
  Camera camera(uint2(res, res), 28.0f, 0.0f, float2(36, 24),
                float3(0, 1.0f, 3.4f), float3(0, 0, -1.0f));
  SobolSampler<FastOwenScrambler> sampler(spp, uint2(res, res));
  std::unique_ptr<cpu::Integrator> integ;
  if (useMis) integ = std::make_unique<cpu::MISIntegrator>(buffer, camera, sampler);
  else integ = std::make_unique<cpu::NaiveIntegrator>(buffer, camera, sampler);
  integ->scene = &scene;
  integ->samples = spp;
  integ->samplingBounds = ubounds2({0, 0}, {res, res});
  integ->samplingOffset = uint2(0, 0);
  integ->render();

  if (!dump.empty()) dumpBuffer(buffer, dump, res, res);

  // Print quadrant means for regional comparison.
  const char* names[4] = {"TL", "TR", "BL", "BR"};
  uint32_t hr = res / 2;
  uint32_t qx[4] = {0, hr, 0, hr}, qy[4] = {0, 0, hr, hr};
  for (int q = 0; q < 4; q++) {
    double r = 0, g = 0, bl = 0;
    for (uint32_t y = qy[q]; y < qy[q] + hr; y++)
      for (uint32_t x = qx[q]; x < qx[q] + hr; x++) {
        auto px = buffer(x, y);
        r += px.x(); g += px.y(); bl += px.z();
      }
    double n = double(hr) * hr;
    std::cout << "cornell " << (useMis ? "mis" : "naive") << " " << names[q]
              << " " << r / n << " " << g / n << " " << bl / n << std::endl;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// bench mode: the reference's own closest-hit throughput (its hot contract,
// src/cpu/ray-integrator.cpp:84-160) on the SAME 132k-triangle sphere-field
// workload tools/perf_trace.py uses for the TPU build — a same-machine
// hardware baseline for BENCH_DETAIL.json's bigscene metrics. Statistically
// identical geometry/ray distributions (exact RNG parity is irrelevant for
// throughput).

namespace {

struct XorShift {
  uint64_t s;
  explicit XorShift(uint64_t seed) : s(seed * 2685821657736338717ull + 1) {}
  uint64_t next() {
    s ^= s << 13; s ^= s >> 7; s ^= s << 17; return s;
  }
  float uniform() { return float(next() >> 40) / float(1 << 24); }
  float range(float lo, float hi) { return lo + (hi - lo) * uniform(); }
  float normal() {
    float u1 = std::max(uniform(), 1e-7f), u2 = uniform();
    return std::sqrt(-2.0f * std::log(u1)) *
           std::cos(2.0f * float(M_PI) * u2);
  }
};

class BenchIntegrator : public cpu::RayIntegrator {
public:
  BenchIntegrator(Buffer& b, Camera& c, Sampler& s)
      : cpu::RayIntegrator(b, c, s) {}
  math::float3 Li(const Ray&) override { return math::float3(0); }
  bool closest(const Ray& ray, cpu::Hit& hit) noexcept {
    return testNode(ray, 1e-3f, hit, scene->root());
  }
};

int benchMain(uint32_t nRays, bool coherent, uint32_t nThreads) {
  using namespace math;
  XorShift geo(7);
  std::vector<float3> verts;
  std::vector<VertexData> vdata;
  std::vector<Face> faces;
  uint32_t nt = 24, np = 48;
  for (int sph = 0; sph < 60; sph++) {
    float cx = geo.range(-6, 6), cy = geo.range(-6, 6), cz = geo.range(-6, 6);
    float r = geo.range(0.4f, 1.2f);
    uint32_t base = verts.size();
    for (uint32_t i = 0; i <= nt; i++) {
      float th = float(M_PI) * i / nt;
      for (uint32_t j = 0; j < np; j++) {
        float ph = 2.0f * float(M_PI) * j / np;
        float3 n(std::sin(th) * std::cos(ph), std::cos(th),
                 std::sin(th) * std::sin(ph));
        verts.push_back(float3(cx, cy, cz) + n * r);
        vdata.push_back({n, float4(1, 0, 0, 1), float2(0, 0)});
      }
    }
    for (uint32_t i = 0; i < nt; i++)
      for (uint32_t j = 0; j < np; j++) {
        uint32_t j1 = (j + 1) % np;
        uint32_t a = base + i * np + j, b = base + i * np + j1;
        uint32_t c = base + (i + 1) * np + j, d = base + (i + 1) * np + j1;
        if (i > 0) faces.push_back({a, b, c, 0});
        if (i < nt - 1) faces.push_back({b, d, c, 0});
      }
  }
  std::cout << "bench scene: " << faces.size() << " tris" << std::endl;

  Scene scene((Node()));
  scene.addMaterial(std::unique_ptr<BSDF>(new ParametricBSDF(
      float3(1, 1, 1), nullptr, nullptr, nullptr, nullptr, nullptr, nullptr,
      0.0f, 0.4f, 0.0f, 1.5f, 0.0f, 0.0f, 0.0f, 0.0f, float3(0), 1.0f,
      false, float3(1), 0.0f)));
  auto t0 = std::chrono::steady_clock::now();
  scene.addMesh(std::make_unique<Mesh>(verts, vdata, faces));  // SAH build
  auto t1 = std::chrono::steady_clock::now();
  std::cout << "bvh build: "
            << std::chrono::duration<double>(t1 - t0).count() * 1e3 << " ms"
            << std::endl;
  scene.root().appendChild(Node(&scene.mesh(0)));

  // Ray set matching tools/perf_trace.py make_rays.
  std::vector<Ray> rays;
  rays.reserve(nRays);
  XorShift rr(11);
  for (uint32_t i = 0; i < nRays; i++) {
    float3 o, d;
    if (coherent) {
      o = float3(0, 0, 20);
      d = float3(rr.range(-0.45f, 0.45f), rr.range(-0.45f, 0.45f), -1.0f);
    } else {
      o = float3(rr.range(-8, 8), rr.range(-8, 8), rr.range(-8, 8));
      d = float3(rr.normal(), rr.normal(), rr.normal());
    }
    rays.emplace_back(o, normalized(d));
  }

  for (uint32_t pass = 0; pass < 2; pass++) {
    uint32_t threads = pass == 0 ? 1 : nThreads;
    std::atomic<uint64_t> hits{0};
    auto tb = std::chrono::steady_clock::now();
    std::vector<std::thread> pool;
    uint32_t chunk = nRays / threads;
    for (uint32_t t = 0; t < threads; t++) {
      pool.emplace_back([&, t] {
        Buffer buf(1, 1);
        Camera cam(uint2(1, 1), 30.0f, 0.0f, float2(36, 24), float3(0),
                   float3(0, 0, -1));
        SobolSampler<FastOwenScrambler> smp(1, uint2(1, 1));
        BenchIntegrator integ(buf, cam, smp);
        integ.scene = &scene;
        uint64_t h = 0;
        uint32_t lo = t * chunk, hi = t == threads - 1 ? nRays : lo + chunk;
        for (uint32_t i = lo; i < hi; i++) {
          cpu::Hit hit;
          if (integ.closest(rays[i], hit)) h++;
        }
        hits += h;
      });
    }
    for (auto& th : pool) th.join();
    auto te = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(te - tb).count();
    std::cout << "bench " << (coherent ? "coherent" : "incoherent")
              << " threads=" << threads << ": " << nRays / dt / 1e6
              << " Mrays/s (" << hits.load() << " hits)" << std::endl;
  }
  return 0;
}

}  // namespace

// probe mode: evaluate the reference ParametricBSDF's f/pdf directly on a
// deterministic direction grid (identity shading frame), for lane-level
// comparison against render/bsdf.py. argv: probe roughness metallic
// transmission clearcoat ccR thin ior aniso anisoRot
static int probeMain(int argc, char** argv) {
  using namespace math;
  float r = argc > 2 ? atof(argv[2]) : 0.5f;
  float m = argc > 3 ? atof(argv[3]) : 0.0f;
  float t = argc > 4 ? atof(argv[4]) : 0.0f;
  float cc = argc > 5 ? atof(argv[5]) : 0.0f;
  float ccr = argc > 6 ? atof(argv[6]) : 0.0f;
  bool thin = argc > 7 && atoi(argv[7]) != 0;
  float ior = argc > 8 ? atof(argv[8]) : 1.5f;
  float aniso = argc > 9 ? atof(argv[9]) : 0.0f;
  float arot = argc > 10 ? atof(argv[10]) : 0.0f;

  ParametricBSDF bsdf(
      float3(0.8f, 0.6f, 0.4f), nullptr, nullptr, nullptr, nullptr, nullptr,
      nullptr, m, r, t, ior, aniso, arot, cc, ccr, float3(0), 1.0f, thin,
      float3(1), 0.0f);
  const float3 n(0, 0, 1), tg(1, 0, 0);
  const float2 uv(0, 0);
  // 8 polar x 8 azimuth outgoing dirs x same incoming set
  for (int i = 0; i < 8; i++) {
    for (int j = 0; j < 8; j++) {
      float tho = (0.1f + 0.75f * float(i) / 7) * float(M_PI);  // incl. below
      float pho = 2.0f * float(M_PI) * float(j) / 8;
      float3 wo(std::sin(tho) * std::cos(pho), std::sin(tho) * std::sin(pho),
                std::cos(tho));
      for (int k = 0; k < 8; k++) {
        float thi = (0.08f + 0.8f * float(k) / 7) * float(M_PI);
        float phi = 2.0f * float(M_PI) * float((k * 3 + j) % 8) / 8 + 0.37f;
        float3 wi(std::sin(thi) * std::cos(phi), std::sin(thi) * std::sin(phi),
                  std::cos(thi));
        float3 f = bsdf.f(wo, wi, n, tg, uv);
        float pdf = bsdf.pdf(wo, wi, n, tg, uv);
        printf("%.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g\n",
               wo.x(), wo.y(), wo.z(), wi.x(), wi.y(), wi.z(),
               f.x(), f.y(), f.z(), pdf, 0.0);
      }
    }
  }
  return 0;
}

// probesample mode: deterministic BSDF samples (same args as probe).
// Prints wo(3) u(2) uc uc2 flags wi(3) f(3) pdf per row.
static int probeSampleMain(int argc, char** argv) {
  using namespace math;
  float r = argc > 2 ? atof(argv[2]) : 0.5f;
  float m = argc > 3 ? atof(argv[3]) : 0.0f;
  float t = argc > 4 ? atof(argv[4]) : 0.0f;
  float cc = argc > 5 ? atof(argv[5]) : 0.0f;
  float ccr = argc > 6 ? atof(argv[6]) : 0.0f;
  bool thin = argc > 7 && atoi(argv[7]) != 0;
  float ior = argc > 8 ? atof(argv[8]) : 1.5f;
  float aniso = argc > 9 ? atof(argv[9]) : 0.0f;
  float arot = argc > 10 ? atof(argv[10]) : 0.0f;

  ParametricBSDF bsdf(
      float3(0.8f, 0.6f, 0.4f), nullptr, nullptr, nullptr, nullptr, nullptr,
      nullptr, m, r, t, ior, aniso, arot, cc, ccr, float3(0), 1.0f, thin,
      float3(1), 0.0f);
  const float3 n(0, 0, 1), tg(1, 0, 0);
  const float2 uv(0, 0);
  XorShift rng(11);
  for (int i = 0; i < 512; i++) {
    float tho = (0.05f + 0.85f * rng.uniform()) * float(M_PI);
    float pho = 2.0f * float(M_PI) * rng.uniform();
    float3 wo(std::sin(tho) * std::cos(pho), std::sin(tho) * std::sin(pho),
              std::cos(tho));
    float2 u(rng.uniform(), rng.uniform());
    float uc = rng.uniform(), uc2 = rng.uniform();
    auto s = bsdf.sample(wo, n, tg, uv, u, uc, uc2, false);
    printf("%.9g %.9g %.9g %.9g %.9g %.9g %.9g %d "
           "%.9g %.9g %.9g %.9g %.9g %.9g %.9g\n",
           wo.x(), wo.y(), wo.z(), u.x(), u.y(), uc, uc2, int(s.scatter),
           s.wi.x(), s.wi.y(), s.wi.z(), s.f.x(), s.f.y(), s.f.z(), s.pdf);
  }
  return 0;
}

// probedraws mode: the reference ZSobol sampler's raw draw stream.
// argv: probedraws [spp] [res]. For a grid of (pixel, sample): 16 get1D
// values (dims 0..15) then 8 get2D pairs (dims 0,2,..,14), one line per
// (pixel, sample): px py s v0..v15 u0x u0y ... u7x u7y
static int probeDrawsMain(int argc, char** argv) {
  using namespace math;
  uint32_t spp = argc > 2 ? atoi(argv[2]) : 8;
  uint32_t res = argc > 3 ? atoi(argv[3]) : 512;
  SobolSampler<FastOwenScrambler> sampler(spp, uint2(res, res));
  XorShift rng(3);
  for (int i = 0; i < 256; i++) {
    uint32_t px = uint32_t(rng.uniform() * res) % res;
    uint32_t py = uint32_t(rng.uniform() * res) % res;
    uint32_t s = uint32_t(rng.uniform() * spp) % spp;
    printf("%u %u %u", px, py, s);
    sampler.startPixelSample(uint2(px, py), s);
    for (int d = 0; d < 16; d++) printf(" %.9g", sampler.get1D());
    sampler.startPixelSample(uint2(px, py), s);
    for (int d = 0; d < 8; d++) {
      float2 u = sampler.get2D();
      printf(" %.9g %.9g", u.x(), u.y());
    }
    printf("\n");
  }
  return 0;
}

// ---------------------------------------------------------------------------
// benchglb: reference full-MIS throughput on a GLB exported by
// yart_tpu.io.glb_export (see glb_bench.hpp for the loader rationale).
#include "glb_bench.hpp"

static int benchGlbMain(int argc, char** argv) {
  // argv: benchglb <glb> <env.hdr|-> [spp] [res] [threads]
  //       [camx camy camz fwdx fwdy fwdz focal_mm] [dump_path]
  // Camera defaults = bench.py bench_atrium (256^2, 28mm, (-10,1.8,0),
  // forward (18,0.8,0)).
  using math::float2;
  using math::float3;
  using math::float4;
  using math::uint2;
  if (argc < 3) { fprintf(stderr, "benchglb <glb> <hdr|->\n"); return 2; }
  const char* glbPath = argv[2];
  std::string hdrPath = argc > 3 ? argv[3] : "-";
  uint32_t spp = argc > 4 ? atoi(argv[4]) : 8;
  uint32_t res = argc > 5 ? atoi(argv[5]) : 256;
  uint32_t benchThreads =
      argc > 6 ? atoi(argv[6]) : std::thread::hardware_concurrency();
  float3 camPos(-10.0f, 1.8f, 0.0f), camFwd(18.0f, 0.8f, 0.0f);
  float focal = 28.0f;
  if (argc > 12) {
    camPos = float3(atof(argv[7]), atof(argv[8]), atof(argv[9]));
    camFwd = float3(atof(argv[10]), atof(argv[11]), atof(argv[12]));
    focal = atof(argv[13] ? argv[13] : "28");
  }
  std::string dump = argc > 14 ? argv[14] : "";

  glbb::Glb g;
  if (!g.load(glbPath)) { fprintf(stderr, "bad glb: %s\n", glbPath); return 2; }

  Scene scene((Node()));

  // ---- materials (mapping of gltf.cpp:62-176) ----
  struct TexRefs {
    const RGBATexture* base = nullptr;
    const SDRTexture<2>* mr = nullptr;
    const RGBTexture* normal = nullptr;
  };
  std::vector<TexRefs> texCache(
      g.doc.find("textures") ? g.doc.at("textures").arr.size() : 0);
  auto texImage = [&](int texIdx, int32_t* len) {
    int src = int(g.doc.at("textures").arr[texIdx].at("source").num);
    return g.imageBytes(src, len);
  };
  const glbb::JVal& jmats = g.doc.at("materials");
  for (const glbb::JVal& jm : jmats.arr) {
    const glbb::JVal& pbr = jm.at("pbrMetallicRoughness");
    const glbb::JVal* bcf = pbr.find("baseColorFactor");
    float3 base(1.0f);
    if (bcf) base = float3(bcf->arr[0].num, bcf->arr[1].num, bcf->arr[2].num);
    float metallic = pbr.numOr("metallicFactor", 1.0);
    float roughness = pbr.numOr("roughnessFactor", 1.0);
    const RGBATexture* baseTex = nullptr;
    const SDRTexture<2>* mrTex = nullptr;
    const RGBTexture* nrmTex = nullptr;
    if (const glbb::JVal* bt = pbr.find("baseColorTexture")) {
      int ti = int(bt->at("index").num);
      if (!texCache[ti].base) {
        int32_t len;
        const uint8_t* bytes = texImage(ti, &len);
        texCache[ti].base = scene.addTexture(std::make_unique<RGBATexture>(
            loadTexture<4>(bytes, len, TextureType::sRGB)));
      }
      baseTex = texCache[ti].base;
    }
    if (const glbb::JVal* mt = pbr.find("metallicRoughnessTexture")) {
      int ti = int(mt->at("index").num);
      if (!texCache[ti].mr) {
        int32_t len;
        const uint8_t* bytes = texImage(ti, &len);
        // channels G (roughness), B (metallic) — gltf.cpp:89-93 order
        texCache[ti].mr = scene.addTexture(std::make_unique<SDRTexture<2>>(
            loadTexture<2>(bytes, len, TextureType::NonColor, {1, 2})));
      }
      mrTex = texCache[ti].mr;
    }
    float normalScale = 1.0f;
    if (const glbb::JVal* nt = jm.find("normalTexture")) {
      int ti = int(nt->at("index").num);
      normalScale = nt->numOr("scale", 1.0);
      if (!texCache[ti].normal) {
        int32_t len;
        const uint8_t* bytes = texImage(ti, &len);
        texCache[ti].normal = scene.addTexture(std::make_unique<RGBTexture>(
            loadTexture<3>(bytes, len, TextureType::NonColor)));
      }
      nrmTex = texCache[ti].normal;
    }
    float ior = 1.5f, transmission = 0.0f, emStrength = 1.0f;
    float clearcoat = 0.0f, ccRoughness = 0.0f, volDensity = 0.0f;
    float3 volColor(1.0f);
    if (const glbb::JVal* ex = jm.find("extensions")) {
      if (const glbb::JVal* e = ex->find("KHR_materials_ior"))
        ior = e->numOr("ior", 1.5);
      if (const glbb::JVal* e = ex->find("KHR_materials_transmission"))
        transmission = e->numOr("transmissionFactor", 0.0);
      if (const glbb::JVal* e = ex->find("KHR_materials_emissive_strength"))
        emStrength = e->numOr("emissiveStrength", 1.0);
      if (const glbb::JVal* e = ex->find("KHR_materials_clearcoat")) {
        clearcoat = e->numOr("clearcoatFactor", 0.0);
        ccRoughness = e->numOr("clearcoatRoughnessFactor", 0.0);
      }
      if (const glbb::JVal* e = ex->find("KHR_materials_volume")) {
        // gltf.cpp:166-173 mapping: density = 1 / attenuationDistance
        if (const glbb::JVal* ac = e->find("attenuationColor"))
          volColor = float3(ac->arr[0].num, ac->arr[1].num, ac->arr[2].num);
        double ad = e->numOr("attenuationDistance", 0.0);
        if (ad > 0.0) volDensity = float(1.0 / ad);
      }
    }
    float3 emission(0.0f);
    if (const glbb::JVal* ef = jm.find("emissiveFactor"))
      emission = float3(ef->arr[0].num, ef->arr[1].num, ef->arr[2].num) *
                 emStrength;
    // thinTransmission matches gltf.cpp:104-105 EXCEPT with a volume:
    // Beer-Lambert attenuation needs solid transmission (mirrors our
    // builder's volume semantics for the roadster-class materials).
    bool thin = volDensity <= 0.0f;
    scene.addMaterial(std::unique_ptr<BSDF>(new ParametricBSDF(
        base, baseTex, mrTex, nullptr, nrmTex, nullptr, nullptr, metallic,
        roughness, transmission, ior, 0.0f, 0.0f, clearcoat, ccRoughness,
        emission, 1.0f, thin, volColor, volDensity)));
    (void)normalScale;  // the reference ctor takes normalScale positionally
  }

  // ---- geometry: all primitives merged into one Mesh (world space) ----
  std::vector<float3> verts;
  std::vector<VertexData> vdata;
  std::vector<Face> faces;
  for (const glbb::JVal& jmesh : g.doc.at("meshes").arr) {
    for (const glbb::JVal& prim : jmesh.at("primitives").arr) {
      const glbb::JVal& attrs = prim.at("attributes");
      uint32_t nv, nn, nuv, ni;
      const float* pos = (const float*)g.accessor(
          int(attrs.at("POSITION").num), 5126, "VEC3", &nv);
      const float* nrm = (const float*)g.accessor(
          int(attrs.at("NORMAL").num), 5126, "VEC3", &nn);
      const float* uv = (const float*)g.accessor(
          int(attrs.at("TEXCOORD_0").num), 5126, "VEC2", &nuv);
      const uint32_t* idx = (const uint32_t*)g.accessor(
          int(prim.at("indices").num), 5125, "SCALAR", &ni);
      uint32_t mat = uint32_t(prim.at("material").num);
      uint32_t baseV = verts.size();
      for (uint32_t i = 0; i < nv; i++) {
        verts.push_back(float3(pos[3 * i], pos[3 * i + 1], pos[3 * i + 2]));
        vdata.push_back({float3(nrm[3 * i], nrm[3 * i + 1], nrm[3 * i + 2]),
                         float4(1, 0, 0, 1),
                         float2(uv[2 * i], uv[2 * i + 1])});
      }
      for (uint32_t i = 0; i + 2 < ni; i += 3)
        faces.push_back(
            {baseV + idx[i], baseV + idx[i + 1], baseV + idx[i + 2], mat});
    }
  }
  std::cout << "benchglb scene: " << faces.size() << " tris, "
            << jmats.arr.size() << " materials" << std::endl;
  scene.addMesh(std::make_unique<Mesh>(verts, vdata, faces));
  Node meshNode(&scene.mesh(0));
  {
    // Emissive faces -> AreaLights (gltf.cpp:299-314)
    uint32_t i = 0;
    int32_t li = 0;
    for (const auto& tri : scene.mesh(0).triangles()) {
      const float3* em = scene.material(scene.mesh(0).material(i)).emission();
      if (em) {
        scene.addLight(AreaLight(&tri, &scene.mesh(0), *em, Transform()));
        scene.mesh(0).lightIdx(i) = li++;
      }
      i++;
    }
  }
  scene.root().appendChild(std::move(meshNode));

  float radius = math::length(scene.root().boundingBox().max -
                              scene.root().boundingBox().min) * 0.5f;
  HDRTexture hdri(1, 1, TextureType::NonColor);
  if (hdrPath != "-") {
    hdri = loadTextureHDR(hdrPath.c_str());
    scene.addLight(ImageInfiniteLight(radius, &hdri));
  }

  if (!dump.empty()) {
    Buffer buf(res, res);
    Camera cam(uint2(res, res), focal, 0.0f, float2(36, 24), camPos, camFwd);
    SobolSampler<FastOwenScrambler> smp(spp, uint2(res, res));
    cpu::MISIntegrator ii(buf, cam, smp);
    ii.scene = &scene;
    ii.samples = spp;
    ii.samplingBounds = math::ubounds2({0, 0}, {res, res});
    ii.samplingOffset = uint2(0, 0);
    ii.render();
    dumpBuffer(buf, dump, res, res);
    std::cout << "benchglb dumped " << dump << std::endl;
    return 0;
  }

  for (uint32_t pass = 0; pass < 2; pass++) {
    uint32_t threads = pass == 0 ? 1 : benchThreads;
    std::vector<std::thread> pool;
    std::atomic<uint64_t> rays{0};
    std::atomic<uint32_t> nextBand{0};
    const char* bandEnv = getenv("ORACLE_BAND");
    const uint32_t bandRows = bandEnv ? atoi(bandEnv) : 16;
    auto tb = std::chrono::steady_clock::now();
    for (uint32_t t = 0; t < threads; t++) {
      pool.emplace_back([&] {
        Buffer buf(res, res);
        Camera cam(uint2(res, res), focal, 0.0f, float2(36, 24), camPos,
                   camFwd);
        SobolSampler<FastOwenScrambler> smp(spp, uint2(res, res));
        cpu::MISIntegrator ii(buf, cam, smp);
        ii.scene = &scene;
        ii.samples = spp;
        uint64_t r = 0;
        for (;;) {
          uint32_t lo = nextBand.fetch_add(bandRows);
          if (lo >= res) break;
          uint32_t hi = std::min(lo + bandRows, res);
          ii.samplingBounds = math::ubounds2({0, lo}, {res, hi});
          ii.samplingOffset = uint2(0, 0);
          ii.render();
          r += ii.rayCount();
        }
        rays += r;
      });
    }
    for (auto& th : pool) th.join();
    auto te = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(te - tb).count();
    std::cout << "benchglb threads=" << threads << ": "
              << rays.load() / dt / 1e6 << " Mrays/s (" << rays.load()
              << " rays, " << dt << " s)" << std::endl;
  }
  return 0;
}

int main(int argc, char** argv) {
  if (argc > 1 && std::string(argv[1]) == "benchglb")
    return benchGlbMain(argc, argv);
  if (argc > 1 && std::string(argv[1]) == "probe") return probeMain(argc, argv);
  if (argc > 1 && std::string(argv[1]) == "probedraws")
    return probeDrawsMain(argc, argv);
  if (argc > 1 && std::string(argv[1]) == "probesample")
    return probeSampleMain(argc, argv);
  // argv: [mis|naive] [spp] [roughness] [metallic] [cornell|furnace]
  //       [dump_path] [res] [transmission] [clearcoat] [ccRoughness]
  //       [thin 0|1] [ior] [anisotropic] [anisoRotation(rad)]
  // or:   bench [n_rays] [coherent 0|1] [threads]
  if (argc > 1 && std::string(argv[1]) == "bench") {
    uint32_t n = argc > 2 ? atoi(argv[2]) : 262144;
    bool coh = argc > 3 && atoi(argv[3]) != 0;
    uint32_t th = argc > 4 ? atoi(argv[4]) : std::thread::hardware_concurrency();
    return benchMain(n, coh, th);
  }
  // or:   benchmis [spp] [res] [threads] — full cornell MIS render
  //       throughput (matches bench.py's cornell_mis workload).
  if (argc > 1 && std::string(argv[1]) == "benchmis") {
    uint32_t spp = argc > 2 ? atoi(argv[2]) : 8;
    uint32_t res = argc > 3 ? atoi(argv[3]) : 256;
    uint32_t th = argc > 4 ? atoi(argv[4]) : std::thread::hardware_concurrency();
    return cornellMain(true, spp, res, "", false, th);
  }
  bool useMis = argc > 1 && std::string(argv[1]) == "mis";
  uint32_t spp = argc > 2 ? atoi(argv[2]) : 64;
  float roughness = argc > 3 ? atof(argv[3]) : 1.0f;
  float metallic = argc > 4 ? atof(argv[4]) : 0.0f;
  std::string dump = argc > 6 ? argv[6] : "";
  uint32_t res = argc > 7 ? atoi(argv[7]) : 16;
  // Extra lobe parameters (parity for dielectric / clearcoat / thin —
  // the reference's flagship McLaren config exercises exactly these,
  // src/main.cpp:79-104).
  float transmission = argc > 8 ? atof(argv[8]) : 0.0f;
  float clearcoat = argc > 9 ? atof(argv[9]) : 0.0f;
  float ccRoughness = argc > 10 ? atof(argv[10]) : 0.0f;
  bool thin = argc > 11 && atoi(argv[11]) != 0;
  float ior = argc > 12 ? atof(argv[12]) : 1.5f;
  float aniso = argc > 13 ? atof(argv[13]) : 0.0f;
  float anisoRot = argc > 14 ? atof(argv[14]) : 0.0f;  // radians
  if (argc > 5 && std::string(argv[5]) == "cornell")
    return cornellMain(useMis, spp, res, dump, false);
  if (argc > 5 && std::string(argv[5]) == "cornell-mat")
    return cornellMain(useMis, spp, res, dump, true);

  (void)res;
  uint32_t nt = 32, np = 64;
  std::vector<math::float3> verts;
  std::vector<VertexData> vdata;
  std::vector<Face> faces;
  for (uint32_t i = 0; i <= nt; i++) {
    float th = float(M_PI) * i / nt;
    for (uint32_t j = 0; j < np; j++) {
      float ph = 2.0f * float(M_PI) * j / np;
      math::float3 n(std::sin(th) * std::cos(ph), std::cos(th), std::sin(th) * std::sin(ph));
      verts.push_back(n);
      vdata.push_back({n, math::float4(1, 0, 0, 1), math::float2(0, 0)});
    }
  }
  for (uint32_t i = 0; i < nt; i++)
    for (uint32_t j = 0; j < np; j++) {
      uint32_t j1 = (j + 1) % np;
      uint32_t a = i * np + j, b = i * np + j1, c = (i + 1) * np + j, d = (i + 1) * np + j1;
      if (i > 0) faces.push_back({a, b, c, 0});
      if (i < nt - 1) faces.push_back({b, d, c, 0});
    }

  Scene scene((Node()));
  scene.addMaterial(std::unique_ptr<BSDF>(new ParametricBSDF(
      math::float3(1, 1, 1), nullptr, nullptr, nullptr, nullptr, nullptr,
      nullptr, metallic, roughness, transmission, ior, aniso, anisoRot,
      clearcoat, ccRoughness, math::float3(0), 1.0f, thin,
      math::float3(1), 0.0f)));
  scene.addMesh(std::make_unique<Mesh>(verts, vdata, faces));
  scene.root().appendChild(Node(&scene.mesh(0)));

  static HDRTexture tex(8, 8, TextureType::NonColor);
  for (uint32_t i = 0; i < 8 * 8 * 3; i++) tex.data[i] = 0.5f;
  float radius =
      math::length(scene.root().boundingBox().max - scene.root().boundingBox().min) * 0.5f;
  scene.addLight(ImageInfiniteLight(radius, &tex));

  Buffer buffer(16, 16);
  Camera camera(math::uint2(16, 16), 30.0f, 0.0f, math::float2(36, 24),
                math::float3(0, 0, 3.5f), math::float3(0, 0, -3.5f));

  SobolSampler<FastOwenScrambler> sampler(spp, math::uint2(16, 16));
  std::unique_ptr<cpu::Integrator> integ;
  if (useMis)
    integ = std::make_unique<cpu::MISIntegrator>(buffer, camera, sampler);
  else
    integ = std::make_unique<cpu::NaiveIntegrator>(buffer, camera, sampler);
  integ->scene = &scene;
  integ->samples = spp;
  integ->samplingBounds = math::ubounds2({0, 0}, {16, 16});
  integ->samplingOffset = math::uint2(0, 0);
  integ->render();

  if (!dump.empty()) dumpBuffer(buffer, dump, 16, 16);

  double sum = 0;
  int cnt = 0;
  for (uint32_t y = 6; y < 10; y++)
    for (uint32_t x = 6; x < 10; x++) {
      auto px = buffer(x, y);
      sum += (px.x() + px.y() + px.z()) / 3.0;
      cnt++;
    }
  std::cout << (useMis ? "mis" : "naive") << " r=" << roughness
            << " m=" << metallic << " center mean: " << sum / cnt << std::endl;
  return 0;
}
