// Headless oracle harness over (patched-copy of) the read-only reference
// sources — validation only; never shipped.
#include <core/core.hpp>
#include <bsdf/parametric.hpp>
#include <cpu/mis-integrator.hpp>
#include <cpu/naive-integrator.hpp>
#include <cmath>
#include <iostream>
#include <memory>
#include <string>
#include <vector>

using namespace yart;

int main(int argc, char** argv) {
  bool useMis = argc > 1 && std::string(argv[1]) == "mis";
  uint32_t spp = argc > 2 ? atoi(argv[2]) : 64;
  float roughness = argc > 3 ? atof(argv[3]) : 1.0f;
  float metallic = argc > 4 ? atof(argv[4]) : 0.0f;

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
      nullptr, metallic, roughness, 0.0f, 1.5f, 0.0f, 0.0f,
      0.0f, 0.0f, math::float3(0), 1.0f, false, math::float3(1), 0.0f)));
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
