#!/bin/bash
# Build a headless validation oracle against the READ-ONLY reference at
# /root/reference. The reference relies on Apple-clang constexpr laxness, so
# we patch a throwaway copy in /tmp (never committed) by relaxing constexpr
# and add missing std includes via a forced prelude. Validation only.
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
OUT=${1:-/tmp/oracle}
mkdir -p "$OUT"
rm -rf "$OUT/src" && cp -r /root/reference/src "$OUT/src"
cd "$OUT/src"
sed -i 's/^constexpr \(double\|float\|size_t\) /inline const \1 /' math/math_base.hpp core/sobol-matrices.hpp core/color-utils.hpp
grep -rl constexpr . | xargs sed -i 's/static constexpr/static inline const/g; s/virtual constexpr/virtual/g; s/constexpr explicit/explicit/g; s/\bconstexpr\b//g'
sed -i 's/const const/const/g' core/tonemapping.hpp
# Mean estimator for parity goldens: GMoN is nonlinear (order statistics), so
# per-pixel comparison against an independently-sampled render needs the
# plain mean both sides (integrator.cpp:17 hardcodes GMoN(15)).
sed -i 's/GMoNEstimator estimator(int32_t(samples), 15);/MeanEstimator estimator(samples);/' cpu/integrator.cpp
sed -i 's/\bbounds<T, N>(/bounds(/g' math/bounds.hpp
sed -i 's/if (isnan(vec\[i\])) return true;/if (std::isnan(vec[i])) return true;/; s/if (isinf(vec\[i\])) return true;/if (std::isinf(vec[i])) return true;/' math/vec.hpp
cat > "$OUT/prelude.hpp" <<'PRELUDE'
#define _USE_MATH_DEFINES
#include <cmath>
#include <bit>
#include <cstdint>
#include <cstddef>
#include <algorithm>
#include <numeric>
#include <optional>
#include <array>
#include <vector>
#include <memory>
#include <span>
#include <limits>
#include <functional>
#include <string>
#include <thread>
#include <mutex>
#include <shared_mutex>
#include <condition_variable>
#include <chrono>
#include <ranges>
#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif
PRELUDE
cat > "$OUT/unity.cpp" <<'UNITY'
#include "src/core/rng.cpp"
#include "src/core/sampler.cpp"
#include "src/core/sobol-matrices.cpp"
#include "src/core/texture.cpp"
#include "src/core/bsdf.cpp"
#include "src/core/light.cpp"
#include "src/core/light-sampler.cpp"
#include "src/math/sampling.cpp"
#include "src/bsdf/parametric.cpp"
#include "src/bsdf/luts.cpp"
#include "src/cpu/integrator.cpp"
#include "src/cpu/ray-integrator.cpp"
#include "src/cpu/mis-integrator.cpp"
#include "src/cpu/naive-integrator.cpp"
#include "main.cpp"
#include "/root/reference/stb-image/impl.cpp"
UNITY
cp "$HERE/furnace_oracle.cpp" "$OUT/main.cpp"
cp "$HERE/glb_bench.hpp" "$OUT/glb_bench.hpp"
cd "$OUT"
g++ -O2 -std=c++20 -include prelude.hpp -Isrc -I/root/reference/xoshiro-rng -I/root/reference/stb-image -o oracle unity.cpp
echo "built $OUT/oracle"
