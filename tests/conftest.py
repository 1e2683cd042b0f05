"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

The sandbox pins JAX_PLATFORMS=axon via sitecustomize, so env vars alone are
not enough — jax.config is authoritative (SURVEY.md §4.5: mesh-shape
invariance is testable on a virtual CPU mesh because samplers are
counter-based).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

# XLA compiles are slow in this sandbox (~0.5s per tiny executable); a
# persistent cache makes re-runs cheap.
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(_cache))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# The env var alone is IGNORED (sitecustomize initializes jax first); the
# config call is what actually enables the persistent cache.
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
