"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

Must run before jax is imported (SURVEY.md §4.5: mesh-shape invariance is
testable on a virtual CPU mesh because samplers are counter-based).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# XLA compiles are slow in this sandbox (~0.5s per tiny executable); a
# persistent cache makes re-runs cheap.
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(_cache))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
