"""Persistent XLA compile cache.

The JAX_COMPILATION_CACHE_DIR env var is ignored in this environment: the
sandbox's sitecustomize initializes jax (axon PJRT registration) before user
code runs, so env-based config is frozen too early. Setting the option
through jax.config AFTER import works and makes the multi-minute wavefront
compiles one-time costs across processes. Call this before the first jit.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str = None) -> str:
    import jax

    if path is None:
        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"),
        )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
