"""yart_tpu — a TPU-native differentiable wavefront path tracer.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the yart
reference renderer (CPU C++20 path tracer): backwards path tracing with
MIS+NEE, Enterprise-PBR-style layered parametric material with GGX
multi-scatter compensation, SAH BVH, ZSobol/Owen sampling, GLTF scene
loading, octahedral HDR environment maps with importance sampling, AgX
tonemapping, robust GMoN estimators and progressive wave rendering.

Everything hot runs as jitted XLA on SoA ray batches; scenes are compiled
host-side into flat device arrays; parallelism is SPMD pixel sharding over a
``jax.sharding.Mesh`` instead of the reference's tile/thread queue.
"""

__version__ = "0.1.0"

from yart_tpu.config import RenderConfig, CameraConfig  # noqa: F401
