# SPMD pixel sharding over a jax.sharding.Mesh.
from yart_tpu.parallel.sharding import make_mesh, shard_lanes, replicate  # noqa: F401
