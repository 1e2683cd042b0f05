"""Multi-host (multi-process) initialization.

The reference has no distributed story at all (shared-memory threads only,
SURVEY.md §2.6). Here multi-host rendering is single-controller jax: every
host runs the same program, `jax.distributed.initialize` wires the hosts into
one device mesh, pixels shard across ALL devices (ICI within a slice, DCN
across hosts), the scene replicates, and the only collectives are the ray
counter psum and the final image gather — both inserted automatically by
jit + shardings (parallel/sharding.py).

Usage on each host:

    from yart_tpu.parallel.distributed import init_distributed
    init_distributed()  # no-op on a single host / reads env on TPU pods
    mesh = make_mesh()  # now spans every host's devices

Render by sharding each host's lane slice with `shard_lanes(mesh)`; images
are assembled from `jax.experimental.multihost_utils` gathers (or each host
writes only its own pixel rows).
"""

from __future__ import annotations

from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed; returns True if a multi-process setup was
    detected/initialized. On TPU pods all arguments come from the environment;
    elsewhere pass them explicitly. Safe to call on a single host (no-op)."""
    # NOTE: jax.process_count() itself initializes the XLA backend, after
    # which jax.distributed.initialize refuses to run — inspect the
    # distributed client state instead of touching the backend.
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        return jax.process_count() > 1
    if coordinator_address is None and num_processes is None:
        try:
            # TPU pod: everything auto-detected from the runtime env.
            jax.distributed.initialize()
        except Exception:
            # Single-host / no cluster env: stay local.
            return False
    else:
        # Explicit cluster spec: a failure here is a real error.
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_count() > 1


def local_lane_slice(n_lanes: int) -> slice:
    """The contiguous lane range this process owns under an even split."""
    p = jax.process_count()
    i = jax.process_index()
    per = -(-n_lanes // p)
    return slice(i * per, min((i + 1) * per, n_lanes))
