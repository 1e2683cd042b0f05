"""SPMD parallelism: pixel-lane sharding over a device mesh.

The reference parallelizes with a mutex-guarded tile queue over OS threads
(src/cpu/tile-renderer.hpp:96-107,150-197). The TPU equivalent needs no
queue and no locks: pixels are embarrassingly parallel, so lanes are sharded
over a 1D ``jax.sharding.Mesh`` ("pixels" axis), the compiled scene is
replicated, and XLA inserts the only collective that exists in the forward
pass — the psum of the ray counters. Because samplers are pure functions of
(pixel, sample, dim) (SURVEY.md §2.6), the image is bit-identical for ANY
mesh shape, which is tested in tests/test_sharding.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIXEL_AXIS = "pixels"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1D data-parallel mesh over pixel lanes."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (PIXEL_AXIS,))


def shard_lanes(mesh: Mesh) -> NamedSharding:
    """Sharding for [N, ...] lane arrays: split the lane axis."""
    return NamedSharding(mesh, P(PIXEL_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    """Sharding for scene/camera pytrees: fully replicated."""
    return NamedSharding(mesh, P())


def device_put_lanes(mesh: Mesh, *arrays):
    """Place lane arrays sharded over the mesh."""
    s = shard_lanes(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def device_put_replicated(mesh: Mesh, tree):
    """Replicate a pytree (the compiled scene, camera params) on every device.

    Under jax.distributed, plain device_put cross-checks values between
    processes with an equality collective that treats the scene's bitcast
    NaN sentinels (int -1 ids viewed as f32) as mismatches — so the global
    array is assembled from per-device copies instead. Scene compilation is
    bit-deterministic across processes (asserted in tests/test_multihost.py
    by the image check)."""
    s = replicate(mesh)
    if jax.process_count() > 1:

        def put(x):
            x = np.asarray(x)
            shards = [jax.device_put(x, d) for d in s.addressable_devices]
            return jax.make_array_from_single_device_arrays(
                x.shape, s, shards
            )

        return jax.tree_util.tree_map(put, tree)
    return jax.device_put(tree, s)
