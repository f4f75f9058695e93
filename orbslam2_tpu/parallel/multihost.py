"""Multi-host (multi-process) execution helpers.

The reference is a single process with 4 pthreads and no distributed
backend (SURVEY.md §2.3 P7). The TPU-native scaling story runs one JAX
process per host (`jax.distributed.initialize`), forms a global mesh
over every chip in the slice, and feeds the same `shard_map` programs
used single-host (parallel/dist_ba.py, parallel/dist_posegraph.py) —
psum rides ICI within a host and DCN across hosts.

These helpers cover the multi-controller mechanics: building global
arrays from host-replicated numpy data and fetching replicated results.
Validated without a pod by `tests/test_multihost.py`, which spawns real
separate processes over a localhost coordinator on the CPU backend.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .mesh import EDGE_AXIS


def initialize(
    coordinator: str,
    num_processes: int,
    process_id: int,
    local_device_ids: Optional[list] = None,
):
    """`jax.distributed.initialize` wrapper. Call once per process,
    before any device use."""
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def global_mesh(axis: str = EDGE_AXIS) -> Mesh:
    """1-D mesh over ALL global devices (every process's chips)."""
    return Mesh(np.array(jax.devices()), (axis,))


def put_global(tree: Any, specs: Any, mesh: Mesh) -> Any:
    """Build global (possibly non-addressable) arrays from numpy data
    that every process holds identically.

    Each process materializes only its addressable shards; `specs` is a
    pytree of PartitionSpec matching `tree` (or a single spec applied to
    every leaf).
    """
    one_spec = isinstance(specs, PartitionSpec)

    def put(x, spec):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    if one_spec:
        return jax.tree.map(lambda x: put(x, specs), tree)
    return jax.tree.map(
        put, tree, specs,
        is_leaf=lambda n: isinstance(n, (np.ndarray, jax.Array)),
    )


def fetch_replicated(x: jax.Array) -> np.ndarray:
    """Fetch a fully-replicated global array's value on this process."""
    return np.asarray(x.addressable_data(0))
