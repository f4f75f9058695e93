"""Device mesh utilities for multi-chip / multi-host scaling.

The reference has no distributed backend (SURVEY.md §2.3 P7 — its
parallelism is 4 pthreads in one process). The TPU-native scaling axis is
a `jax.sharding.Mesh`: map blocks (keyframes/points/edges) partition over
devices, reductions ride ICI collectives. This module centralizes mesh
construction so single-chip, multi-chip and multi-host (jax.distributed)
runs share code paths.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


EDGE_AXIS = "edges"  # canonical mesh axis name for observation sharding


def make_mesh(n_devices: Optional[int] = None, axis: str = EDGE_AXIS) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host initialization (jax.distributed). No-op when single-host
    args are absent — call sites can invoke unconditionally."""
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def edge_sharded(mesh: Mesh):
    return NamedSharding(mesh, P(EDGE_AXIS))
