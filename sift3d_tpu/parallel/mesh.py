"""Device mesh construction.

The reference has no distributed backend (OpenMP only; SURVEY §5.8). The
TPU-native design shards work over a `jax.sharding.Mesh` with two axes:

- "data": independent volumes / registration pairs (DP analog);
- "space": spatial partitioning of one volume along z with halo exchange
  (the sequence/context-parallel analog - SURVEY §5.7).

Collectives ride ICI via shard_map + ppermute/psum/all_gather.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def factor_devices(n: int, max_space: int = 4) -> tuple[int, int]:
    """Split n devices into (data, space) with space a small power of 2."""
    space = 1
    while space * 2 <= max_space and n % (space * 2) == 0:
        space *= 2
    return n // space, space


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize JAX multi-host execution (DCN analog, SURVEY §5.8).

    A thin wrapper over jax.distributed.initialize: after this,
    jax.devices() spans all hosts and make_mesh() builds a global mesh
    whose "data" axis crosses hosts (volume-corpus sharding) while
    "space" stays within a host's ICI domain. No-ops under a single
    process so the same launch script works everywhere.
    """
    import jax
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(devices=None, data: int | None = None,
              space: int | None = None) -> Mesh:
    """Build a (data, space) mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None or space is None:
        data, space = factor_devices(n)
    if data * space != n:
        raise ValueError(f"data*space = {data * space} != {n} devices")
    arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, ("data", "space"))
