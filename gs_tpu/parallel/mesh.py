"""Device mesh construction + runtime init.

The reference is single-process/single-GPU (SURVEY.md §2.4: pins cuda:0,
no distributed code). Multi-chip capability is new here, built the TPU way:
a ``jax.sharding.Mesh`` with two logical axes —

  - ``data``: data parallel over cameras (batch of viewpoints per step)
  - ``shard``: shards image tiles during compositing (forward) and is reduced
    over for Gaussian parameter gradients (backward)

Collectives ride ICI within a slice via XLA (psum / all_gather inserted by
shard_map); DCN across hosts after ``jax.distributed.initialize``.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SHARD_AXIS = "shard"


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host runtime init (no-op single-host)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(data: int = 1, shard: int | None = None, devices=None) -> Mesh:
    """Build a (data, shard) mesh. shard defaults to all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if shard is None:
        if n % data != 0:
            raise ValueError(f"{n} devices not divisible by data={data}")
        shard = n // data
    if data * shard != n:
        raise ValueError(f"mesh {data}x{shard} != {n} devices")
    return Mesh(devices.reshape(data, shard), (DATA_AXIS, SHARD_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))
