"""Device mesh + sharding helpers.

TPU-native replacement for the reference's DDP/NCCL machinery
(/root/reference/ddp_training.py:4-8, ddp_hello_world.py:77-82): instead of a
process group with user-managed collectives we build a `jax.sharding.Mesh`
over ICI and annotate shardings; XLA inserts the collectives.

Axis convention:
  - 'data'  : batch sharding (replaces DistributedSampler per-rank splits)
  - 'model' : optional tensor-parallel axis (absent in the reference; we keep
    it in the mesh so heads/MLP can shard on larger configs)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Create a ('data', 'model') mesh over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if data is None:
        data = devices.size // model
    if data * model != devices.size:
        raise ValueError(
            f"mesh {data}x{model} does not cover {devices.size} devices"
        )
    return Mesh(devices.reshape(data, model), ("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def host_local_batch(global_batch: int, mesh: Mesh) -> int:
    """Per-data-shard batch size; errors on indivisibility (static shapes)."""
    n = mesh.shape["data"]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n}")
    return global_batch // n


def is_primary() -> bool:
    """Host-0 gating for logging/viz (replaces rank-0 blocks,
    ddp_training.py:50-57,178-211)."""
    return jax.process_index() == 0
