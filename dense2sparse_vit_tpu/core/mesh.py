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


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join a multi-host JAX cluster over DCN when configured.

    The reference's multi-process entry is mp.spawn + TCP rendezvous +
    dist.init_process_group("nccl") (mask_predictor.py:160-162,
    ddp_training.py:4-8). The JAX equivalent is ONE call per host:
    `jax.distributed.initialize` — after it, jax.devices() spans every
    host's chips and the same single-controller GSPMD code runs unchanged;
    XLA routes collectives over ICI within a slice and DCN across hosts.

    Explicit args win; otherwise standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a
    cluster env JAX auto-detects, e.g. SLURM) are used. Returns True if
    distributed mode was initialized.
    """
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_local_indices(indices) -> "np.ndarray":
    """This host's shard of a dataset index list (round-robin by process).

    Replaces torch DistributedSampler's per-rank split
    (ddp_training.py:15-16): each host's loader only decodes its own slice;
    the global batch is assembled with `put_global_batch`.
    """
    indices = np.asarray(indices)
    return indices[jax.process_index()::jax.process_count()]


def put_global_batch(sharding, local_np):
    """Form a global device array from per-host local rows.

    Single-process: a plain device_put. Multi-host: each process contributes
    its local rows (global_batch // process_count of them) and JAX assembles
    the (globally-sharded, globally-addressable) array — the DCN-side input
    path the reference implements with per-rank DataLoaders.
    """
    local_np = np.asarray(local_np)
    if jax.process_count() == 1:
        return jax.device_put(local_np, sharding)
    return jax.make_array_from_process_local_data(sharding, local_np)


def put_global_batch_from_full(sharding, full_np):
    """Form a global device array when EVERY host holds the full batch
    (used for validation: identical batching on all hosts keeps coverage
    exact without cross-host index bookkeeping). Each host contributes the
    rows its devices own, resolved from the sharding itself."""
    full_np = np.asarray(full_np)
    if jax.process_count() == 1:
        return jax.device_put(full_np, sharding)
    return jax.make_array_from_callback(
        full_np.shape, sharding, lambda idx: full_np[idx]
    )
