"""Parallelism utilities: device meshes, shardings, cross-replica reductions.

The reference's only parallelism is single-node DDP over NCCL
(/root/reference/ddp_training.py); here parallelism is SPMD over a
jax.sharding.Mesh — these helpers are re-exported from core.mesh plus a few
collective conveniences.
"""

from dense2sparse_vit_tpu.core.mesh import (  # noqa: F401
    batch_sharding,
    host_local_batch,
    is_primary,
    make_mesh,
    replicated_sharding,
)

import jax


def all_reduce_mean(tree, axis_name: str = "data"):
    """Mean-reduce a metric pytree across the data axis (inside shard_map /
    pmap bodies). Replaces dist.reduce(SUM -> rank0) + divide
    (ddp_training.py:174-177)."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(x, axis_name), tree
    )


def global_batch_metrics(metrics):
    """Under jit+GSPMD, metrics computed from sharded batches are already
    global (XLA inserts the collectives); this is the identity, kept for
    call-site symmetry with the DDP code it replaces."""
    return metrics
