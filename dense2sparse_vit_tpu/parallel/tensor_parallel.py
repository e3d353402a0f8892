"""Tensor-parallel parameter sharding over the 'model' mesh axis.

The reference has no tensor parallelism (its only parallelism is DDP,
SURVEY.md section 2.3); ViT-S fits on one chip. This module exists for the
larger configs (ViT-B/L at big batches): Megatron-style column/row sharding
of each block's matmuls so activations stay batch-sharded and the only
collectives are per-block all-reduces that XLA inserts automatically:

  qkv kernel   (D, 3D)      column-sharded  P(None, 'model')
  attn proj    (D, D)       row-sharded     P('model', None)
  mlp fc1      (D, 4D)      column-sharded  P(None, 'model')
  mlp fc2      (4D, D)      row-sharded     P('model', None)
  biases of column-sharded layers follow their kernel; everything else
  (embeddings, norms, heads, predictor) is replicated.

With GSPMD there is no hand-written collective code: `shard_params` just
device_puts each leaf with its PartitionSpec and jit does the rest.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_partition_spec(path: str, leaf) -> P:
    """PartitionSpec for one parameter, from its tree path."""
    p = path.lower()
    is_block = "blocks_" in p
    if is_block and leaf.ndim == 2:
        if "qkv" in p or "fc1" in p:
            return P(None, "model")  # column parallel
        if ("attn" in p and "proj" in p) or "fc2" in p:
            return P("model", None)  # row parallel
    if is_block and leaf.ndim == 1 and ("qkv" in p or "fc1" in p) and (
        p.endswith("bias")
    ):
        return P("model")  # bias of a column-sharded kernel
    return P()  # replicated


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put every param with its tensor-parallel sharding."""

    def place(path, leaf):
        spec = param_partition_spec(_path_str(path), leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.device_put(tree, NamedSharding(mesh, P()))
