"""dense2sparse_vit_tpu — TPU-native dynamic token pruning for Vision Transformers.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
Dense2Sparse-ViT reference (dynamic token pruning of ViTs on ImageNet: a frozen
dense teacher supervises a pruned student whose MLP mask-predictor scores patch
tokens at configurable encoder depths), redesigned TPU-first:

- static shapes everywhere: fixed keep ratios become compile-time-known K, so
  post-pruning blocks run on statically smaller sequences; threshold pruning is
  policy-masked compute, never ragged gathers
  (contrast: reference gathers data-dependent token counts,
  /root/reference/vit_models/dynamic_vit.py:948,960)
- fused Pallas policy-masked attention kernels for the hot path
- SPMD data parallelism via jax.sharding.Mesh + shard_map
  (replaces torch DDP/NCCL, /root/reference/ddp_training.py:8)
"""

__version__ = "0.1.0"

from dense2sparse_vit_tpu.core.config import (  # noqa: F401
    ModelConfig,
    PruningConfig,
    TrainConfig,
    DataConfig,
    ExperimentConfig,
)
