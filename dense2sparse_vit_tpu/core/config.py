"""Typed configuration system.

Replaces the reference's single argparse namespace of ~45 flags
(/root/reference/utils.py:182-317) with typed, hierarchical dataclasses.
Every reference flag has a field here; runtime-mutated grab-bag entries
(device, nb_classes, current_sigma, ...) become explicit fields or function
arguments instead of namespace mutation.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Backbone architecture (reference: dynamic_vit.py factory kwargs)."""

    img_size: int = 224
    patch_size: int = 16
    # input channels — informational: flax's Conv infers C from the input
    # array, so PatchEmbed honors whatever the pipeline ships; the field
    # exists for constructor parity (dynamic_vit.py:644) and config dumps
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    layer_norm_eps: float = 1e-6
    # compute dtype for activations; params/accumulation stay fp32
    dtype: str = "float32"
    # use the fused Pallas attention kernel (TPU inference hot path); the
    # jnp reference path is used automatically wherever CLS-attention
    # capture or attention dropout is required
    use_fused_attention: bool = False
    # "int8": post-training-quantized projections on the deterministic
    # dense serving path (ops/pallas/quant.py) — eval/export only;
    # training and policy-mask paths stay bf16/fp32. No reference
    # counterpart (beyond-parity serving machinery).
    quant: str = "none"
    # rematerialize encoder blocks under grad (jax.checkpoint): trades
    # recompute FLOPs for activation memory — the lever for ViT-L/H-scale
    # training (no reference counterpart; torch calls this
    # activation/gradient checkpointing)
    remat: bool = False

    def __post_init__(self):
        if self.quant not in ("none", "int8"):
            raise ValueError(f"unknown quant mode {self.quant!r}")
        if self.quant == "int8" and not self.use_fused_attention:
            raise ValueError(
                "quant='int8' runs through the fused block kernels; set "
                "use_fused_attention=True"
            )

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


# canonical DeiT-shape sizes (reference: dynamic_vit.py:1216-1381 factories)
def deit_tiny(**kw) -> ModelConfig:
    return ModelConfig(embed_dim=192, num_heads=3, **kw)


def deit_small(**kw) -> ModelConfig:
    return ModelConfig(embed_dim=384, num_heads=6, **kw)


def deit_base(**kw) -> ModelConfig:
    return ModelConfig(embed_dim=768, num_heads=12, **kw)


@dataclass(frozen=True)
class PruningConfig:
    """Token-pruning machinery config.

    Mirrors the pruning flags of the reference (utils.py:221-279) plus the
    VisionTransformerDiffPruning constructor args (dynamic_vit.py:648-653).
    """

    # encoder layer indices where a pruning stage sits (reference --pruning-locs)
    pruning_locs: Tuple[int, ...] = (3,)
    # keep ratio per stage, relative to the ORIGINAL spatial token count
    # (reference computes K = int(196 * ratio), dynamic_vit.py:852)
    keep_ratios: Tuple[float, ...] = (0.7,)
    # selection mode: 'topk' (differentiable perturbed top-k scores, hard
    # gather; reference --topk-selection), 'gumbel' (DynamicViT-style
    # gumbel-softmax policy masking), 'attn' (CLS-attention based,
    # --attn-selection), 'random' (--random-drop)
    selection: str = "topk"
    # threshold pruning: cumulative sorted-score mass threshold; when set,
    # keep counts are data-dependent so compute stays static-shape and masked
    # (reference --patch-score-threshold; dynamic_vit.py:880-894)
    patch_score_threshold: Optional[float] = None
    # parity-only: the reference stores this constructor arg and never reads
    # it anywhere (dynamic_vit.py:651,741 are its only occurrences); kept so
    # configs round-trip, intentionally unconsumed here too
    attn_selection_threshold: float = 0.0
    # predictor head (reference --small-predictor / --predictor-bn)
    small_predictor: bool = False
    predictor_bn: bool = False
    # 'kl_div' | 'mse' | 'bce' — controls predictor output normalization too
    # (reference --mask-loss-type; PredictorLG loss_type, dynamic_vit.py:549-554)
    mask_loss_type: str = "kl_div"
    # perturbed top-k (reference peturbed_topk.py; --initial-sigma)
    topk_num_samples: int = 500
    initial_sigma: float = 0.05
    # train-time differentiable selection: soft-gather kept tokens with the
    # perturbed-top-k indicator matrix so gradients reach the predictor
    # through the selection itself (the reference's commented intent,
    # dynamic_vit.py:556,896-897)
    differentiable_topk: bool = False
    # TPU-native freebie: sequences are padded to 16-token tiles by the MXU
    # tiling anyway (bf16 sublane), so rounding each K UP until K+1 (with
    # CLS) fills its tile keeps MORE tokens at zero extra compute —
    # e.g. the DeiT-S 0.7 schedule's (137, 96, 67) becomes (143, 111, 79),
    # same padded shapes, strictly more information retained
    pad_keep_to_tile: bool = False
    # use mean over heads instead of max for teacher CLS-attn aggregation
    mean_heads: bool = False
    # take CLS attention from the frozen teacher instead of the student
    cls_from_teacher: bool = False
    early_exit: bool = False

    def __post_init__(self):
        if len(self.pruning_locs) != len(self.keep_ratios):
            raise ValueError(
                f"pruning_locs ({self.pruning_locs}) and keep_ratios "
                f"({self.keep_ratios}) must have equal length"
            )
        if self.selection not in ("topk", "gumbel", "attn", "random"):
            raise ValueError(f"unknown selection mode {self.selection!r}")
        if self.mask_loss_type not in ("kl_div", "mse", "bce"):
            raise ValueError(f"unknown mask_loss_type {self.mask_loss_type!r}")

    def keep_counts(self, num_patches: int) -> Tuple[int, ...]:
        """Static per-stage kept-token counts K_i = int(N * r_i).

        Matches reference semantics: ratios are always relative to the
        original spatial token count (dynamic_vit.py:828,852). With
        pad_keep_to_tile, each K is rounded up so K+1 (the CLS-inclusive
        sequence) fills a 16-token tile — free extra tokens on TPU.
        """
        counts = [int(num_patches * r) for r in self.keep_ratios]
        if self.pad_keep_to_tile:
            counts = [
                min(num_patches, -(-(k + 1) // 16) * 16 - 1) for k in counts
            ]
        return tuple(counts)

    def replace(self, **kw) -> "PruningConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class TrainConfig:
    """Optimizer / schedule / loss weights (reference utils.py:208-244)."""

    batch_size: int = 64
    epochs: int = 25
    lr: float = 5e-4
    warmup_lr: float = 1e-6
    min_lr: float = 1e-5
    weight_decay: float = 0.05
    # epochs during which the backbone stays frozen and only the predictor
    # trains (reference --warmup-steps; utils.py:112-127)
    warmup_epochs: int = 5
    freeze_backbone: bool = False
    # loss term switches/weights (reference --use-ratio-loss etc.)
    softmax_temp: float = 1.0
    use_ratio_loss: bool = False
    ratio_weight: float = 2.0
    use_token_dist_loss: bool = False
    dist_weight: float = 0.5
    cls_weight: float = 1.0
    teacher_cls_loss: bool = False
    # backbone lr cap factor after warmup: backbone_lr = min(lr*0.01, cos_lr)
    # (utils.py:127)
    backbone_lr_scale: float = 0.01
    # gradient accumulation: average grads over this many micro-steps before
    # each optimizer update (effective batch = batch_size * grad_accum_steps;
    # no reference counterpart — single-chip lever for large batches)
    grad_accum_steps: int = 1
    # in-epoch progress cadence: print/log running-mean train metrics every
    # N steps (reference prints every 10/400 steps, train.py:59-62)
    log_every_steps: int = 400
    # frozen-teacher output cache: precompute teacher logits/tokens/targets
    # once (the teacher never updates, reference train.py:40) and skip its
    # forward in every train step. Requires mixup off and deterministic
    # train views — run_experiment enforces both (train/teacher_cache.py)
    teacher_cache: bool = False
    # HBM budget for the device-resident cache (teacher rows + decoded
    # uint8 images + labels); over budget it degrades gracefully to
    # teacher-rows-only, then to host-side rows (train/teacher_cache.py)
    device_cache_gb: float = 6.0
    # flattened AdamW (train/flat_optimizer.py): identical updates computed
    # on one raveled vector — a handful of large fused ops instead of one
    # small kernel chain per parameter leaf. Right choice for the
    # data-parallel driver (params replicated); set False under tensor
    # parallelism, where per-leaf moments inherit the leaf sharding
    flat_optimizer: bool = True
    seed: int = 42

    def __post_init__(self):
        if self.grad_accum_steps < 1:
            raise ValueError(
                f"grad_accum_steps must be >= 1, got {self.grad_accum_steps}"
            )
        if self.batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {self.batch_size}")

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class DataConfig:
    """Data/augmentation config (reference utils.py:281-315, build_data_sets.py)."""

    imgnet_val_dir: str = "/data/imagenet/val"
    num_classes: int = 1000
    # host-side decode parallelism (torch DataLoader num_workers parity,
    # mask_predictor.py:249-259); 0 = in-process
    num_workers: int = 0
    # augmentation
    color_jitter: float = 0.4
    auto_augment: str = "rand-m9-mstd0.5-inc1"
    smoothing: float = 0.1
    train_interpolation: str = "bicubic"
    repeated_aug: bool = True
    reprob: float = 0.25  # random erasing prob
    remode: str = "pixel"
    recount: int = 1
    # mixup/cutmix (timm Mixup parity, mask_predictor.py:261-267)
    mixup: float = 0.8
    cutmix: float = 1.0
    cutmix_minmax: Optional[Tuple[float, float]] = None
    mixup_prob: float = 1.0
    mixup_switch_prob: float = 0.5
    mixup_mode: str = "batch"
    # eval transform
    eval_resize: int = 256
    eval_crop: int = 224
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)

    def replace(self, **kw) -> "DataConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class ExperimentConfig:
    """Top-level experiment config = the full flag surface."""

    arch: str = "deit_small"
    model: ModelConfig = field(default_factory=deit_small)
    pruning: PruningConfig = field(default_factory=PruningConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    save_path: str = "test_imgs/"
    wandb: bool = False
    visualize_patch_drop: bool = False
    visualize_cls_attn_evo: bool = False

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


def experiment_for_arch(
    arch: str,
    pruning_locs: Sequence[int] = (3,),
    keep_ratios: Sequence[float] = (0.7,),
    **kw,
) -> ExperimentConfig:
    """Build an ExperimentConfig from an arch name.

    Replaces the `--arch` dispatch of the reference (mask_predictor.py:174-203).
    """
    sizes = {"deit_tiny": deit_tiny, "deit_small": deit_small, "deit_base": deit_base}
    if arch not in sizes:
        raise ValueError(f"unknown arch {arch!r}; options: {sorted(sizes)}")
    return ExperimentConfig(
        arch=arch,
        model=sizes[arch](),
        pruning=PruningConfig(
            pruning_locs=tuple(pruning_locs), keep_ratios=tuple(keep_ratios)
        ),
        **kw,
    )
