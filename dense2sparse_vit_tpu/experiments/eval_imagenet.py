"""ImageNet evaluation / parity harness.

The reference's eval path (evaluate.py:8-85) reports pruned top-1, unpruned
top-1 of the same student, and teacher top-1 every epoch. This driver does
the same standalone, loading published checkpoints (torch .pth/.pth.tar)
through the converters — the parity check for BASELINE.json config targets.

Supported --arch values:
  deit_tiny/deit_small/deit_base       pruned student (convert_deit_state_dict)
  t2t_vit_7/10/12/14/19/24, t2t_vit_t_14/19/24
                                       plain T2T backbone (convert_t2t_state_dict;
                                       checkpoint-name accuracies 71.7-82.6 are
                                       the anchors, t2t_vit.py:186-277)
  dino_tiny/dino_small/dino_base       plain DINO backbone (headless
                                       checkpoints, convert_dino_state_dict)

Every image in the val set is counted: the final short batch is padded to
the batch size and masked with label -1, and the result asserts coverage
(fixes the reference-style drop_last tail loss — 50000 % 128 = 80 images).

Zero-egress note: this environment cannot download the published
checkpoints; the harness takes a local path. The conversions are validated
against the reference's own torch models in tests/test_reference_parity.py
and tests/test_convert_t2t_dino.py.

Usage:
  python -m dense2sparse_vit_tpu.experiments.eval_imagenet \
      --imgnet-val-dir /data/imagenet/val \
      --checkpoint deit_small_patch16_224-cd65a155.pth \
      --keep-ratios 0.7 0.49 0.343 --pruning-locs 3 6 9
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dense2sparse_vit_tpu.core.config import (
    DataConfig,
    ModelConfig,
    PruningConfig,
    deit_base,
    deit_small,
    deit_tiny,
)
from dense2sparse_vit_tpu.data import ImageFolder, eval_transform, make_loader
from dense2sparse_vit_tpu.models import DiffPruningStudent
from dense2sparse_vit_tpu.utils.convert import (
    convert_deit_state_dict,
    convert_dino_state_dict,
    convert_t2t_state_dict,
)

# T2T factory shapes (t2t_vit.py:181-301): embed, depth, heads, mlp, type
_T2T_SHAPES = {
    "t2t_vit_7": (256, 7, 4, 2.0, "performer"),
    "t2t_vit_10": (256, 10, 4, 2.0, "performer"),
    "t2t_vit_12": (256, 12, 4, 2.0, "performer"),
    "t2t_vit_14": (384, 14, 6, 3.0, "performer"),
    "t2t_vit_19": (448, 19, 7, 3.0, "performer"),
    "t2t_vit_24": (512, 24, 8, 3.0, "performer"),
    "t2t_vit_t_14": (384, 14, 6, 3.0, "transformer"),
    "t2t_vit_t_19": (448, 19, 7, 3.0, "transformer"),
    "t2t_vit_t_24": (512, 24, 8, 3.0, "transformer"),
}
# DINO backbone shapes (dino.py:503-588)
_DINO_SHAPES = {
    "dino_tiny": (192, 12, 3),
    "dino_small": (384, 12, 6),
    "dino_base": (768, 12, 12),
}


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch .pth/.pth.tar checkpoint as numpy arrays (CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # unwrap common containers; converters handle the rest
    for wrapper in ("model", "state_dict_ema", "state_dict"):
        if wrapper in sd and not hasattr(sd[wrapper], "shape"):
            sd = sd[wrapper]
            break
    return {k: v.numpy() for k, v in sd.items()}


def build_model(arch, pruning_locs, keep_ratios, dtype, use_fused_attention):
    """Returns (module, apply_logits_fn_factory, converter, has_unpruned)."""
    if arch in ("deit_tiny", "deit_small", "deit_base"):
        sizes = {"deit_tiny": deit_tiny, "deit_small": deit_small,
                 "deit_base": deit_base}
        cfg = sizes[arch](dtype=dtype, use_fused_attention=use_fused_attention)
        model = DiffPruningStudent(
            cfg=cfg,
            pruning=PruningConfig(
                pruning_locs=tuple(pruning_locs),
                keep_ratios=tuple(keep_ratios),
            ),
        )

        def logits_fn(params, images, unpruned=False):
            out = model.apply(
                {"params": params}, images,
                unpruned=unpruned, collect_cls_attns=False,
            )
            return out.logits

        return model, logits_fn, convert_deit_state_dict, True

    if arch in _T2T_SHAPES:
        from dense2sparse_vit_tpu.models.t2t import T2TViT

        d, depth, heads, mlp, tokens_type = _T2T_SHAPES[arch]
        cfg = ModelConfig(
            embed_dim=d, depth=depth, num_heads=heads, mlp_ratio=mlp,
            qkv_bias=False, layer_norm_eps=1e-5, dtype=dtype,
            use_fused_attention=use_fused_attention,
        )
        model = T2TViT(cfg=cfg, tokens_type=tokens_type)

        def logits_fn(params, images, unpruned=False):
            return model.apply({"params": params}, images)

        return model, logits_fn, convert_t2t_state_dict, False

    if arch in _DINO_SHAPES:
        from dense2sparse_vit_tpu.models.dino import DINOViT

        d, depth, heads = _DINO_SHAPES[arch]
        cfg = ModelConfig(
            embed_dim=d, depth=depth, num_heads=heads, qkv_bias=True,
            layer_norm_eps=1e-6, dtype=dtype,
            use_fused_attention=use_fused_attention,
        )
        model = DINOViT(cfg=cfg)

        def logits_fn(params, images, unpruned=False):
            return model.apply({"params": params}, images)

        return model, logits_fn, convert_dino_state_dict, False

    raise ValueError(f"unknown arch {arch!r}")


def evaluate(
    arch: str = "deit_small",
    imgnet_val_dir: str = "/data/imagenet/val",
    checkpoint: Optional[str] = None,
    pruning_locs=(3, 6, 9),
    keep_ratios=(0.7, 0.49, 0.343),
    batch_size: int = 128,
    max_batches: Optional[int] = None,
    dtype: str = "bfloat16",
    use_fused_attention: bool = True,
    num_workers: int = 0,
) -> dict:
    model, logits_fn, converter, has_unpruned = build_model(
        arch, pruning_locs, keep_ratios, dtype, use_fused_attention
    )
    img_size = model.cfg.img_size
    sample = jnp.zeros((1, img_size, img_size, 3))
    params = model.init(jax.random.PRNGKey(0), sample)["params"]
    if checkpoint:
        sd = load_torch_checkpoint(checkpoint)
        params, loaded, skipped = converter(sd, params)
        print(f"loaded {len(loaded)} tensors, skipped {len(skipped)}")

    data_cfg = DataConfig(imgnet_val_dir=imgnet_val_dir)
    # uint8 to the chip (4x fewer host->device bytes); normalization is
    # fused into the jitted step below
    ds = ImageFolder(imgnet_val_dir, eval_transform(data_cfg, normalize=False))
    # full coverage: keep the tail batch (padded below), never drop images
    loader = make_loader(
        ds, batch_size, drop_last=False, num_workers=num_workers,
        as_uint8=True,
    )

    @jax.jit
    def step(params, images, labels):
        from dense2sparse_vit_tpu.data.pipeline import device_normalize

        images = device_normalize(images, data_cfg)
        # label -1 marks padding -> contributes to neither count nor total
        valid = labels >= 0
        pruned = jnp.argmax(logits_fn(params, images), -1) == labels
        c = jnp.sum(pruned & valid)
        if has_unpruned:
            dense = (
                jnp.argmax(logits_fn(params, images, unpruned=True), -1)
                == labels
            )
            cd = jnp.sum(dense & valid)
        else:
            cd = c
        return c, cd, jnp.sum(valid)

    correct = correct_dense = total = 0
    t0 = time.time()
    for i, (xb, yb) in enumerate(loader()):
        if max_batches and i >= max_batches:
            break
        if len(yb) < batch_size:  # pad the tail batch, mask with label -1
            pad = batch_size - len(yb)
            xb = np.concatenate([xb, np.zeros((pad,) + xb.shape[1:], xb.dtype)])
            yb = np.concatenate([yb, np.full((pad,), -1, yb.dtype)])
        c, cd, n = step(params, jnp.asarray(xb), jnp.asarray(yb))
        correct += int(c)
        correct_dense += int(cd)
        total += int(n)
    dt = time.time() - t0
    if max_batches is None and total != len(ds):
        raise AssertionError(
            f"eval covered {total} of {len(ds)} images — coverage bug"
        )
    result = {
        "arch": arch,
        "pruned_top1": correct / max(total, 1),
        "unpruned_top1": correct_dense / max(total, 1),
        "images": total,
        "seconds": round(dt, 1),
        "keep_ratios": list(keep_ratios),
        "pruning_locs": list(pruning_locs),
        "checkpoint": checkpoint,
    }
    print(json.dumps(result))
    return result


def main():  # pragma: no cover - thin CLI
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="deit_small")
    p.add_argument("--imgnet-val-dir", default="/data/imagenet/val")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--pruning-locs", nargs="+", type=int, default=[3, 6, 9])
    p.add_argument("--keep-ratios", nargs="+", type=float,
                   default=[0.7, 0.49, 0.343])
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--num-workers", type=int, default=0)
    args = p.parse_args()
    evaluate(
        arch=args.arch,
        imgnet_val_dir=args.imgnet_val_dir,
        checkpoint=args.checkpoint,
        pruning_locs=args.pruning_locs,
        keep_ratios=args.keep_ratios,
        batch_size=args.batch_size,
        max_batches=args.max_batches,
        num_workers=args.num_workers,
    )


if __name__ == "__main__":  # pragma: no cover
    main()
