"""ImageNet evaluation / parity harness.

The reference's eval path (evaluate.py:8-85) reports pruned top-1, unpruned
top-1 of the same student, and teacher top-1 every epoch. This driver does
the same standalone, loading published DeiT checkpoints (torch .pth) through
the converter — the parity check for BASELINE.json config targets.

Zero-egress note: this environment cannot download the DeiT release
checkpoints; the harness takes a local path. The conversion itself is
validated bit-for-bit against an independent torch ViT forward in
tests/test_convert.py.

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

from dense2sparse_vit_tpu.core.config import deit_small, deit_tiny, deit_base
from dense2sparse_vit_tpu.core.config import DataConfig, PruningConfig
from dense2sparse_vit_tpu.data import ImageFolder, eval_transform, make_loader
from dense2sparse_vit_tpu.models import DiffPruningStudent
from dense2sparse_vit_tpu.utils.convert import convert_deit_state_dict


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch .pth state dict as numpy arrays (host-side, torch CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in sd and not hasattr(sd["model"], "shape"):
        sd = sd["model"]
    return {k: v.numpy() for k, v in sd.items()}


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
) -> dict:
    sizes = {"deit_tiny": deit_tiny, "deit_small": deit_small,
             "deit_base": deit_base}
    model_cfg = sizes[arch](
        dtype=dtype, use_fused_attention=use_fused_attention
    )
    student = DiffPruningStudent(
        cfg=model_cfg,
        pruning=PruningConfig(
            pruning_locs=tuple(pruning_locs), keep_ratios=tuple(keep_ratios)
        ),
    )
    sample = jnp.zeros((1, model_cfg.img_size, model_cfg.img_size, 3))
    params = student.init(jax.random.PRNGKey(0), sample)["params"]
    if checkpoint:
        sd = load_torch_checkpoint(checkpoint)
        params, loaded, skipped = convert_deit_state_dict(sd, params)
        print(f"loaded {len(loaded)} tensors, skipped {len(skipped)}")

    data_cfg = DataConfig(imgnet_val_dir=imgnet_val_dir)
    ds = ImageFolder(imgnet_val_dir, eval_transform(data_cfg))
    loader = make_loader(ds, batch_size, drop_last=True)

    @jax.jit
    def step(params, images, labels):
        out = student.apply(
            {"params": params}, images, collect_cls_attns=False
        )
        out_dense = student.apply(
            {"params": params}, images, unpruned=True, collect_cls_attns=False
        )
        return (
            jnp.sum(jnp.argmax(out.logits, -1) == labels),
            jnp.sum(jnp.argmax(out_dense.logits, -1) == labels),
        )

    correct = correct_dense = total = 0
    t0 = time.time()
    for i, (xb, yb) in enumerate(loader()):
        if max_batches and i >= max_batches:
            break
        c, cd = step(params, jnp.asarray(xb), jnp.asarray(yb))
        correct += int(c)
        correct_dense += int(cd)
        total += len(yb)
    dt = time.time() - t0
    result = {
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
    args = p.parse_args()
    evaluate(
        arch=args.arch,
        imgnet_val_dir=args.imgnet_val_dir,
        checkpoint=args.checkpoint,
        pruning_locs=args.pruning_locs,
        keep_ratios=args.keep_ratios,
        batch_size=args.batch_size,
        max_batches=args.max_batches,
    )


if __name__ == "__main__":  # pragma: no cover
    main()
