"""One-command top-1 parity report: reference torch model vs the flax port.

BASELINE target #1 (within 0.2% of the reference at keep 0.7) needs published
weights this zero-egress environment cannot download. This harness makes the
measurement a single command for when a checkpoint IS available:

  python -m dense2sparse_vit_tpu.experiments.parity_report \
      --ref-ckpt dynamic_vit_deit_small.pth \
      --imgnet-val-dir /data/imagenet/val --max-batches 40

It builds the reference's own VisionTransformerDiffPruning
(/root/reference/vit_models/dynamic_vit.py:642-1015, imported through the
timm shim in tests/reference_loader.py), loads the checkpoint with
strict=False, re-dumps the MERGED state dict (checkpoint tensors + the torch
init for any keys the checkpoint lacks) and converts that onto the flax
student — so both sides run bit-identical weights even for dense/partial
checkpoints — then evaluates both on the same eval-transform batches and
reports pruned/unpruned top-1 per side plus the deltas.

The torch side runs on CPU (the reference's own eval loop, evaluate.py:8-85,
needs CUDA we don't have); default --max-batches keeps that tractable.
Coverage/padding semantics match eval_imagenet.py.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from dense2sparse_vit_tpu.core.config import (
    DataConfig,
    PruningConfig,
    deit_base,
    deit_small,
    deit_tiny,
)
from dense2sparse_vit_tpu.data import ImageFolder, eval_transform, make_loader
from dense2sparse_vit_tpu.models import DiffPruningStudent
from dense2sparse_vit_tpu.utils.convert import convert_student_state_dict

_SIZES = {"deit_tiny": deit_tiny, "deit_small": deit_small,
          "deit_base": deit_base}


def _load_reference_student(arch, pruning_locs, keep_ratios, ckpt_path,
                            small_predictor, predictor_bn, mask_loss_type):
    """Reference torch student with the checkpoint merged in (CPU, eval)."""
    sys.path.insert(0, "/root/repo/tests")
    import torch
    from reference_loader import load_reference_module

    ref = load_reference_module("dynamic_vit")
    cfg = _SIZES[arch]()
    torch.manual_seed(0)
    model = ref.VisionTransformerDiffPruning(
        img_size=cfg.img_size, patch_size=cfg.patch_size,
        embed_dim=cfg.embed_dim, depth=cfg.depth, num_heads=cfg.num_heads,
        num_classes=cfg.num_classes, pruning_loc=list(pruning_locs),
        token_ratio=list(keep_ratios), topk_selection=True,
        predictor_loss_type=mask_loss_type,
        small_predictor=small_predictor, predictor_bn=predictor_bn,
    )
    sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    for wrapper in ("model", "model_state_dict", "state_dict_ema",
                    "state_dict"):
        if wrapper in sd and not hasattr(sd[wrapper], "shape"):
            sd = sd[wrapper]
            break
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    model.eval()
    print(f"checkpoint: {len(sd)} tensors, "
          f"{len(missing)} missing (kept at torch init), "
          f"{len(unexpected)} unexpected (ignored)")
    return model, {k: v.detach().numpy() for k, v in model.state_dict().items()}


def parity_report(
    arch="deit_small",
    ref_ckpt=None,
    imgnet_val_dir="/data/imagenet/val",
    pruning_locs=(3, 6, 9),
    keep_ratios=(0.7, 0.49, 0.343),
    batch_size=64,
    max_batches=40,
    small_predictor=False,
    predictor_bn=False,
    mask_loss_type="kl_div",
    dtype="float32",
    num_workers=0,
):
    import torch

    torch_model, sd_full = _load_reference_student(
        arch, pruning_locs, keep_ratios, ref_ckpt,
        small_predictor, predictor_bn, mask_loss_type,
    )

    mcfg = _SIZES[arch](dtype=dtype)
    student = DiffPruningStudent(
        cfg=mcfg,
        pruning=PruningConfig(
            pruning_locs=tuple(pruning_locs),
            keep_ratios=tuple(keep_ratios),
            small_predictor=small_predictor,
            predictor_bn=predictor_bn,
            mask_loss_type=mask_loss_type,
        ),
    )
    sample = jnp.zeros((1, mcfg.img_size, mcfg.img_size, 3))
    variables = student.init(jax.random.PRNGKey(0), sample)
    if "batch_stats" not in variables:
        variables = {"params": variables["params"]}
    variables, loaded, skipped = convert_student_state_dict(sd_full, variables)
    real_skips = [k for k in skipped if "num_batches_tracked" not in k]
    if real_skips:
        raise RuntimeError(f"unconverted reference keys: {real_skips}")
    print(f"flax side: converted {len(loaded)} tensors")

    @jax.jit
    def flax_step(variables, images):
        out = student.apply(variables, images, collect_cls_attns=False)
        out_d = student.apply(
            variables, images, unpruned=True, collect_cls_attns=False
        )
        return out.logits, out_d.logits

    data_cfg = DataConfig(imgnet_val_dir=imgnet_val_dir)
    ds = ImageFolder(imgnet_val_dir, eval_transform(data_cfg))
    loader = make_loader(
        ds, batch_size, drop_last=False, num_workers=num_workers
    )

    counts = dict(ref_pruned=0, ref_dense=0, flax_pruned=0, flax_dense=0)
    total, max_logit_delta = 0, 0.0
    t0 = time.time()
    for i, (xb, yb) in enumerate(loader()):
        if max_batches and i >= max_batches:
            break
        xt = torch.tensor(xb).permute(0, 3, 1, 2).contiguous()
        with torch.no_grad():
            r_logits = torch_model(xt)[0].numpy()
            # the reference eval sets model.unpruned (evaluate.py:36) but
            # its forward never reads it — its "unpruned" metric is really
            # a second pruned pass. Mirror it faithfully: ref_dense tracks
            # that behavior, flax_dense is the implemented intent, so
            # compare pruned_delta for parity and treat dense_delta as
            # informational.
            torch_model.unpruned = True
            r_dense = torch_model(xt)[0].numpy()
            torch_model.unpruned = False
        f_logits, f_dense = jax.device_get(
            flax_step(variables, jnp.asarray(xb))
        )
        if i == 0:
            max_logit_delta = float(
                np.abs(np.asarray(f_logits, np.float32) - r_logits).max()
            )
        counts["ref_pruned"] += int((r_logits.argmax(-1) == yb).sum())
        counts["ref_dense"] += int((r_dense.argmax(-1) == yb).sum())
        counts["flax_pruned"] += int(
            (np.asarray(f_logits).argmax(-1) == yb).sum()
        )
        counts["flax_dense"] += int(
            (np.asarray(f_dense).argmax(-1) == yb).sum()
        )
        total += len(yb)

    top1 = {k: v / max(total, 1) for k, v in counts.items()}
    report = {
        "arch": arch,
        "checkpoint": ref_ckpt,
        "images": total,
        "keep_ratios": list(keep_ratios),
        **{f"{k}_top1": round(v, 4) for k, v in top1.items()},
        "pruned_delta": round(top1["flax_pruned"] - top1["ref_pruned"], 4),
        "dense_delta": round(top1["flax_dense"] - top1["ref_dense"], 4),
        "first_batch_max_logit_delta": max_logit_delta,
        "seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(report))
    within = abs(report["pruned_delta"]) <= 0.002
    print(f"BASELINE #1 (|pruned delta| <= 0.2%): "
          f"{'PASS' if within else 'FAIL'}")
    return report


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--arch", default="deit_small", choices=sorted(_SIZES))
    p.add_argument("--ref-ckpt", required=True)
    p.add_argument("--imgnet-val-dir", default="/data/imagenet/val")
    p.add_argument("--pruning-locs", nargs="+", type=int, default=[3, 6, 9])
    p.add_argument("--keep-ratios", nargs="+", type=float,
                   default=[0.7, 0.49, 0.343])
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--max-batches", type=int, default=40,
                   help="0 = full val set (slow: torch runs on CPU)")
    p.add_argument("--small-predictor", action="store_true")
    p.add_argument("--predictor-bn", action="store_true")
    p.add_argument("--mask-loss-type", default="kl_div")
    p.add_argument("--num-workers", type=int, default=0)
    a = p.parse_args()
    parity_report(
        arch=a.arch, ref_ckpt=a.ref_ckpt, imgnet_val_dir=a.imgnet_val_dir,
        pruning_locs=tuple(a.pruning_locs), keep_ratios=tuple(a.keep_ratios),
        batch_size=a.batch_size, max_batches=a.max_batches or None,
        small_predictor=a.small_predictor, predictor_bn=a.predictor_bn,
        mask_loss_type=a.mask_loss_type, num_workers=a.num_workers,
    )


if __name__ == "__main__":
    main()
