"""Eval harness test: torch .pth checkpoint -> converted eval run."""

import numpy as np
import pytest
import torch
from PIL import Image

from dense2sparse_vit_tpu.experiments.eval_imagenet import (
    evaluate,
    load_torch_checkpoint,
)


@pytest.fixture(scope="module")
def tiny_imagenet(tmp_path_factory):
    root = tmp_path_factory.mktemp("val")
    rng = np.random.default_rng(0)
    for c in range(2):
        d = root / f"n{c:08d}"
        d.mkdir()
        for i in range(4):
            Image.fromarray(
                rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            ).save(d / f"{i}.JPEG".lower())
    return str(root)


@pytest.fixture(scope="module")
def fake_deit_tiny_ckpt(tmp_path_factory):
    """A .pth with DeiT-tiny key names/shapes (random weights)."""
    torch.manual_seed(0)
    d, depth, heads = 192, 12, 3
    sd = {
        "cls_token": torch.randn(1, 1, d) * 0.02,
        "pos_embed": torch.randn(1, 197, d) * 0.02,
        "patch_embed.proj.weight": torch.randn(d, 3, 16, 16) * 0.02,
        "patch_embed.proj.bias": torch.zeros(d),
        "norm.weight": torch.ones(d),
        "norm.bias": torch.zeros(d),
        "head.weight": torch.randn(1000, d) * 0.02,
        "head.bias": torch.zeros(1000),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": torch.ones(d),
            p + "norm1.bias": torch.zeros(d),
            p + "attn.qkv.weight": torch.randn(3 * d, d) * 0.02,
            p + "attn.qkv.bias": torch.zeros(3 * d),
            p + "attn.proj.weight": torch.randn(d, d) * 0.02,
            p + "attn.proj.bias": torch.zeros(d),
            p + "norm2.weight": torch.ones(d),
            p + "norm2.bias": torch.zeros(d),
            p + "mlp.fc1.weight": torch.randn(4 * d, d) * 0.02,
            p + "mlp.fc1.bias": torch.zeros(4 * d),
            p + "mlp.fc2.weight": torch.randn(d, 4 * d) * 0.02,
            p + "mlp.fc2.bias": torch.zeros(d),
        })
    path = tmp_path_factory.mktemp("ckpt") / "deit_tiny_fake.pth"
    torch.save({"model": sd}, path)
    return str(path)


class TestEvalHarness:
    def test_checkpoint_roundtrip_and_eval(self, tiny_imagenet, fake_deit_tiny_ckpt):
        sd = load_torch_checkpoint(fake_deit_tiny_ckpt)
        assert "cls_token" in sd and sd["pos_embed"].shape == (1, 197, 192)
        result = evaluate(
            arch="deit_tiny",
            imgnet_val_dir=tiny_imagenet,
            checkpoint=fake_deit_tiny_ckpt,
            pruning_locs=(3,),
            keep_ratios=(0.7,),
            batch_size=4,
            max_batches=1,
            dtype="float32",
            use_fused_attention=False,
        )
        assert result["images"] == 4
        assert 0.0 <= result["pruned_top1"] <= 1.0
        assert 0.0 <= result["unpruned_top1"] <= 1.0
