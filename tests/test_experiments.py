"""Tests for CLI, experiment drivers, SPMD hello world, profiling."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from dense2sparse_vit_tpu.cli import args_to_config, build_parser
from dense2sparse_vit_tpu.core.config import ModelConfig, PruningConfig
from dense2sparse_vit_tpu.experiments.display_patch_drop import (
    UnlabeledImageFolder,
    attention_keep_mask,
    generate_patch_drop_masked_image,
)
from dense2sparse_vit_tpu.experiments.optimized_mask import run_optimized_mask
from dense2sparse_vit_tpu.experiments.spmd_hello_world import (
    make_synthetic_data,
    train,
)
from dense2sparse_vit_tpu.core.mesh import make_mesh
from dense2sparse_vit_tpu.models.deit import DeiT
from dense2sparse_vit_tpu.utils.profiling import flops_of

TINY = ModelConfig(
    img_size=32, patch_size=8, embed_dim=16, depth=2, num_heads=2,
    num_classes=5,
)


class TestCLI:
    def test_defaults_match_reference(self):
        args = build_parser().parse_args([])
        cfg = args_to_config(args)
        assert cfg.train.batch_size == 64
        assert cfg.train.epochs == 25
        assert cfg.train.lr == 5e-4
        assert cfg.pruning.pruning_locs == (3,)
        assert cfg.pruning.keep_ratios == (0.3,)
        assert cfg.data.auto_augment == "rand-m9-mstd0.5-inc1"
        assert cfg.data.mixup == 0.8

    def test_flag_round_trip(self):
        args = build_parser().parse_args(
            [
                "--arch", "deit_tiny", "--pruning-locs", "3", "6", "9",
                "--keep-ratios", "0.7", "0.49", "0.343", "--topk-selection",
                "--small-predictor", "--predictor-bn", "--mask-loss-type",
                "mse", "--patch-score-threshold", "0.5", "--freeze-backbone",
                "--use-fused-attention", "--dtype", "bfloat16",
            ]
        )
        cfg = args_to_config(args)
        assert cfg.model.embed_dim == 192
        assert cfg.pruning.pruning_locs == (3, 6, 9)
        assert cfg.pruning.patch_score_threshold == 0.5
        assert cfg.pruning.small_predictor and cfg.pruning.predictor_bn
        assert cfg.pruning.mask_loss_type == "mse"
        assert cfg.train.freeze_backbone
        assert cfg.model.use_fused_attention
        assert cfg.model.dtype == "bfloat16"

    def test_selection_mode_flags(self):
        for flags, mode in (
            (["--attn-selection"], "attn"),
            (["--random-drop"], "random"),
            (["--topk-selection"], "topk"),
        ):
            cfg = args_to_config(build_parser().parse_args(flags))
            assert cfg.pruning.selection == mode


class TestOptimizedMask:
    def test_mask_logits_learn(self, tmp_path):
        imgs = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
        labels = jnp.array([0, 1, 2, 3])
        ml, history = run_optimized_mask(
            imgs, labels, num_epochs=3, cfg=TINY, save_dir=str(tmp_path),
            viz_every=2,
        )
        assert ml.shape == (16, 2)
        assert len(history) == 3
        assert all(np.isfinite(h["kd_ce"]) for h in history)
        assert any(
            f.startswith("optimized_mask_epoch") for f in os.listdir(tmp_path)
        )


class TestDisplayPatchDrop:
    def test_attention_keep_mask_mass_semantics(self):
        attn = np.array([[0.4, 0.3, 0.2, 0.05, 0.05]], np.float32)
        # drop 50% of mass from the foreground: 0.4 dropped (next would
        # exceed 0.5) -> patch 0 dropped
        keep_fg = attention_keep_mask(attn, 0.5, foreground=True)
        np.testing.assert_array_equal(keep_fg[0], [0, 1, 1, 1, 1])
        # background: 0.05+0.05+0.2 = 0.3 <= 0.5, +0.3 would hit 0.6 > 0.5
        keep_bg = attention_keep_mask(attn, 0.5, foreground=False)
        np.testing.assert_array_equal(keep_bg[0], [1, 1, 0, 0, 0])

    def test_unlabeled_folder_and_grids(self, tmp_path):
        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.default_rng(0)
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")
        ds = UnlabeledImageFolder(str(d))
        assert len(ds) == 3

        model = DeiT(cfg=TINY)
        imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(2), imgs)
        files = generate_patch_drop_masked_image(
            model, variables, imgs, str(tmp_path / "out"),
            patch_size=8, drop_rates=(0.3, 0.6),
        )
        assert len(files) == 4  # 2 rates x fg/bg
        assert all(os.path.exists(f) for f in files)


class TestSPMDHelloWorld:
    def test_single_vs_multi_device_match(self):
        images, labels = make_synthetic_data(n=64, img=8)
        _, loss1, acc1 = train(images, labels, mesh=None, steps=10)
        mesh = make_mesh()
        assert mesh.shape["data"] == 8
        _, loss8, acc8 = train(images, labels, mesh=mesh, steps=10)
        assert abs(loss1 - loss8) < 1e-3
        assert acc8 > 0.5  # separable data actually learns


class TestProfiling:
    def test_flops_ratio_reflects_pruning(self):
        from dense2sparse_vit_tpu.models import DiffPruningStudent
        from dense2sparse_vit_tpu.utils.profiling import pruned_vs_dense_flops

        # deep enough model + small predictor so pruning savings dominate
        # (at toy scale the LARGE predictor alone can outweigh the savings)
        model = DiffPruningStudent(
            cfg=TINY.replace(depth=6),
            pruning=PruningConfig(
                pruning_locs=(1,), keep_ratios=(0.25,), small_predictor=True
            ),
        )
        imgs = jnp.zeros((2, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(0), imgs)
        stats = pruned_vs_dense_flops(model, params, imgs)
        assert 0.2 < stats["flop_ratio"] < 1.0
        assert stats["dense_gflops"] > stats["pruned_gflops"] > 0

    def test_flops_of_matmul(self):
        a = jnp.zeros((64, 64))
        f = flops_of(lambda x: x @ x, a)
        # 2 * 64^3 = 524288 FLOPs
        assert 2 * 64**3 * 0.5 <= f <= 2 * 64**3 * 2


class TestParityReport:
    def test_same_weights_zero_delta(self, tmp_path):
        """parity_report with a checkpoint dumped from the reference student
        must report identical top-1 on both sides (same weights, same
        pixels) and tiny logit deltas."""
        import torch

        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
        from reference_loader import load_reference_module

        from dense2sparse_vit_tpu.experiments.parity_report import (
            parity_report,
        )

        rng = np.random.default_rng(0)
        for c in range(2):
            d = tmp_path / f"class_{c}"
            d.mkdir()
            for i in range(4):
                Image.fromarray(
                    rng.integers(0, 255, (64, 64, 3), np.uint8)
                ).save(d / f"{i}.jpg")

        ref = load_reference_module("dynamic_vit")
        torch.manual_seed(0)
        model = ref.VisionTransformerDiffPruning(
            img_size=224, patch_size=16, embed_dim=192, depth=12,
            num_heads=3, num_classes=1000, pruning_loc=[3, 6, 9],
            token_ratio=[0.7, 0.49, 0.343], topk_selection=True,
            predictor_loss_type="kl_div",
        )
        ckpt = tmp_path / "ref.pth"
        torch.save(model.state_dict(), ckpt)

        report = parity_report(
            arch="deit_tiny", ref_ckpt=str(ckpt),
            imgnet_val_dir=str(tmp_path), batch_size=4, max_batches=1,
        )
        assert report["images"] == 4
        assert report["pruned_delta"] == 0.0
        assert report["first_batch_max_logit_delta"] < 1e-3
