"""Weight-conversion golden tests.

Builds an independent torch ViT (standard pre-norm DeiT math, written here
from the architecture definition), exports its state_dict, converts it with
convert_deit_state_dict, and checks that the flax teacher reproduces the
torch forward within fp32 tolerance. This validates BOTH the layout
conversion (conv HWIO, dense transpose, qkv packing) and the block math.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from dense2sparse_vit_tpu.core.config import ModelConfig, PruningConfig
from dense2sparse_vit_tpu.models import DiffPruningStudent, ViTTeacher
from dense2sparse_vit_tpu.utils.convert import (
    convert_deit_state_dict,
    resize_pos_embed,
)

CFG = ModelConfig(
    img_size=32, patch_size=8, embed_dim=24, depth=2, num_heads=2,
    num_classes=5,
)


class TorchBlock(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.attn_qkv = nn.Linear(d, 3 * d)
        self.attn_proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.fc1 = nn.Linear(d, 4 * d)
        self.fc2 = nn.Linear(4 * d, d)
        self.h = h

    def forward(self, x):
        B, N, D = x.shape
        hd = D // self.h
        y = self.norm1(x)
        qkv = self.attn_qkv(y).reshape(B, N, 3, self.h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        attn = attn.softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(B, N, D)
        x = x + self.attn_proj(y)
        y = self.norm2(x)
        y = self.fc2(F.gelu(self.fc1(y)))
        return x + y


class TorchViT(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        d = cfg.embed_dim
        self.patch = nn.Conv2d(3, d, cfg.patch_size, stride=cfg.patch_size)
        self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = nn.Parameter(
            torch.randn(1, cfg.num_patches + 1, d) * 0.02
        )
        self.blocks = nn.ModuleList(
            [TorchBlock(d, cfg.num_heads) for _ in range(cfg.depth)]
        )
        self.norm = nn.LayerNorm(d, eps=1e-6)
        self.head = nn.Linear(d, cfg.num_classes)

    def forward(self, x):  # x: (B, 3, H, W)
        B = x.shape[0]
        x = self.patch(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return self.head(x[:, 0]), x[:, 1:]

    def deit_state_dict(self):
        """Export with upstream-DeiT key names."""
        sd = {
            "cls_token": self.cls_token.detach(),
            "pos_embed": self.pos_embed.detach(),
            "patch_embed.proj.weight": self.patch.weight.detach(),
            "patch_embed.proj.bias": self.patch.bias.detach(),
            "norm.weight": self.norm.weight.detach(),
            "norm.bias": self.norm.bias.detach(),
            "head.weight": self.head.weight.detach(),
            "head.bias": self.head.bias.detach(),
        }
        for i, b in enumerate(self.blocks):
            p = f"blocks.{i}."
            sd.update(
                {
                    p + "norm1.weight": b.norm1.weight.detach(),
                    p + "norm1.bias": b.norm1.bias.detach(),
                    p + "attn.qkv.weight": b.attn_qkv.weight.detach(),
                    p + "attn.qkv.bias": b.attn_qkv.bias.detach(),
                    p + "attn.proj.weight": b.attn_proj.weight.detach(),
                    p + "attn.proj.bias": b.attn_proj.bias.detach(),
                    p + "norm2.weight": b.norm2.weight.detach(),
                    p + "norm2.bias": b.norm2.bias.detach(),
                    p + "mlp.fc1.weight": b.fc1.weight.detach(),
                    p + "mlp.fc1.bias": b.fc1.bias.detach(),
                    p + "mlp.fc2.weight": b.fc2.weight.detach(),
                    p + "mlp.fc2.bias": b.fc2.bias.detach(),
                }
            )
        return {k: v.numpy() for k, v in sd.items()}


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    return TorchViT(CFG).eval()


@pytest.fixture(scope="module")
def images():
    return np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)


class TestConversion:
    def test_teacher_matches_torch_forward(self, torch_model, images):
        teacher = ViTTeacher(cfg=CFG)
        params = teacher.init(jax.random.PRNGKey(0), jnp.asarray(images))[
            "params"
        ]
        new_params, loaded, skipped = convert_deit_state_dict(
            torch_model.deit_state_dict(), params
        )
        assert not skipped
        logits, tokens, _ = teacher.apply(
            {"params": new_params}, jnp.asarray(images)
        )
        with torch.no_grad():
            t_logits, t_tokens = torch_model(
                torch.tensor(images).permute(0, 3, 1, 2)
            )
        np.testing.assert_allclose(
            np.asarray(logits), t_logits.numpy(), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(tokens), t_tokens.numpy(), rtol=1e-4, atol=1e-4
        )

    def test_student_backbone_load_strict_false(self, torch_model, images):
        student = DiffPruningStudent(
            cfg=CFG, pruning=PruningConfig(pruning_locs=(1,), keep_ratios=(0.5,))
        )
        params = student.init(jax.random.PRNGKey(1), jnp.asarray(images))[
            "params"
        ]
        new_params, loaded, skipped = convert_deit_state_dict(
            torch_model.deit_state_dict(), params
        )
        # backbone keys all land; predictor keys stay initialized
        assert len(loaded) == len(torch_model.deit_state_dict())
        # unpruned student forward == torch forward (same backbone weights)
        out = student.apply(
            {"params": new_params}, jnp.asarray(images), unpruned=True
        )
        with torch.no_grad():
            t_logits, _ = torch_model(torch.tensor(images).permute(0, 3, 1, 2))
        np.testing.assert_allclose(
            np.asarray(out.logits), t_logits.numpy(), rtol=1e-4, atol=1e-4
        )

    def test_shape_mismatch_raises(self, torch_model):
        teacher = ViTTeacher(cfg=CFG.replace(embed_dim=32, num_heads=2))
        params = teacher.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )["params"]
        with pytest.raises(ValueError, match="shape mismatch"):
            convert_deit_state_dict(torch_model.deit_state_dict(), params)


class TestPosEmbedResize:
    def test_identity_when_same_size(self):
        pe = np.random.default_rng(0).normal(size=(1, 17, 8)).astype(np.float32)
        out = resize_pos_embed(pe, 17)
        np.testing.assert_array_equal(out, pe)

    def test_matches_torch_bilinear(self):
        rng = np.random.default_rng(1)
        pe = rng.normal(size=(1, 1 + 4 * 4, 6)).astype(np.float32)
        got = resize_pos_embed(pe, 1 + 7 * 7)
        grid = torch.tensor(pe[0, 1:]).reshape(1, 4, 4, 6).permute(0, 3, 1, 2)
        want = (
            F.interpolate(grid, size=(7, 7), mode="bilinear")
            .permute(0, 2, 3, 1)
            .reshape(1, 49, 6)
            .numpy()
        )
        np.testing.assert_allclose(got[:, 1:], want, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(got[:, 0], pe[:, 0])

    def test_resize_applied_during_convert(self, torch_model):
        big = ModelConfig(
            img_size=64, patch_size=8, embed_dim=24, depth=2, num_heads=2,
            num_classes=5,
        )
        teacher = ViTTeacher(cfg=big)
        params = teacher.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
        )["params"]
        new_params, loaded, _ = convert_deit_state_dict(
            torch_model.deit_state_dict(), params
        )
        assert np.asarray(new_params["pos_embed"]).shape == (1, 65, 24)
        assert "pos_embed" in loaded


class TestDistilledConversion:
    def test_distilled_checkpoint_maps_dist_token_and_head(self):
        from dense2sparse_vit_tpu.models.deit import DistilledDeiT

        torch.manual_seed(1)
        d = 24
        model = DistilledDeiT(cfg=CFG)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )["params"]
        sd = {
            "cls_token": torch.randn(1, 1, d) * 0.02,
            "dist_token": torch.randn(1, 1, d) * 0.02,
            "pos_embed": torch.randn(1, CFG.num_patches + 2, d) * 0.02,
            "patch_embed.proj.weight": torch.randn(d, 3, 8, 8) * 0.02,
            "patch_embed.proj.bias": torch.zeros(d),
            "norm.weight": torch.ones(d),
            "norm.bias": torch.zeros(d),
            "head.weight": torch.randn(5, d) * 0.02,
            "head.bias": torch.zeros(5),
            "head_dist.weight": torch.randn(5, d) * 0.02,
            "head_dist.bias": torch.zeros(5),
        }
        for i in range(CFG.depth):
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
        sd = {k: v.numpy() for k, v in sd.items()}
        new_params, loaded, skipped = convert_deit_state_dict(sd, params)
        assert not skipped
        np.testing.assert_allclose(
            np.asarray(new_params["dist_token"]), sd["dist_token"]
        )
        np.testing.assert_allclose(
            np.asarray(new_params["head_dist"]["kernel"]),
            sd["head_dist.weight"].T,
        )

    def test_distilled_pos_embed_resize_preserves_two_slots(self):
        pe = np.random.default_rng(2).normal(size=(1, 2 + 16, 6)).astype(
            np.float32
        )
        out = resize_pos_embed(pe, 2 + 49, n_extra=2)
        assert out.shape == (1, 51, 6)
        np.testing.assert_array_equal(out[:, :2], pe[:, :2])


class TestExportRoundTrip:
    """flax -> torch export is the exact inverse of the import converter.

    Uses the reference's OWN module classes (via the timm shim) so the
    round trip covers every real key: backbone, qkv, patchify conv,
    predictor LN/BN stacks (incl. running stats), early-exit head.
    """

    def _roundtrip(self, sd, student, variables):
        from dense2sparse_vit_tpu.utils.convert import (
            convert_student_state_dict,
            export_student_state_dict,
        )

        converted, loaded, skipped = convert_student_state_dict(
            sd, variables
        )
        assert not [k for k in skipped if "num_batches_tracked" not in k]
        exported, passthrough = export_student_state_dict(converted, sd)
        assert set(exported) == set(sd)
        assert all(k.endswith("num_batches_tracked") for k in passthrough)
        for k in sd:
            np.testing.assert_array_equal(
                exported[k], np.asarray(sd[k]), err_msg=k
            )

    def test_student_bn_early_exit_bit_exact(self):
        from reference_loader import load_reference_module

        ref = load_reference_module("dynamic_vit")
        torch.manual_seed(3)
        rm = ref.VisionTransformerDiffPruning(
            img_size=32, patch_size=8, embed_dim=24, depth=2, num_heads=2,
            num_classes=5, pruning_loc=[1], token_ratio=[0.5],
            topk_selection=True, predictor_loss_type="kl_div",
            small_predictor=True, predictor_bn=True, early_exit=True,
        )
        # advance BN stats so the round trip moves real values, not (0, 1)
        rm.train()
        with torch.no_grad():
            rm(torch.randn(2, 3, 32, 32))
        sd = {k: v.detach().numpy().copy() for k, v in rm.state_dict().items()}
        student = DiffPruningStudent(
            cfg=CFG.replace(embed_dim=24),
            pruning=PruningConfig(
                pruning_locs=(1,), keep_ratios=(0.5,), small_predictor=True,
                predictor_bn=True, early_exit=True,
            ),
        )
        variables = student.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )
        self._roundtrip(
            sd, student,
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
        )

    def test_teacher_bit_exact(self):
        from reference_loader import load_reference_module
        from dense2sparse_vit_tpu.utils.convert import (
            export_student_state_dict,
        )

        ref = load_reference_module("dynamic_vit")
        torch.manual_seed(4)
        tm = ref.VisionTransformerTeacher(
            img_size=32, patch_size=8, embed_dim=24, depth=2, num_heads=2,
            num_classes=5,
        )
        sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
        teacher = ViTTeacher(cfg=CFG.replace(embed_dim=24))
        params = teacher.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3))
        )["params"]
        new_params, _, skipped = convert_deit_state_dict(sd, params)
        assert not skipped
        exported, passthrough = export_student_state_dict(new_params, sd)
        assert not passthrough
        for k in sd:
            np.testing.assert_array_equal(
                exported[k], np.asarray(sd[k]), err_msg=k
            )
