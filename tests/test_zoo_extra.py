"""Tests for TNT, drop-ResNet, hierarchical/ensemble DeiT, vanilla ViT."""

import jax
import jax.numpy as jnp
import numpy as np

from dense2sparse_vit_tpu.core.config import ModelConfig
from dense2sparse_vit_tpu.models import create_model, list_models
from dense2sparse_vit_tpu.models.deit_heads import EnsembleDeiT, HierarchicalDeiT
from dense2sparse_vit_tpu.models.resnet import DropResNet
from dense2sparse_vit_tpu.models.tnt import TNT

B = 2
TINY = ModelConfig(
    img_size=32, patch_size=8, embed_dim=24, depth=3, num_heads=2,
    qkv_bias=False, layer_norm_eps=1e-5, num_classes=5,
)
IMGS = jax.random.normal(jax.random.PRNGKey(0), (B, 32, 32, 3))


class TestTNT:
    def test_forward(self):
        m = TNT(cfg=TINY, in_dim=8, in_num_head=2)
        p = m.init(jax.random.PRNGKey(1), IMGS)
        out = m.apply(p, IMGS)
        assert out.shape == (B, 5)
        # dual pos embeds exist
        assert "pixel_pos" in p["params"] and "patch_pos" in p["params"]

    def test_registry(self):
        m = create_model("tnt_s_patch16_224")
        assert m.cfg.embed_dim == 384 and m.in_dim == 24


class TestDropResNet:
    def test_forward_and_drop(self):
        m = DropResNet(stage_sizes=(1, 1), num_classes=5)
        imgs = jax.random.normal(jax.random.PRNGKey(2), (B, 64, 64, 3))
        p = m.init(jax.random.PRNGKey(3), imgs)
        out = m.apply(p, imgs)
        assert out.shape == (B, 5)
        out_dropped = m.apply(
            p, imgs, drop_percent=0.5, drop_layer=1,
            rngs={"feature_drop": jax.random.PRNGKey(4)},
        )
        assert out_dropped.shape == (B, 5)
        assert not np.allclose(np.asarray(out), np.asarray(out_dropped))

    def test_drop_layer_zero_is_identity(self):
        m = DropResNet(stage_sizes=(1,), num_classes=5)
        imgs = jax.random.normal(jax.random.PRNGKey(5), (B, 32, 32, 3))
        p = m.init(jax.random.PRNGKey(6), imgs)
        a = m.apply(p, imgs)
        b = m.apply(p, imgs, drop_percent=0.9, drop_layer=0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestHeads:
    def test_hierarchical_12_outputs(self):
        m = HierarchicalDeiT(cfg=TINY)
        p = m.init(jax.random.PRNGKey(7), IMGS)
        outs = m.apply(p, IMGS)
        assert len(outs) == TINY.depth  # depth-1 conv heads + final CLS head
        assert all(o.shape == (B, 5) for o in outs)

    def test_ensemble_outputs_and_average(self):
        m = EnsembleDeiT(cfg=TINY)
        p = m.init(jax.random.PRNGKey(8), IMGS)
        outs = m.apply(p, IMGS)
        # (depth-1) conv heads + 4 quadrant heads + final = depth + 4
        assert len(outs) == TINY.depth + 4
        avg = m.apply(p, IMGS, get_average=True)
        assert avg.shape == (B, 5)
        np.testing.assert_allclose(
            np.asarray(avg), np.mean([np.asarray(o) for o in outs], 0),
            atol=1e-5,
        )


class TestRegistryComplete:
    def test_inventory_covers_reference_factories(self):
        names = set(list_models())
        # one registered name per reference model-zoo family (SURVEY.md 2.2)
        required = {
            "dynamic_vit_small_patch16_224_student",
            "dynamic_vit_small_patch16_224_teacher",
            "default_dynamic_vit_small_patch16_224_student",
            "deit_small_patch16_224",
            "deit_small_distilled_patch16_224",
            "vanilla_deit_small_patch16_224",
            "nonspatial_deit_small_patch16_224",
            "deit_small_patch16_224_masked",
            "deit_small_patch16_224_predictor",
            "dino_small",
            "dino_small_predictor",
            "dino_small_dist",
            "dino_small_patch16_224_masked",
            "t2t_vit_7",
            "t2t_vit_14",
            "t2t_vit_t_14",
            "t2t_vit_14_resnext",
            "t2t_vit_14_wide",
            "t2t_vit_14_se",
            "t2t_vit_16_ghost",
            "t2t_vit_dense",
            "tnt_s_patch16_224",
            "tnt_b_patch16_224",
            "drop_resnet50",
            "tiny_patch16_224_hierarchical",
            "tiny_patch16_224_ensemble",
            "vit_small_patch16_224",
            "vit_large_patch16_384",
        }
        missing = required - names
        assert not missing, f"missing registry entries: {missing}"
