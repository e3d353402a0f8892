"""Tests for the DeiT and DINO model families."""

import jax
import jax.numpy as jnp
import numpy as np

from dense2sparse_vit_tpu.core.config import ModelConfig
from dense2sparse_vit_tpu.models import create_model, list_models
from dense2sparse_vit_tpu.models.deit import (
    DeiT,
    DistilledDeiT,
    MaskedDistilledDeiT,
    MaskPredictorDeiT,
    NonSpatialDeiT,
    VanillaDeiT,
    interpolate_pos_encoding,
)
from dense2sparse_vit_tpu.models.dino import (
    DINOMaskedViT,
    DINOPredictorViT,
    DINOViT,
)

TINY = ModelConfig(
    img_size=32, patch_size=8, embed_dim=32, depth=3, num_heads=2,
    num_classes=7,
)
B, N = 2, 16
IMGS = jax.random.normal(jax.random.PRNGKey(0), (B, 32, 32, 3))


class TestDeiT:
    def test_plain_forward_and_selfattention(self):
        m = DeiT(cfg=TINY)
        p = m.init(jax.random.PRNGKey(1), IMGS)
        logits = m.apply(p, IMGS)
        assert logits.shape == (B, 7)
        attn = m.apply(p, IMGS, return_selfattention=True)
        assert attn.shape == (B, 2, N + 1)  # CLS row of last-layer attention
        np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, atol=1e-5)

    def test_arbitrary_resolution_interpolates_pos_embed(self):
        m = DeiT(cfg=TINY)
        p = m.init(jax.random.PRNGKey(1), IMGS)
        big = jax.random.normal(jax.random.PRNGKey(2), (B, 48, 48, 3))
        logits = jax.jit(lambda p, x: m.apply(p, x))(p, big)  # 36 patches
        assert logits.shape == (B, 7)

    def test_interpolate_identity(self):
        pe = jnp.asarray(np.random.default_rng(0).normal(size=(1, 17, 8)))
        out = interpolate_pos_encoding(pe, 16, 1)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(pe))

    def test_distilled_heads(self):
        m = DistilledDeiT(cfg=TINY)
        p = m.init(jax.random.PRNGKey(3), IMGS)
        cls_l, dist_l = m.apply(p, IMGS)
        assert cls_l.shape == dist_l.shape == (B, 7)
        cls_l, dist_l, per_layer = m.apply(p, IMGS, return_per_layer=True)
        assert len(per_layer) == 3
        assert per_layer[0][0].shape == (B, 32)

    def test_vanilla_per_layer_logits_and_patch_drop(self):
        m = VanillaDeiT(cfg=TINY)
        p = m.init(
            {"params": jax.random.PRNGKey(4), "patch_drop": jax.random.PRNGKey(5)},
            IMGS,
        )
        outs = m.apply(p, IMGS)
        assert len(outs) == 3 and outs[0].shape == (B, 7)
        outs = m.apply(
            p, IMGS, block_index=1, drop_rate=0.5,
            rngs={"patch_drop": jax.random.PRNGKey(6)},
        )
        assert outs[-1].shape == (B, 7)

    def test_nonspatial_has_no_pos_embed(self):
        m = NonSpatialDeiT(cfg=TINY)
        p = m.init(jax.random.PRNGKey(7), IMGS)
        assert "pos_embed" not in p["params"]
        assert m.apply(p, IMGS).shape == (B, 7)

    def test_masked_distilled_zeroes_dropped_tokens(self):
        m = MaskedDistilledDeiT(cfg=TINY, mask_block=1)
        mask_logits = jnp.stack(
            [jnp.full((N,), 5.0), jnp.full((N,), -5.0)], axis=-1
        )  # strongly keep
        p = m.init(
            {"params": jax.random.PRNGKey(8), "gumbel": jax.random.PRNGKey(9)},
            IMGS, mask_logits,
        )
        cls_l, dist_l, keep = m.apply(
            p, IMGS, mask_logits, rngs={"gumbel": jax.random.PRNGKey(10)}
        )
        assert keep.shape == (B, N, 1)
        assert float(keep.mean()) > 0.9  # keep-biased logits mostly keep
        # gradient flows back to the mask logits (the whole point of
        # optimized_mask.py)
        g = jax.grad(
            lambda ml: jnp.sum(
                m.apply(p, IMGS, ml, rngs={"gumbel": jax.random.PRNGKey(11)})[0]
                ** 2
            )
        )(mask_logits)
        assert np.abs(np.asarray(g)).max() > 0

    def test_mask_predictor_variant(self):
        m = MaskPredictorDeiT(cfg=TINY)
        p = m.init(
            {"params": jax.random.PRNGKey(12), "gumbel": jax.random.PRNGKey(13)},
            IMGS,
        )
        cls_l, dist_l, keep = m.apply(
            p, IMGS, rngs={"gumbel": jax.random.PRNGKey(14)}
        )
        assert keep.shape == (B, N, 1)
        assert cls_l.shape == (B, 7)


class TestDINO:
    def test_headless_backbone_returns_cls_feature(self):
        m = DINOViT(cfg=TINY.replace(num_classes=0))
        p = m.init(jax.random.PRNGKey(15), IMGS)
        feat = m.apply(p, IMGS)
        assert feat.shape == (B, 32)

    def test_predictor_train_vs_eval_paths(self):
        m = DINOPredictorViT(
            cfg=TINY.replace(num_classes=0), pruning_location=1, keep_ratio=0.5
        )
        p = m.init(
            {"params": jax.random.PRNGKey(16), "gumbel": jax.random.PRNGKey(17)},
            IMGS, training=True,
        )
        out, keep = m.apply(
            p, IMGS, training=True, rngs={"gumbel": jax.random.PRNGKey(18)}
        )
        assert out.shape == (B, 32)
        assert keep.shape == (B, N, 1)
        out_eval, keep_eval = m.apply(p, IMGS, training=False)
        assert out_eval.shape == (B, 32)
        assert keep_eval is None

    def test_masked_per_layer_logits(self):
        m = DINOMaskedViT(cfg=TINY)
        mask_logits = jnp.zeros((N, 2))
        p = m.init(
            {"params": jax.random.PRNGKey(19), "gumbel": jax.random.PRNGKey(20)},
            IMGS, mask_logits,
        )
        outs, keep = m.apply(
            p, IMGS, mask_logits, rngs={"gumbel": jax.random.PRNGKey(21)}
        )
        assert len(outs) == 3 and outs[0].shape == (B, 7)
        assert keep.shape == (B, N + 1, 1)
        np.testing.assert_allclose(np.asarray(keep[:, 0]), 1.0)  # CLS kept


class TestRegistryZoo:
    def test_all_families_registered(self):
        names = list_models()
        for n in (
            "deit_small_patch16_224",
            "deit_small_distilled_patch16_224",
            "vanilla_deit_small_patch16_224",
            "deit_small_patch16_224_masked",
            "deit_small_patch16_224_predictor",
            "dino_small",
            "dino_small_predictor",
            "dino_small_dist",
            "dino_small_patch16_224_masked",
            "default_dynamic_vit_small_patch16_224_student",
        ):
            assert n in names, n

    def test_dino_patch8(self):
        m = create_model("dino_small", patch_size=8)
        assert m.cfg.patch_size == 8
        assert m.cfg.num_classes == 0


class TestMultiCrop:
    def test_forward_crops_groups_by_resolution(self):
        from dense2sparse_vit_tpu.models.deit import DeiT, forward_crops

        m = DeiT(cfg=TINY)
        p = m.init(jax.random.PRNGKey(30), IMGS)
        crops = [
            jax.random.normal(jax.random.PRNGKey(31), (2, 32, 32, 3)),
            jax.random.normal(jax.random.PRNGKey(32), (2, 48, 48, 3)),
            jax.random.normal(jax.random.PRNGKey(33), (2, 32, 32, 3)),
        ]
        outs = forward_crops(m, p, crops)
        assert len(outs) == 3
        assert all(o.shape == (2, 7) for o in outs)
        # grouping must not change per-crop results
        solo = m.apply(p, crops[1])
        np.testing.assert_allclose(
            np.asarray(outs[1]), np.asarray(solo), atol=1e-5
        )
