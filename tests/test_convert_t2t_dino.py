"""T2T and DINO checkpoint-converter golden tests.

Builds the reference's OWN torch models (t2t_vit.py / dino.py via the timm
shim in reference_loader.py) with random weights, converts their state
dicts with convert_t2t_state_dict / convert_dino_state_dict, and asserts the
flax models reproduce the torch forward — validating the key maps for the
tokens_to_token stem (performer w -> prm_w, mlp.0/mlp.2, attn.qkv/proj),
the sinusoid pos-embed skip, DINO headless loading, the shape-distilled
{'model': ...} layout, and the DINO pruning predictor.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_loader import load_reference_module

from dense2sparse_vit_tpu.core.config import ModelConfig
from dense2sparse_vit_tpu.models.t2t import T2TViT
from dense2sparse_vit_tpu.models.dino import (
    DINODistilledViT,
    DINOPredictorViT,
    DINOViT,
    _DinoPredictor,
)
from dense2sparse_vit_tpu.utils.convert import (
    convert_dino_state_dict,
    convert_t2t_state_dict,
)

T2T_CFG = ModelConfig(
    img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=2,
    mlp_ratio=2.0, qkv_bias=False, layer_norm_eps=1e-5, num_classes=5,
)
DINO_CFG = ModelConfig(
    img_size=64, patch_size=16, embed_dim=48, depth=2, num_heads=2,
    mlp_ratio=4.0, qkv_bias=True, layer_norm_eps=1e-6, num_classes=5,
)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    return rng.normal(size=(2, 64, 64, 3)).astype(np.float32)


def _timg(images):
    return torch.tensor(images).permute(0, 3, 1, 2).contiguous()


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


class TestT2TConversion:
    @pytest.mark.parametrize("tokens_type", ["performer", "transformer"])
    def test_forward_matches_reference(self, images, tokens_type):
        ref = load_reference_module("t2t_vit")
        torch.manual_seed(0)
        tm = ref.T2T_ViT(
            img_size=64, tokens_type=tokens_type, num_classes=5,
            embed_dim=64, depth=2, num_heads=2, mlp_ratio=2.0, token_dim=16,
        ).eval()
        fm = T2TViT(cfg=T2T_CFG, tokens_type=tokens_type, token_dim=16)
        params = fm.init(jax.random.PRNGKey(0), jnp.asarray(images))["params"]
        new_params, loaded, skipped = convert_t2t_state_dict(_sd(tm), params)
        # the fixed sinusoid pos_embed is deliberately skipped (computed)
        assert skipped == ["pos_embed"]
        logits = fm.apply({"params": new_params}, jnp.asarray(images))
        avg = fm.apply(
            {"params": new_params}, jnp.asarray(images), get_average=True
        )
        with torch.no_grad():
            t_logits = tm(_timg(images))
            t_avg = tm(_timg(images), get_average=True)
        np.testing.assert_allclose(
            np.asarray(logits), t_logits.numpy(), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(avg), t_avg.numpy(), rtol=1e-3, atol=1e-4
        )

    def test_state_dict_ema_wrapper(self, images):
        """Published T2T tarballs store {'state_dict_ema': ...}
        (t2t_vit.py:188)."""
        ref = load_reference_module("t2t_vit")
        torch.manual_seed(1)
        tm = ref.T2T_ViT(
            img_size=64, tokens_type="performer", num_classes=5,
            embed_dim=64, depth=2, num_heads=2, mlp_ratio=2.0, token_dim=16,
        ).eval()
        fm = T2TViT(cfg=T2T_CFG, tokens_type="performer", token_dim=16)
        params = fm.init(jax.random.PRNGKey(0), jnp.asarray(images))["params"]
        new_params, loaded, _ = convert_t2t_state_dict(
            {"state_dict_ema": _sd(tm)}, params
        )
        logits = fm.apply({"params": new_params}, jnp.asarray(images))
        with torch.no_grad():
            t_logits = tm(_timg(images))
        np.testing.assert_allclose(
            np.asarray(logits), t_logits.numpy(), rtol=1e-3, atol=1e-4
        )

    def test_sinusoid_table_matches_reference(self):
        ref_tb = load_reference_module("transformer_block")
        from dense2sparse_vit_tpu.nn.t2t import get_sinusoid_encoding

        want = ref_tb.get_sinusoid_encoding(17, 64).numpy()
        got = get_sinusoid_encoding(17, 64)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestDINOConversion:
    def test_headless_checkpoint(self, images):
        """DINO checkpoints have no 'head.*' keys (self-supervised,
        dino.py:527-533); the flax head keeps its init."""
        ref = load_reference_module("dino")
        torch.manual_seed(2)
        tm = ref.VisionTransformer(
            img_size=[64], patch_size=16, embed_dim=48, depth=2, num_heads=2,
            mlp_ratio=4.0, qkv_bias=True, num_classes=0,
            norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        ).eval()
        fm = DINOViT(cfg=DINO_CFG.replace(num_classes=0))
        params = fm.init(jax.random.PRNGKey(0), jnp.asarray(images))["params"]
        sd = _sd(tm)
        assert not any(k.startswith("head") for k in sd)
        new_params, loaded, skipped = convert_dino_state_dict(sd, params)
        assert not skipped
        cls = fm.apply({"params": new_params}, jnp.asarray(images))
        with torch.no_grad():
            t_cls = tm(_timg(images))
        np.testing.assert_allclose(
            np.asarray(cls), t_cls.numpy(), rtol=1e-3, atol=1e-4
        )

    def test_headed_model_with_headless_checkpoint(self, images):
        """Loading a headless DINO ckpt into a classifier model leaves the
        head initialized (reference strict=False load, dino.py:533)."""
        ref = load_reference_module("dino")
        torch.manual_seed(2)
        tm = ref.VisionTransformer(
            img_size=[64], patch_size=16, embed_dim=48, depth=2, num_heads=2,
            mlp_ratio=4.0, qkv_bias=True, num_classes=0,
            norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        ).eval()
        fm = DINOViT(cfg=DINO_CFG)
        params = fm.init(jax.random.PRNGKey(3), jnp.asarray(images))["params"]
        head_before = np.asarray(params["head"]["kernel"]).copy()
        new_params, loaded, skipped = convert_dino_state_dict(_sd(tm), params)
        assert not skipped and len(loaded) == len(_sd(tm))
        np.testing.assert_array_equal(
            np.asarray(new_params["head"]["kernel"]), head_before
        )

    def test_shape_distilled_model_wrapper(self, images):
        """dino_small_dist loads {'model': sd} with cls+dist tokens
        (dino.py:609-615)."""
        ref = load_reference_module("dino")
        torch.manual_seed(4)
        tm = ref.DistilledVisionTransformer(
            img_size=[64], patch_size=16, embed_dim=48, depth=2, num_heads=2,
            mlp_ratio=4.0, qkv_bias=True, num_classes=5,
            norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        ).eval()
        fm = DINODistilledViT(cfg=DINO_CFG)
        params = fm.init(jax.random.PRNGKey(0), jnp.asarray(images))["params"]
        new_params, loaded, skipped = convert_dino_state_dict(
            {"model": _sd(tm)}, params
        )
        assert not skipped
        out_cls, out_dist = fm.apply({"params": new_params}, jnp.asarray(images))
        with torch.no_grad():
            t_avg = tm(_timg(images))  # eval: (head + head_dist) / 2
        np.testing.assert_allclose(
            (np.asarray(out_cls) + np.asarray(out_dist)) / 2,
            t_avg.numpy(), rtol=1e-3, atol=1e-4,
        )

    def test_predictor_module_parity(self):
        """dino.PredictorLG (in_conv LN+Linear, out_conv Linears at 0/2/4,
        dino.py:340-366) vs _DinoPredictor on identical input."""
        ref = load_reference_module("dino")
        torch.manual_seed(5)
        tp = ref.PredictorLG(embed_dim=48).eval()
        x = torch.randn(2, 16, 48)
        fm = DINOPredictorViT(cfg=DINO_CFG, pruning_location=1)
        params = fm.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
        )["params"]
        sd = {f"predictor.{k}": v.detach().numpy()
              for k, v in tp.state_dict().items()}
        # backbone keys absent: only the predictor should load
        new_params, loaded, skipped = convert_dino_state_dict(sd, params)
        assert len(loaded) == len(sd) and not skipped
        pred = _DinoPredictor(embed_dim=48)
        out = pred.apply(
            {"params": new_params["predictor"]}, jnp.asarray(x.numpy())
        )
        with torch.no_grad():
            want = tp(x)
        np.testing.assert_allclose(
            np.asarray(out), want.numpy(), rtol=1e-4, atol=1e-5
        )
