"""Pruned T2T and DINO students (BASELINE configs 4 and 5)."""

import jax
import jax.numpy as jnp
import numpy as np

from dense2sparse_vit_tpu.core.config import ModelConfig, PruningConfig
from dense2sparse_vit_tpu.models import DiffPruningStudent, create_model
from dense2sparse_vit_tpu.nn.t2t import T2TModule

B, IMG = 2, 64  # T2T strides 4*2*2 = 16 -> 4x4 = 16 patches
TINY = ModelConfig(
    img_size=IMG, patch_size=16, embed_dim=32, depth=4, num_heads=2,
    qkv_bias=False, layer_norm_eps=1e-5, num_classes=5,
)
IMGS = jax.random.normal(jax.random.PRNGKey(0), (B, IMG, IMG, 3))


class TestT2TPrunedStudent:
    def _model(self, tokens_type="performer"):
        return DiffPruningStudent(
            cfg=TINY,
            pruning=PruningConfig(pruning_locs=(1, 2), keep_ratios=(0.75, 0.5)),
            stem=T2TModule(
                embed_dim=32, tokens_type=tokens_type, token_dim=16,
                name="tokens_to_token",
            ),
            pos_embed_type="sinusoid",
        )

    def test_pruned_forward_shapes(self):
        model = self._model()
        params = model.init(jax.random.PRNGKey(1), IMGS)
        out = model.apply(params, IMGS)
        assert out.logits.shape == (B, 5)
        assert out.features.shape == (B, 8, 32)  # 16 * 0.5
        assert "pos_embed" not in params["params"]  # sinusoid is constant
        # the T2T stem params exist (bound under the 'stem' attribute)
        assert "stem" in params["params"]

    def test_transformer_stem_variant(self):
        model = self._model("transformer")
        params = model.init(jax.random.PRNGKey(2), IMGS)
        out = model.apply(params, IMGS)
        assert out.features.shape == (B, 8, 32)

    def test_registry_factory(self):
        m = create_model("t2t_vit_14_student", keep_ratios=(0.7,),
                         pruning_locs=(3,))
        assert m.cfg.embed_dim == 384 and m.pos_embed_type == "sinusoid"


class TestDINOPrunedStudent:
    def test_registry_and_soft_topk_training(self):
        m = create_model(
            "dino_small_student",
            pruning_locs=(1,), keep_ratios=(0.5,),
            topk_num_samples=32,
        )
        assert m.pruning.differentiable_topk
        # tiny shapes for the actual run
        model = DiffPruningStudent(
            cfg=ModelConfig(
                img_size=32, patch_size=8, embed_dim=16, depth=2,
                num_heads=2, num_classes=5,
            ),
            pruning=PruningConfig(
                pruning_locs=(1,), keep_ratios=(0.5,),
                topk_num_samples=32, differentiable_topk=True,
            ),
        )
        imgs = jax.random.normal(jax.random.PRNGKey(3), (B, 32, 32, 3))
        params = model.init(
            {"params": jax.random.PRNGKey(4),
             "selection": jax.random.PRNGKey(5)}, imgs,
        )
        out = model.apply(
            params, imgs, deterministic=False, soft_topk=True, sigma=0.1,
            rngs={"selection": jax.random.PRNGKey(6),
                  "dropout": jax.random.PRNGKey(7)},
        )
        assert out.features.shape == (B, 8, 16)
        assert np.isfinite(np.asarray(out.logits)).all()
