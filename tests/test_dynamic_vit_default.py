"""Tests for the DynamicViT-baseline (gumbel) student + its distill loss."""

import jax
import jax.numpy as jnp
import numpy as np

from dense2sparse_vit_tpu.core.config import ModelConfig, PruningConfig
from dense2sparse_vit_tpu.losses import dynamic_vit_distill_loss
from dense2sparse_vit_tpu.models import ViTTeacher, create_model
from dense2sparse_vit_tpu.models.dynamic_vit_default import DynamicViTStudent

TINY = ModelConfig(
    img_size=32, patch_size=8, embed_dim=32, depth=4, num_heads=2,
    num_classes=9,
)
PR = PruningConfig(
    pruning_locs=(1, 2), keep_ratios=(0.75, 0.5), selection="gumbel"
)
B, N = 2, 16


def _model_and_params(images):
    model = DynamicViTStudent(cfg=TINY, pruning=PR)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        images, training=True,
    )
    return model, params


class TestDynamicViTStudent:
    def setup_method(self):
        self.images = jax.random.normal(jax.random.PRNGKey(2), (B, 32, 32, 3))

    def test_training_path_static_shapes_and_decisions(self):
        model, params = _model_and_params(self.images)
        out = model.apply(
            params, self.images, training=True,
            rngs={"gumbel": jax.random.PRNGKey(3)},
        )
        # shapes never shrink in the gumbel path
        assert out.features.shape == (B, N, 32)
        assert out.decisions.shape == (B, N, 1)
        d = np.asarray(out.decisions)
        assert np.all(np.isclose(d, 0, atol=1e-5) | np.isclose(d, 1, atol=1e-5))
        assert len(out.pred_keep_probs) == 2
        assert out.kept_idx_orig is None

    def test_decisions_monotone_across_stages(self):
        # a token dropped at stage 0 cannot be kept at stage 1: final
        # decision <= each stage's sampled keep mask by construction
        model, params = _model_and_params(self.images)
        out = model.apply(
            params, self.images, training=True,
            rngs={"gumbel": jax.random.PRNGKey(4)},
        )
        # with 2 stages of ~independent bernoullis some tokens must drop
        assert float(jnp.sum(out.decisions)) <= B * N

    def test_eval_path_hard_gather(self):
        model, params = _model_and_params(self.images)
        out = model.apply(params, self.images, training=False)
        k2 = int(N * 0.5)
        assert out.features.shape == (B, k2, 32)
        assert out.kept_idx_orig.shape == (B, k2)
        assert int(out.kept_idx_orig.max()) < N
        assert out.decisions is None

    def test_gradients_flow_through_gumbel(self):
        model, params = _model_and_params(self.images)

        def loss(p):
            out = model.apply(
                p, self.images, training=True,
                rngs={"gumbel": jax.random.PRNGKey(5)},
            )
            return jnp.sum(out.logits ** 2) + jnp.sum(out.decisions)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves_with_path(g["params"])
        pred_g = [
            float(jnp.abs(v).max())
            for path, v in leaves
            if "score_predictor" in str(path)
        ]
        assert max(pred_g) > 0

    def test_registry_factory(self):
        m = create_model("default_dynamic_vit_small_patch16_224_student")
        assert m.pruning.selection == "gumbel"
        assert m.pruning.keep_ratios == (0.7, 0.49, 0.343)


class TestDynamicViTLoss:
    def test_full_loss_components(self):
        images = jax.random.normal(jax.random.PRNGKey(6), (B, 32, 32, 3))
        model, params = _model_and_params(images)
        teacher = ViTTeacher(cfg=TINY)
        tp = teacher.init(jax.random.PRNGKey(7), images)
        t_logits, t_tokens, _ = teacher.apply(tp, images)
        out = model.apply(
            params, images, training=True,
            rngs={"gumbel": jax.random.PRNGKey(8)},
        )
        labels = jnp.array([1, 2])
        loss, m = dynamic_vit_distill_loss(
            out.logits, out.features, t_logits, t_tokens, labels,
            out.pred_keep_probs, out.decisions, PR.keep_ratios,
        )
        for k in ("dyn_cls_loss", "dyn_cls_kl", "dyn_ratio_loss",
                  "dyn_token_dist_loss"):
            assert np.isfinite(float(m[k])), k
        assert float(loss) > 0

    def test_loss_differentiable_end_to_end(self):
        images = jax.random.normal(jax.random.PRNGKey(9), (B, 32, 32, 3))
        model, params = _model_and_params(images)
        teacher = ViTTeacher(cfg=TINY)
        tp = teacher.init(jax.random.PRNGKey(10), images)
        t_logits, t_tokens, _ = teacher.apply(tp, images)
        labels = jnp.array([0, 3])

        def loss_fn(p):
            out = model.apply(
                p, images, training=True,
                rngs={"gumbel": jax.random.PRNGKey(11)},
            )
            loss, _ = dynamic_vit_distill_loss(
                out.logits, out.features, t_logits, t_tokens, labels,
                out.pred_keep_probs, out.decisions, PR.keep_ratios,
            )
            return loss

        g = jax.grad(loss_fn)(params)
        assert all(
            np.isfinite(np.asarray(v)).all()
            for v in jax.tree_util.tree_leaves(g)
        )
