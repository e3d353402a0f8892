"""Differentiable (perturbed) top-k selection inside the student."""

import jax
import jax.numpy as jnp
import numpy as np

from dense2sparse_vit_tpu.core.config import (
    ExperimentConfig,
    ModelConfig,
    PruningConfig,
    TrainConfig,
)
from dense2sparse_vit_tpu.models import DiffPruningStudent, ViTTeacher
from dense2sparse_vit_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

TINY = ModelConfig(
    img_size=16, patch_size=4, embed_dim=16, depth=3, num_heads=2,
    num_classes=5,
)
PR = PruningConfig(
    pruning_locs=(1,), keep_ratios=(0.5,), topk_num_samples=64,
    differentiable_topk=True,
)
B = 4


class TestSoftTopK:
    def setup_method(self):
        self.imgs = jax.random.normal(jax.random.PRNGKey(0), (B, 16, 16, 3))
        self.model = DiffPruningStudent(cfg=TINY, pruning=PR)
        self.params = self.model.init(
            {"params": jax.random.PRNGKey(1),
             "selection": jax.random.PRNGKey(2)},
            self.imgs,
        )

    def test_soft_path_shapes_match_hard_path(self):
        hard = self.model.apply(self.params, self.imgs)
        soft = self.model.apply(
            self.params, self.imgs, deterministic=False, soft_topk=True,
            sigma=0.05,
            rngs={"selection": jax.random.PRNGKey(3),
                  "dropout": jax.random.PRNGKey(4)},
        )
        assert soft.logits.shape == hard.logits.shape
        assert soft.features.shape == hard.features.shape
        assert soft.kept_idx[0].shape == hard.kept_idx[0].shape

    def test_small_sigma_soft_approaches_hard(self):
        hard = self.model.apply(self.params, self.imgs)
        soft = self.model.apply(
            self.params, self.imgs, deterministic=False, soft_topk=True,
            sigma=1e-6,
            rngs={"selection": jax.random.PRNGKey(5),
                  "dropout": jax.random.PRNGKey(6)},
        )
        # with sigma -> 0 every perturbed sample picks the same top-k, the
        # indicators become exact one-hots and soft == hard gather
        np.testing.assert_allclose(
            np.asarray(soft.logits), np.asarray(hard.logits), atol=1e-4
        )

    def test_gradient_reaches_predictor_through_selection(self):
        # kill the mask-loss path: only the backbone logits feed the loss, so
        # any predictor gradient must flow THROUGH the soft selection
        def loss(p):
            out = self.model.apply(
                p, self.imgs, deterministic=False, soft_topk=True, sigma=0.5,
                rngs={"selection": jax.random.PRNGKey(7),
                      "dropout": jax.random.PRNGKey(8)},
            )
            return jnp.sum(out.logits ** 2)

        g = jax.grad(loss)(self.params)
        leaves = jax.tree_util.tree_leaves_with_path(g["params"])
        pred_g = [
            float(jnp.abs(v).max())
            for path, v in leaves
            if "score_predictor" in str(path)
        ]
        assert max(pred_g) > 0

        # sanity: with HARD selection the same loss gives ZERO predictor
        # gradient (gather has no gradient w.r.t. indices)
        def loss_hard(p):
            out = self.model.apply(
                p, self.imgs, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(9)},
            )
            return jnp.sum(out.logits ** 2)

        gh = jax.grad(loss_hard)(self.params)
        leaves = jax.tree_util.tree_leaves_with_path(gh["params"])
        pred_gh = [
            float(jnp.abs(v).max())
            for path, v in leaves
            if "score_predictor" in str(path)
        ]
        assert max(pred_gh) == 0.0

    def test_train_step_with_differentiable_topk(self):
        cfg = ExperimentConfig(
            model=TINY, pruning=PR,
            train=TrainConfig(batch_size=B, epochs=4, warmup_epochs=0),
        )
        teacher = ViTTeacher(cfg=TINY)
        tparams = teacher.init(jax.random.PRNGKey(10), self.imgs)["params"]
        tx = make_optimizer(cfg.train, steps_per_epoch=1)
        state = create_train_state(
            self.model, tx, jax.random.PRNGKey(11), self.imgs[:1]
        )
        step = jax.jit(make_train_step(self.model, teacher, tx, cfg))
        labels = jnp.array([0, 1, 2, 3])
        new_state, metrics = step(
            state, tparams, self.imgs, labels, jax.random.PRNGKey(12),
            jnp.float32(1.0),
        )
        assert np.isfinite(float(metrics["loss"]))
