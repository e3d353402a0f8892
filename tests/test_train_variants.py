"""Train-step variants: BN predictor (mutable batch stats), threshold mode,
early exit, mse/bce mask losses."""

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
    make_eval_step,
    make_optimizer,
    make_train_step,
)

TINY = ModelConfig(
    img_size=16, patch_size=4, embed_dim=16, depth=3, num_heads=2,
    num_classes=5,
)
B = 8
IMGS = jax.random.normal(jax.random.PRNGKey(0), (B, 16, 16, 3))
LABELS = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, 5)


def _run_one_step(pruning, train=None):
    cfg = ExperimentConfig(
        model=TINY, pruning=pruning,
        train=train or TrainConfig(batch_size=B, epochs=4, warmup_epochs=0),
    )
    student = DiffPruningStudent(cfg=TINY, pruning=pruning)
    teacher = ViTTeacher(cfg=TINY)
    tx = make_optimizer(cfg.train, steps_per_epoch=1)
    state = create_train_state(student, tx, jax.random.PRNGKey(2), IMGS[:1])
    tparams = teacher.init(jax.random.PRNGKey(3), IMGS[:1])["params"]
    step = jax.jit(make_train_step(student, teacher, tx, cfg))
    new_state, metrics = step(
        state, tparams, IMGS, LABELS, jax.random.PRNGKey(4), jnp.float32(1.0)
    )
    ev = jax.jit(make_eval_step(student, teacher, cfg))
    em = ev(new_state.params, new_state.batch_stats, tparams, IMGS, LABELS)
    return state, new_state, metrics, em


class TestBNPredictorTraining:
    def test_batch_stats_update(self):
        pr = PruningConfig(
            pruning_locs=(1,), keep_ratios=(0.5,), predictor_bn=True
        )
        state, new_state, metrics, em = _run_one_step(pr)
        assert state.batch_stats, "BN predictor must create batch_stats"
        # running stats moved during the step
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.batch_stats, new_state.batch_stats,
        )
        assert max(jax.tree_util.tree_leaves(diffs)) > 0
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(em["val_acc"]))


class TestThresholdTraining:
    def test_threshold_mode_trains_and_reports_ratios(self):
        pr = PruningConfig(
            pruning_locs=(1,), keep_ratios=(0.5,), patch_score_threshold=0.4
        )
        _, new_state, metrics, em = _run_one_step(pr)
        assert np.isfinite(float(metrics["loss"]))
        for k in ("min_keep_ratio", "avg_keep_ratio", "max_keep_ratio"):
            assert k in em
            assert 0.0 <= float(em[k]) <= 1.0
        assert float(em["min_keep_ratio"]) <= float(em["max_keep_ratio"])

    def test_threshold_multi_stage_mask_loss_chains_by_mask(self):
        # regression: multi-stage threshold mode has no kept indices — the
        # mask-loss chain must restrict stage i's teacher target via stage
        # i-1's keep MASK (round-1 code indexed an empty kept_idx tuple)
        pr = PruningConfig(
            pruning_locs=(1, 2), keep_ratios=(0.7, 0.49),
            patch_score_threshold=0.4,
        )
        _, _, metrics, em = _run_one_step(pr)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["mask_loss"]))
        assert "mask_acc_1" in metrics
        assert np.isfinite(float(em["val_loss"]))


class TestEarlyExitTraining:
    def test_early_exit_loss_in_metrics(self):
        pr = PruningConfig(
            pruning_locs=(1,), keep_ratios=(0.5,), early_exit=True
        )
        _, _, metrics, _ = _run_one_step(pr)
        assert "early_exit_loss" in metrics
        assert np.isfinite(float(metrics["early_exit_loss"]))


class TestMaskLossVariants:
    def test_mse_and_bce_modes_train(self):
        for lt in ("mse", "bce"):
            pr = PruningConfig(
                pruning_locs=(1,), keep_ratios=(0.5,), mask_loss_type=lt
            )
            _, _, metrics, _ = _run_one_step(pr)
            assert np.isfinite(float(metrics["loss"])), lt


class TestRemat:
    def test_remat_matches_plain_gradients(self):
        pr = PruningConfig(pruning_locs=(1,), keep_ratios=(0.5,))
        results = {}
        for remat in (False, True):
            model_cfg = TINY.replace(remat=remat)
            cfg = ExperimentConfig(
                model=model_cfg, pruning=pr,
                train=TrainConfig(batch_size=B, epochs=4, warmup_epochs=0),
            )
            student = DiffPruningStudent(cfg=model_cfg, pruning=pr)
            teacher = ViTTeacher(cfg=model_cfg)
            tx = make_optimizer(cfg.train, steps_per_epoch=1)
            state = create_train_state(
                student, tx, jax.random.PRNGKey(2), IMGS[:1]
            )
            tparams = teacher.init(jax.random.PRNGKey(3), IMGS[:1])["params"]
            step = jax.jit(make_train_step(student, teacher, tx, cfg))
            new_state, metrics = step(
                state, tparams, IMGS, LABELS, jax.random.PRNGKey(4),
                jnp.float32(1.0),
            )
            results[remat] = (new_state.params, float(metrics["loss"]))
        # same math, just recomputed in the backward
        np.testing.assert_allclose(results[False][1], results[True][1],
                                   rtol=1e-6)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            results[False][0], results[True][0],
        )
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-6


class TestGradAccumulation:
    def test_two_micro_steps_equal_one_double_batch_step(self):
        pr = PruningConfig(pruning_locs=(1,), keep_ratios=(0.5,))
        imgs2 = jax.random.normal(jax.random.PRNGKey(9), (B, 16, 16, 3))
        labels2 = jax.random.randint(jax.random.PRNGKey(10), (B,), 0, 5)
        big_imgs = jnp.concatenate([IMGS, imgs2])
        big_labels = jnp.concatenate([LABELS, labels2])

        def build(accum):
            cfg = ExperimentConfig(
                model=TINY, pruning=pr,
                train=TrainConfig(
                    batch_size=B, epochs=4, warmup_epochs=0,
                    grad_accum_steps=accum,
                ),
            )
            student = DiffPruningStudent(cfg=TINY, pruning=pr)
            teacher = ViTTeacher(cfg=TINY)
            tx = make_optimizer(cfg.train, steps_per_epoch=1)
            state = create_train_state(
                student, tx, jax.random.PRNGKey(2), IMGS[:1]
            )
            tparams = teacher.init(jax.random.PRNGKey(3), IMGS[:1])["params"]
            return jax.jit(make_train_step(student, teacher, tx, cfg)), \
                state, tparams

        # two accumulated micro-steps (dropout off via drop rates = 0)
        step_a, state_a, tparams = build(2)
        key = jax.random.PRNGKey(4)
        state_a, _ = step_a(state_a, tparams, IMGS, LABELS, key, jnp.float32(1.0))
        state_a, _ = step_a(state_a, tparams, imgs2, labels2, key, jnp.float32(1.0))

        # one step on the concatenated batch, no accumulation
        step_b, state_b, _ = build(1)
        state_b, _ = step_b(
            state_b, tparams, big_imgs, big_labels, key, jnp.float32(1.0)
        )

        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state_a.params, state_b.params,
        )
        assert max(jax.tree_util.tree_leaves(diffs)) < 2e-5
