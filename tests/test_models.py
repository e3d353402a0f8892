"""Shape/semantics tests for teacher and diff-pruning student."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense2sparse_vit_tpu.core.config import ModelConfig, PruningConfig
from dense2sparse_vit_tpu.models import DiffPruningStudent, ViTTeacher, create_model

# tiny config to keep CPU tests fast
TINY = ModelConfig(
    img_size=32, patch_size=8, embed_dim=32, depth=4, num_heads=2,
    num_classes=11,
)
B, N = 2, 16  # 32/8 = 4x4 patches


@pytest.fixture(scope="module")
def images():
    return jax.random.normal(jax.random.PRNGKey(0), (B, 32, 32, 3))


class TestTeacher:
    def test_forward_shapes(self, images):
        model = ViTTeacher(cfg=TINY)
        params = model.init(jax.random.PRNGKey(1), images)
        logits, tokens, cls_attns = model.apply(params, images)
        assert logits.shape == (B, 11)
        assert tokens.shape == (B, N, 32)
        assert cls_attns.shape == (B, 4, 2, N + 1)
        # attention rows are distributions
        np.testing.assert_allclose(
            np.asarray(cls_attns).sum(-1), 1.0, atol=1e-5
        )

    def test_cls_attns_stop_gradient(self, images):
        model = ViTTeacher(cfg=TINY)
        params = model.init(jax.random.PRNGKey(1), images)

        def loss(p):
            _, _, ca = model.apply(p, images)
            return jnp.sum(ca)

        g = jax.grad(lambda p: loss(p))(params)
        flat = jax.tree_util.tree_leaves(g)
        assert max(float(jnp.abs(x).max()) for x in flat) == 0.0


class TestStudentFixedRatio:
    def _build(self, **pr_kw):
        pr = PruningConfig(
            pruning_locs=pr_kw.pop("pruning_locs", (1, 2)),
            keep_ratios=pr_kw.pop("keep_ratios", (0.75, 0.5)),
            **pr_kw,
        )
        return DiffPruningStudent(cfg=TINY, pruning=pr)

    def test_static_shapes_shrink(self, images):
        model = self._build()
        params = model.init(jax.random.PRNGKey(2), images)
        out = model.apply(params, images)
        k1, k2 = int(N * 0.75), int(N * 0.5)
        assert out.logits.shape == (B, 11)
        assert out.features.shape == (B, k2, 32)
        assert [p.shape for p in out.pred_logits] == [(B, N), (B, k1)]
        assert [i.shape for i in out.kept_idx] == [(B, k1), (B, k2)]
        assert [i.shape for i in out.dropped_idx] == [(B, N - k1), (B, k1 - k2)]
        assert out.kept_idx_orig.shape == (B, k2)
        # cls_attns widths: blocks 0 (16), 1 (12), 2 (8), 3 (8)
        widths = [a.shape[-1] for a in out.cls_attns]
        assert widths == [N, k1, k2, k2]

    def test_kept_idx_orig_composition(self, images):
        model = self._build()
        params = model.init(jax.random.PRNGKey(2), images)
        out = model.apply(params, images)
        kept0 = np.asarray(out.kept_idx[0])
        kept1 = np.asarray(out.kept_idx[1])
        orig = np.take_along_axis(kept0, kept1, axis=-1)
        np.testing.assert_array_equal(np.asarray(out.kept_idx_orig), orig)

    def test_unpruned_flag_skips_pruning(self, images):
        model = self._build()
        params = model.init(jax.random.PRNGKey(2), images)
        out = model.apply(params, images, unpruned=True)
        assert out.features.shape == (B, N, 32)
        assert out.pred_logits == ()
        assert out.kept_idx_orig is None

    def test_random_drop_mode(self, images):
        model = self._build(selection="random")
        params = model.init(
            {"params": jax.random.PRNGKey(3), "selection": jax.random.PRNGKey(4)},
            images,
        )
        out = model.apply(
            params, images, rngs={"selection": jax.random.PRNGKey(5)}
        )
        assert out.features.shape == (B, int(N * 0.5), 32)

    def test_attn_selection_mode(self, images):
        model = self._build(selection="attn")
        params = model.init(jax.random.PRNGKey(6), images)
        out = model.apply(params, images)
        assert out.features.shape == (B, int(N * 0.5), 32)
        # no predictor params should exist in attn mode
        names = jax.tree_util.tree_leaves_with_path(params)
        assert not any("score_predictor" in str(p) for p, _ in names)

    def test_teacher_cls_selection(self, images):
        model = self._build(cls_from_teacher=True)
        teacher = ViTTeacher(cfg=TINY)
        tp = teacher.init(jax.random.PRNGKey(7), images)
        _, _, t_attns = teacher.apply(tp, images)
        params = model.init(
            jax.random.PRNGKey(8), images, teacher_cls_attns=t_attns
        )
        out = model.apply(params, images, teacher_cls_attns=t_attns)
        assert out.features.shape == (B, int(N * 0.5), 32)

    def test_early_exit_head(self, images):
        model = self._build(early_exit=True)
        params = model.init(jax.random.PRNGKey(9), images)
        out = model.apply(params, images)
        assert out.early_exit_logits.shape == (B, 11)

    def test_gradients_flow_to_predictor_and_backbone(self, images):
        model = self._build()
        params = model.init(jax.random.PRNGKey(2), images)

        def loss(p):
            out = model.apply(p, images)
            return jnp.sum(out.logits**2) + sum(
                jnp.sum(l**2) for l in out.pred_logits
            )

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves_with_path(g)
        pred_g = [
            float(jnp.abs(v).max())
            for p, v in leaves
            if "score_predictor" in str(p)
        ]
        bb_g = [
            float(jnp.abs(v).max()) for p, v in leaves if "blocks_0" in str(p)
        ]
        assert max(pred_g) > 0
        assert max(bb_g) > 0


class TestStudentThreshold:
    def test_threshold_mode_static_shape_masked(self, images):
        pr = PruningConfig(
            pruning_locs=(1,), keep_ratios=(0.5,), patch_score_threshold=0.5
        )
        model = DiffPruningStudent(cfg=TINY, pruning=pr)
        params = model.init(jax.random.PRNGKey(10), images)
        out = model.apply(params, images)
        # shapes never shrink in threshold mode
        assert out.features.shape == (B, N, 32)
        assert out.keep_mask.shape == (B, N)
        assert out.keep_ratios.shape == (B,)
        mask = np.asarray(out.keep_mask)
        assert set(np.unique(mask)).issubset({0.0, 1.0})
        np.testing.assert_allclose(
            np.asarray(out.keep_ratios), mask.mean(-1), atol=1e-6
        )


class TestRegistry:
    def test_factories(self):
        m = create_model(
            "dynamic_vit_tiny_patch16_224_student",
            pruning_locs=(3, 6, 9),
            keep_ratios=(0.7, 0.49, 0.343),
        )
        assert m.cfg.embed_dim == 192
        assert m.pruning.keep_counts(196) == (137, 96, 67)
        t = create_model("dynamic_vit_small_patch16_224_teacher")
        assert t.cfg.embed_dim == 384

    def test_unknown_name_raises(self):
        with pytest.raises(ValueError):
            create_model("nope")


class TestThresholdOverride:
    def test_traced_threshold_changes_keep_counts_without_recompile(self):
        pr = PruningConfig(
            pruning_locs=(1,), keep_ratios=(0.5,), patch_score_threshold=0.5
        )
        model = DiffPruningStudent(cfg=TINY, pruning=pr)
        imgs = jax.random.normal(jax.random.PRNGKey(30), (B, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(31), imgs)

        calls = []

        @jax.jit
        def fwd(thr):
            calls.append(1)  # traces once per compilation
            return model.apply(
                params, imgs, threshold_override=thr
            ).keep_ratios

        lo = fwd(jnp.float32(0.1))
        hi = fwd(jnp.float32(0.9))
        assert len(calls) == 1  # one trace -> no recompilation per threshold
        # a higher threshold drops more mass -> keeps fewer tokens
        assert float(jnp.mean(hi)) < float(jnp.mean(lo))


class TestPadKeepToTile:
    def test_counts_round_up_to_tile(self):
        pr = PruningConfig(
            pruning_locs=(3, 6, 9), keep_ratios=(0.7, 0.49, 0.343),
            pad_keep_to_tile=True,
        )
        # (137, 96, 67) -> K+1 in {144, 112, 80} -> (143, 111, 79)
        assert pr.keep_counts(196) == (143, 111, 79)
        # never exceeds N
        pr2 = PruningConfig(
            pruning_locs=(1,), keep_ratios=(0.99,), pad_keep_to_tile=True
        )
        assert pr2.keep_counts(196) == (196,)

    def test_forward_with_padded_counts(self):
        pr = PruningConfig(
            pruning_locs=(1,), keep_ratios=(0.5,), pad_keep_to_tile=True
        )
        model = DiffPruningStudent(cfg=TINY, pruning=pr)
        imgs = jax.random.normal(jax.random.PRNGKey(40), (B, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(41), imgs)
        out = model.apply(params, imgs)
        # 16 * 0.5 = 8 -> K+1=16 tile -> K=15
        assert out.features.shape == (B, 15, 32)


class TestUnfusedDropoutWarning:
    """Elementwise-dropout-active training silently fell back to the unfused
    flax path; the fallback must announce itself exactly once."""

    def _call_blocks(self, *, drop, use_fused, deterministic):
        import functools
        import warnings

        from dense2sparse_vit_tpu.nn.layers import Block
        from dense2sparse_vit_tpu.ops.pallas import attention as A
        from dense2sparse_vit_tpu.ops.pallas import block as BLK

        # CPU test host: force interpret mode on any kernel that still runs
        patches = [
            (A, "fused_attention_packed",
             functools.partial(A.fused_attention_packed, interpret=True)),
            (BLK, "fused_transformer_block",
             functools.partial(BLK.fused_transformer_block, interpret=True)),
        ]
        saved = [(m, n, getattr(m, n)) for m, n, _ in patches]
        for m, n, repl in patches:
            setattr(m, n, repl)
        try:
            x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32))
            blocks = [
                Block(num_heads=2, drop=drop, use_fused=use_fused)
                for _ in range(2)
            ]
            variables = [
                b.init(
                    {"params": jax.random.PRNGKey(1),
                     "dropout": jax.random.PRNGKey(2)}, x,
                )
                for b in blocks
            ]
            with warnings.catch_warnings(record=True) as caught:
                warnings.simplefilter("always")
                for b, v in zip(blocks, variables):
                    b.apply(
                        v, x, deterministic=deterministic,
                        rngs={"dropout": jax.random.PRNGKey(3)},
                    )
            return [
                w for w in caught if "unfused flax path" in str(w.message)
            ]
        finally:
            for m, n, orig in saved:
                setattr(m, n, orig)

    def test_warns_once_when_dropout_forces_flax_path(self):
        from dense2sparse_vit_tpu.nn import layers as nn_layers

        nn_layers._unfused_dropout_warned[0] = False
        # once, not once per block
        assert len(self._call_blocks(
            drop=0.1, use_fused=True, deterministic=False)) == 1
        # process-once thereafter
        assert len(self._call_blocks(
            drop=0.1, use_fused=True, deterministic=False)) == 0

    def test_no_warning_without_fused_request_or_in_eval(self):
        from dense2sparse_vit_tpu.nn import layers as nn_layers

        nn_layers._unfused_dropout_warned[0] = False
        # unfused model with dropout: nothing to warn about
        assert len(self._call_blocks(
            drop=0.1, use_fused=False, deterministic=False)) == 0
        # fused model in EVAL with dropout configured: fused path is taken
        assert len(self._call_blocks(
            drop=0.1, use_fused=True, deterministic=True)) == 0
        # fused model training without elementwise dropout: fused path
        assert len(self._call_blocks(
            drop=0.0, use_fused=True, deterministic=False)) == 0
