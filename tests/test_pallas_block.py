"""Whole-block single-kernel vs the composed half-block references."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dense2sparse_vit_tpu.ops.pallas.attention as A
import dense2sparse_vit_tpu.ops.pallas.block as BLK
import dense2sparse_vit_tpu.ops.pallas.mlp as M
from dense2sparse_vit_tpu.ops.pallas.block import (
    _ref_block,
    fused_transformer_block,
    fused_transformer_block_trainable,
)


def _params(c=32, hidden=128, seed=60):
    ks = jax.random.split(jax.random.PRNGKey(seed), 12)
    return {
        "ln1_scale": 1.0 + 0.1 * jax.random.normal(ks[0], (c,)),
        "ln1_bias": 0.1 * jax.random.normal(ks[1], (c,)),
        "wqkv": jax.random.normal(ks[2], (c, 3 * c)) * 0.1,
        "bqkv": 0.1 * jax.random.normal(ks[3], (3 * c,)),
        "wproj": jax.random.normal(ks[4], (c, c)) * 0.1,
        "bproj": 0.1 * jax.random.normal(ks[5], (c,)),
        "ln2_scale": 1.0 + 0.1 * jax.random.normal(ks[6], (c,)),
        "ln2_bias": 0.1 * jax.random.normal(ks[7], (c,)),
        "w1": jax.random.normal(ks[8], (c, hidden)) * 0.1,
        "b1": 0.1 * jax.random.normal(ks[9], (hidden,)),
        "w2": jax.random.normal(ks[10], (hidden, c)) * 0.1,
        "b2": 0.1 * jax.random.normal(ks[11], (c,)),
    }


class TestFusedTransformerBlock:
    @pytest.mark.parametrize("n", [16, 13])
    def test_plain_matches_composed_reference(self, n):
        p = _params()
        x = jax.random.normal(jax.random.PRNGKey(61), (2, n, 32))
        want = _ref_block(x, p, 2, None, None, 1e-6)
        got = fused_transformer_block(x, p, 2, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-3, rtol=2e-3
        )

    def _ref_cls(self, x, p, num_heads, pol):
        """Reference CLS-row attention probabilities of the block's
        attention half: LN1 -> qkv -> softmax(_with_policy) row 0."""
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu
        h = ((x32 - mu) * jax.lax.rsqrt(var + 1e-6)
             * p["ln1_scale"].astype(jnp.float32)
             + p["ln1_bias"].astype(jnp.float32)).astype(x.dtype)
        qkv = h @ p["wqkv"].astype(x.dtype) + p["bqkv"].astype(x.dtype)
        _, cls = A._ref_attention_packed_with_cls(qkv, num_heads, pol, None)
        return cls

    @pytest.mark.parametrize("n", [16, 13])
    def test_policy_and_cls_values(self, n):
        p = _params(seed=62)
        x = jax.random.normal(jax.random.PRNGKey(63), (2, n, 32))
        pol = (jax.random.uniform(jax.random.PRNGKey(64), (2, n)) > 0.3
               ).astype(jnp.float32)
        want = _ref_block(x, p, 2, pol, None, 1e-6)
        got, cls = fused_transformer_block(
            x, p, 2, pol, return_cls=True, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-3, rtol=2e-3
        )
        # CLS probabilities checked by VALUE against the jnp reference
        want_cls = self._ref_cls(x, p, 2, pol)
        np.testing.assert_allclose(
            np.asarray(cls), np.asarray(want_cls), atol=3e-3, rtol=2e-3
        )

    @pytest.mark.parametrize("n", [16, 13])
    @pytest.mark.parametrize("use_policy", [False, True])
    def test_branch_scales_match_scaled_reference(self, n, use_policy):
        """DropPath as per-sample branch-scale operands: kernel output
        must match the reference with each residual branch scaled."""
        p = _params(seed=80)
        x = jax.random.normal(jax.random.PRNGKey(81), (4, n, 32))
        pol = (
            (jax.random.uniform(jax.random.PRNGKey(82), (4, n)) > 0.3
             ).astype(jnp.float32)
            if use_policy else None
        )
        # realistic stochastic-depth draws: some zeros, some 1/keep
        keep = 0.75
        bs = (
            jnp.array([0.0, 1 / keep, 1 / keep, 0.0], jnp.float32),
            jnp.array([1 / keep, 0.0, 1 / keep, 1 / keep], jnp.float32),
        )
        want = _ref_block(x, p, 2, pol, None, 1e-6, branch_scales=bs)
        got = fused_transformer_block(
            x, p, 2, pol, branch_scales=bs, exact=True, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-3, rtol=2e-3
        )

    @pytest.mark.parametrize("n", [16, 13])
    def test_plain_cls_values(self, n):
        p = _params(seed=66)
        x = jax.random.normal(jax.random.PRNGKey(67), (2, n, 32))
        got, cls = fused_transformer_block(
            x, p, 2, return_cls=True, interpret=True
        )
        want_cls = self._ref_cls(x, p, 2, None)
        np.testing.assert_allclose(
            np.asarray(cls), np.asarray(want_cls), atol=3e-3, rtol=2e-3
        )


class TestBlockDropPathFusedPath:
    """nn.layers.Block with drop_path>0 (and elementwise dropout 0) must
    take the FUSED whole-block path in training — the round-2 verdict's
    'from-scratch recipes silently lose the fused speedup' gap."""

    def test_droppath_training_runs_fused_and_differentiates(self):
        from dense2sparse_vit_tpu.nn.layers import Block

        blk = Block(
            num_heads=2, drop_path=0.5, dtype=jnp.float32, use_fused=True
        )
        x = jax.random.normal(jax.random.PRNGKey(100), (4, 16, 32))

        calls = []
        orig = BLK.fused_transformer_block

        def spy(*a, **kw):
            calls.append(1)
            return orig(*a, **kw, interpret=True)

        patches = [
            (BLK, "fused_transformer_block", spy),
            (BLK, "fused_transformer_block_backward",
             functools.partial(
                 BLK.fused_transformer_block_backward, interpret=True)),
            # init runs the flax Attention branch, which still calls the
            # packed attention kernel when use_fused is set
            (A, "fused_attention_packed",
             functools.partial(A.fused_attention_packed, interpret=True)),
        ]
        saved = [(mod, name, getattr(mod, name)) for mod, name, _ in patches]
        for mod, name, repl in patches:
            setattr(mod, name, repl)
        try:
            variables = blk.init(
                {
                    "params": jax.random.PRNGKey(101),
                    "dropout": jax.random.PRNGKey(102),
                },
                x,
            )

            def loss(params, rng):
                y = blk.apply(
                    {"params": params}, x, deterministic=False,
                    rngs={"dropout": rng},
                )
                return jnp.sum(y * y)

            grads = jax.grad(loss)(
                variables["params"], jax.random.PRNGKey(103)
            )
        finally:
            for mod, name, orig_fn in saved:
                setattr(mod, name, orig_fn)

        assert calls, "drop_path training did not take the fused path"
        flat = jax.tree.leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(leaf))) for leaf in flat)
        assert any(float(jnp.abs(leaf).max()) > 0 for leaf in flat)

    def test_t2t_from_scratch_recipe_trains_fused(self):
        """Model-level pin: a T2T backbone with drop_path_rate > 0 (the
        from-scratch recipe every T2T factory exposes) trains through the
        fused whole-block kernels."""
        from dense2sparse_vit_tpu.core.config import ModelConfig
        from dense2sparse_vit_tpu.models.t2t import T2TViT

        cfg = ModelConfig(
            img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
            num_classes=5, drop_path_rate=0.3, use_fused_attention=True,
            mlp_ratio=1.0,
        )
        model = T2TViT(cfg=cfg, tokens_type="transformer", token_dim=16)
        x = jax.random.normal(jax.random.PRNGKey(110), (4, 32, 32, 3))

        calls = []
        orig = BLK.fused_transformer_block

        def spy(*a, **kw):
            calls.append(1)
            return orig(*a, **kw, interpret=True)

        patches = [
            (BLK, "fused_transformer_block", spy),
            (BLK, "fused_transformer_block_backward",
             functools.partial(
                 BLK.fused_transformer_block_backward, interpret=True)),
            (A, "fused_attention_packed",
             functools.partial(A.fused_attention_packed, interpret=True)),
        ]
        saved = [(mod, name, getattr(mod, name)) for mod, name, _ in patches]
        for mod, name, repl in patches:
            setattr(mod, name, repl)
        try:
            variables = model.init(
                {
                    "params": jax.random.PRNGKey(111),
                    "dropout": jax.random.PRNGKey(112),
                },
                x,
            )

            def loss(params, rng):
                out = model.apply(
                    {"params": params}, x, deterministic=False,
                    rngs={"dropout": rng},
                )
                logits = out[0] if isinstance(out, (tuple, list)) else out
                return jnp.sum(jnp.asarray(logits) ** 2) / 1000.0

            grads = jax.grad(loss)(
                variables["params"], jax.random.PRNGKey(113)
            )
        finally:
            for mod, name, orig_fn in saved:
                setattr(mod, name, orig_fn)

        assert calls, "T2T drop_path training did not take the fused path"
        flat = jax.tree.leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(leaf))) for leaf in flat)


class TestBlockTrainableVJP:
    """Direct VJP equivalence of fused_transformer_block_trainable — the
    exact kernel path every training block takes (nn/layers.py::Block) —
    against jax.vjp of the composed jnp reference: all 13 cotangents
    (dx + 12 parameter grads), plus dPolicy in policy mode, aligned and
    padded N."""

    def _patched(self):
        """Force interpret=True on every pallas entry the trainable path
        hits (tests run on CPU)."""
        return [
            (BLK, "fused_transformer_block",
             functools.partial(fused_transformer_block, interpret=True)),
            (BLK, "fused_transformer_block_backward",
             functools.partial(
                 BLK.fused_transformer_block_backward, interpret=True)),
            (A, "fused_attention_block",
             functools.partial(A.fused_attention_block, interpret=True)),
            (A, "fused_attention_block_backward",
             functools.partial(
                 A.fused_attention_block_backward, interpret=True)),
            (A, "fused_attention_block_backward_policy",
             functools.partial(
                 A.fused_attention_block_backward_policy, interpret=True)),
            (M, "fused_mlp_residual_backward",
             functools.partial(
                 M.fused_mlp_residual_backward, interpret=True)),
        ]

    @pytest.mark.parametrize("n", [16, 13])
    @pytest.mark.parametrize("use_policy", [False, True])
    def test_all_cotangents_match_reference_vjp(self, n, use_policy):
        p = _params(seed=70)
        x = jax.random.normal(jax.random.PRNGKey(71), (4, n, 32))
        pol = (
            (jax.random.uniform(jax.random.PRNGKey(72), (4, n)) > 0.3
             ).astype(jnp.float32)
            if use_policy else None
        )
        g = jax.random.normal(jax.random.PRNGKey(73), (4, n, 32))

        if use_policy:
            want_out, ref_vjp = jax.vjp(
                lambda xx, pp, pol_: _ref_block(xx, pp, 2, pol_, None, 1e-6),
                x, p, pol,
            )
            want = ref_vjp(g)  # (dx, dparams, dpol)
        else:
            want_out, ref_vjp = jax.vjp(
                lambda xx, pp: _ref_block(xx, pp, 2, None, None, 1e-6), x, p
            )
            want = ref_vjp(g) + (None,)

        patches = self._patched()
        saved = [(mod, name, getattr(mod, name)) for mod, name, _ in patches]
        for mod, name, repl in patches:
            setattr(mod, name, repl)
        try:
            got_out, fused_vjp = jax.vjp(
                lambda xx, pp, pol_: fused_transformer_block_trainable(
                    xx, pp, 2, pol_
                ),
                x, p, pol,
            )
            got = fused_vjp(g)
        finally:
            for mod, name, orig in saved:
                setattr(mod, name, orig)

        np.testing.assert_allclose(
            np.asarray(got_out), np.asarray(want_out), atol=3e-3, rtol=2e-3
        )
        # dx
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(want[0]), atol=5e-3, rtol=5e-3
        )
        # the 12 parameter cotangents
        for key in p:
            np.testing.assert_allclose(
                np.asarray(got[1][key]), np.asarray(want[1][key]),
                atol=5e-3, rtol=5e-3, err_msg=f"param cotangent {key}",
            )
        # dPolicy
        if use_policy:
            np.testing.assert_allclose(
                np.asarray(got[2]), np.asarray(want[2]),
                atol=5e-3, rtol=5e-3, err_msg="dpolicy",
            )
        else:
            assert got[2] is None

    @pytest.mark.parametrize("n", [16, 13])
    @pytest.mark.parametrize("use_policy", [False, True])
    def test_cotangents_with_branch_scales(self, n, use_policy):
        """All 13 cotangents (+dPolicy) with DropPath branch scales
        active — the fused path from-scratch T2T/TNT recipes train on."""
        p = _params(seed=90)
        x = jax.random.normal(jax.random.PRNGKey(91), (4, n, 32))
        pol = (
            (jax.random.uniform(jax.random.PRNGKey(92), (4, n)) > 0.3
             ).astype(jnp.float32)
            if use_policy else None
        )
        g = jax.random.normal(jax.random.PRNGKey(93), (4, n, 32))
        keep = 0.75
        bs = (
            jnp.array([0.0, 1 / keep, 1 / keep, 1 / keep], jnp.float32),
            jnp.array([1 / keep, 0.0, 1 / keep, 1 / keep], jnp.float32),
        )

        want_out, ref_vjp = jax.vjp(
            lambda xx, pp, pol_: _ref_block(
                xx, pp, 2, pol_, None, 1e-6, branch_scales=bs
            ),
            x, p, pol,
        )
        want = ref_vjp(g)

        patches = self._patched()
        saved = [(mod, name, getattr(mod, name)) for mod, name, _ in patches]
        for mod, name, repl in patches:
            setattr(mod, name, repl)
        try:
            got_out, fused_vjp = jax.vjp(
                lambda xx, pp, pol_: fused_transformer_block_trainable(
                    xx, pp, 2, pol_, None, 1e-6, bs
                ),
                x, p, pol,
            )
            got = fused_vjp(g)
        finally:
            for mod, name, orig in saved:
                setattr(mod, name, orig)

        np.testing.assert_allclose(
            np.asarray(got_out), np.asarray(want_out), atol=3e-3, rtol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(want[0]), atol=5e-3, rtol=5e-3
        )
        for key in p:
            np.testing.assert_allclose(
                np.asarray(got[1][key]), np.asarray(want[1][key]),
                atol=5e-3, rtol=5e-3, err_msg=f"param cotangent {key}",
            )
        if use_policy:
            np.testing.assert_allclose(
                np.asarray(got[2]), np.asarray(want[2]),
                atol=5e-3, rtol=5e-3, err_msg="dpolicy",
            )
