"""Fused MLP half-block kernel vs the flax Block MLP (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense2sparse_vit_tpu.ops.pallas.mlp import (
    _reference_mlp_residual,
    fused_mlp_residual,
)


def _make(b=2, n=13, c=32, hidden=128, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    x = jax.random.normal(ks[0], (b, n, c))
    ln_scale = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
    ln_bias = 0.1 * jax.random.normal(ks[2], (c,))
    w1 = jax.random.normal(ks[3], (c, hidden)) * 0.05
    b1 = 0.1 * jax.random.normal(ks[4], (hidden,))
    w2 = jax.random.normal(ks[5], (hidden, c)) * 0.05
    b2 = 0.1 * jax.random.normal(ks[6], (c,))
    return x, ln_scale, ln_bias, w1, b1, w2, b2


class TestFusedMlp:
    @pytest.mark.parametrize("n", [13, 16])  # padded and aligned
    def test_matches_reference(self, n):
        args = _make(n=n)
        want = _reference_mlp_residual(*args, 1e-6)
        got = fused_mlp_residual(*args, 1e-6, 8, True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-3, rtol=1e-3
        )

    def test_matches_flax_block_mlp_half(self):
        # against the actual flax modules at DeiT-S width
        import flax.linen as nn

        from dense2sparse_vit_tpu.nn.layers import Mlp

        c, hidden = 384, 1536
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 13, c))
        ln = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False)
        mlp = Mlp(hidden_features=hidden)
        lp = ln.init(jax.random.PRNGKey(4), x)["params"]
        mp = mlp.init(jax.random.PRNGKey(5), x)["params"]
        want = x + mlp.apply({"params": mp}, ln.apply({"params": lp}, x))
        got = fused_mlp_residual(
            x, lp["scale"], lp["bias"],
            mp["fc1"]["kernel"], mp["fc1"]["bias"],
            mp["fc2"]["kernel"], mp["fc2"]["bias"],
            1e-6, 8, True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-2, rtol=1e-2
        )

    def test_gradients_flow_via_reference_vjp(self):
        args = _make(n=16)

        def loss_fused(x, *w):
            return jnp.sum(fused_mlp_residual(x, *w, 1e-6, 8, True) ** 2)

        def loss_ref(x, *w):
            return jnp.sum(_reference_mlp_residual(x, *w, 1e-6) ** 2)

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 3, 5))(*args)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 3, 5))(*args)
        for gf, gr in zip(g_fused, g_ref):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), atol=1e-3, rtol=1e-3
            )

    def test_block_routes_to_fused_on_deterministic(self, monkeypatch):
        import dense2sparse_vit_tpu.ops.pallas.block as BK
        from dense2sparse_vit_tpu.nn.layers import Block

        calls = []
        orig_ftb = BK.fused_transformer_block

        def spy(*a, **k):
            calls.append(1)
            return orig_ftb(*a, **{**k, "interpret": True})

        # Block's deterministic path goes through the whole-block kernel
        monkeypatch.setattr(BK, "fused_transformer_block", spy)
        # init still traces the flax Attention path (packed kernel): run it
        # in interpret mode on CPU
        import dense2sparse_vit_tpu.ops.pallas.attention as A

        orig_attn = A.fused_attention_packed
        monkeypatch.setattr(
            A, "fused_attention_packed",
            lambda *a, **k: orig_attn(*a, **{**k, "interpret": True}),
        )
        blk = Block(num_heads=2, dtype=jnp.float32, use_fused=True)
        x = jax.random.normal(jax.random.PRNGKey(6), (2, 16, 32))
        params = blk.init(jax.random.PRNGKey(7), x)
        out_fused = blk.apply(params, x, deterministic=True)
        assert calls, "fused whole-block path not taken"
        blk_ref = Block(num_heads=2, dtype=jnp.float32, use_fused=False)
        out_ref = blk_ref.apply(params, x, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_ref), atol=2e-3, rtol=1e-3
        )


class TestFusedMlpBackwardKernel:
    """The fused backward kernel vs jax.vjp of the reference formula,
    for every cotangent, aligned and padded N."""

    @pytest.mark.parametrize("n", [16, 13])
    def test_all_cotangents_match(self, n):
        args = _make(n=n, seed=4)

        def loss_fused(*a):
            return jnp.sum(fused_mlp_residual(*a, 1e-6, 8, True) ** 2)

        def loss_ref(*a):
            return jnp.sum(_reference_mlp_residual(*a, 1e-6) ** 2)

        g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
        g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
        names = ["dx", "dln_scale", "dln_bias", "dw1", "db1", "dw2", "db2"]
        for name, gf, gr in zip(names, g_fused, g_ref):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), atol=5e-3, rtol=5e-3,
                err_msg=name,
            )


class TestMlpKernelOddBatch:
    def test_forward_and_backward_odd_batch(self):
        args = _make(b=3, n=13, seed=9)  # B=3 -> nb=1
        want = _reference_mlp_residual(*args, 1e-6)
        got = fused_mlp_residual(*args, 1e-6, 8, True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-3, rtol=1e-3
        )
        g = jax.grad(
            lambda *a: jnp.sum(fused_mlp_residual(*a, 1e-6, 8, True) ** 2)
        )(*args)
        assert np.isfinite(np.asarray(g)).all()
