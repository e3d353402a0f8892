"""Whole-block single-kernel vs the composed half-block references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense2sparse_vit_tpu.ops.pallas.block import (
    _ref_block,
    fused_transformer_block,
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

    def test_policy_and_cls(self):
        p = _params(seed=62)
        n = 16
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
        assert cls.shape == (2, 2, n)
