"""Fused one-hot-matmul gather kernel vs take_along_axis (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense2sparse_vit_tpu.ops.pallas.gather import fused_gather_tokens


def _ref_gather(x, idx):
    return jnp.take_along_axis(x, idx[..., None], axis=1)


class TestFusedGather:
    @pytest.mark.parametrize("n,k", [(16, 16), (197, 138), (13, 5)])
    def test_matches_take_along_axis(self, n, k):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, n, 32))
        idx = jax.vmap(
            lambda key: jax.random.permutation(key, n)[:k]
        )(jax.random.split(jax.random.PRNGKey(1), 4)).astype(jnp.int32)
        got = fused_gather_tokens(x, idx, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(_ref_gather(x, idx)), atol=1e-6
        )

    def test_bfloat16_rows_exact(self):
        # one-hot matmul must copy rows EXACTLY (0/1 weights, fp32 accum)
        x = jax.random.normal(
            jax.random.PRNGKey(2), (2, 24, 128)
        ).astype(jnp.bfloat16)
        idx = jnp.array([[3, 0, 17], [23, 1, 2]], jnp.int32)
        got = fused_gather_tokens(x, idx, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(got, np.float32),
            np.asarray(_ref_gather(x, idx), np.float32),
        )

    def test_repeated_indices(self):
        # CLS-style duplicated selections must duplicate rows
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 16))
        idx = jnp.array([[0, 0, 5], [7, 7, 7]], jnp.int32)
        got = fused_gather_tokens(x, idx, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(_ref_gather(x, idx)), atol=1e-6
        )

    def test_backward_scatter_matches_reference(self):
        x = jax.random.normal(jax.random.PRNGKey(4), (4, 21, 32))
        idx = jax.vmap(
            lambda key: jax.random.permutation(key, 21)[:9]
        )(jax.random.split(jax.random.PRNGKey(5), 4)).astype(jnp.int32)

        def loss_fused(x):
            return jnp.sum(fused_gather_tokens(x, idx, 8, True) ** 2)

        def loss_ref(x):
            return jnp.sum(_ref_gather(x, idx) ** 2)

        g_fused = jax.grad(loss_fused)(x)
        g_ref = jax.grad(loss_ref)(x)
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), atol=1e-5
        )

    def test_backward_with_repeated_indices_accumulates(self):
        # scatter-ADD: a row selected twice receives both cotangents
        x = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 16))
        idx = jnp.array([[2, 2, 3]], jnp.int32)
        g_fused = jax.grad(
            lambda x: jnp.sum(fused_gather_tokens(x, idx, 8, True) * 2.0)
        )(x)
        g_ref = jax.grad(lambda x: jnp.sum(_ref_gather(x, idx) * 2.0))(x)
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), atol=1e-6
        )
