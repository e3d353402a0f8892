"""Unit tests for the pure ops layer against independent numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense2sparse_vit_tpu.ops import (
    gather_tokens,
    gumbel_softmax_keep,
    mask_from_scores,
    perturbed_topk,
    softmax_with_policy,
    threshold_keep_mask,
    topk_keep_indices,
    compose_kept_indices,
)
from dense2sparse_vit_tpu.ops.perturbed_topk import _perturbed_topk_core


def np_softmax_with_policy(attn, policy, eps=1e-6):
    """Dense numpy transliteration of the reference math
    (dynamic_vit.py:195-214), used as golden."""
    B, H, N, _ = attn.shape
    ap = policy.reshape(B, 1, 1, N)
    eye = np.eye(N)[None, None]
    ap = ap + (1.0 - ap) * eye
    a = attn - attn.max(-1, keepdims=True)
    a = np.exp(a.astype(np.float64)) * ap
    return (a + eps / N) / (a.sum(-1, keepdims=True) + eps)


class TestSoftmaxWithPolicy:
    def test_matches_numpy_reference(self):
        rng = np.random.default_rng(0)
        attn = rng.normal(size=(2, 3, 9, 9)).astype(np.float32)
        policy = (rng.uniform(size=(2, 9)) > 0.4).astype(np.float32)
        got = softmax_with_policy(jnp.asarray(attn), jnp.asarray(policy))
        want = np_softmax_with_policy(attn, policy)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def test_keep_all_close_to_plain_softmax(self):
        rng = np.random.default_rng(1)
        attn = rng.normal(size=(2, 2, 8, 8)).astype(np.float32)
        policy = np.ones((2, 8), np.float32)
        got = softmax_with_policy(jnp.asarray(attn), jnp.asarray(policy))
        want = jax.nn.softmax(jnp.asarray(attn), axis=-1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_rows_sum_to_one_and_dropped_columns_suppressed(self):
        rng = np.random.default_rng(2)
        attn = rng.normal(size=(1, 1, 6, 6)).astype(np.float32)
        policy = np.array([[1, 1, 0, 1, 0, 1]], np.float32)
        got = np.asarray(
            softmax_with_policy(jnp.asarray(attn), jnp.asarray(policy))
        )
        np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)
        # kept rows give ~0 weight to dropped columns
        kept_rows = got[0, 0][[0, 1, 3, 5]]
        assert kept_rows[:, [2, 4]].max() < 1e-5
        # a dropped token's row: zero weight on OTHER dropped columns, but its
        # own diagonal survives (eye trick, dynamic_vit.py:199-202)
        assert got[0, 0, 2, 4] < 1e-5
        assert got[0, 0, 2, 2] > 1e-3

    def test_policy_3d_accepted(self):
        attn = jnp.zeros((1, 1, 4, 4))
        p2 = jnp.ones((1, 4))
        p3 = jnp.ones((1, 4, 1))
        np.testing.assert_allclose(
            np.asarray(softmax_with_policy(attn, p2)),
            np.asarray(softmax_with_policy(attn, p3)),
        )


class TestTopK:
    def test_matches_numpy_argsort(self):
        rng = np.random.default_rng(3)
        scores = rng.normal(size=(4, 17)).astype(np.float32)
        kept, dropped = topk_keep_indices(jnp.asarray(scores), 5)
        for b in range(4):
            order = np.argsort(-scores[b], kind="stable")
            np.testing.assert_array_equal(
                np.asarray(kept)[b], np.sort(order[:5])
            )
            np.testing.assert_array_equal(
                np.asarray(dropped)[b], np.sort(order[5:])
            )

    def test_gather_tokens(self):
        x = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
        idx = jnp.array([[0, 2], [4, 1]], jnp.int32)
        out = np.asarray(gather_tokens(x, idx))
        np.testing.assert_array_equal(out[0, 1], np.asarray(x)[0, 2])
        np.testing.assert_array_equal(out[1, 0], np.asarray(x)[1, 4])

    def test_mask_from_scores(self):
        scores = jnp.asarray(
            np.random.default_rng(4).normal(size=(3, 10)).astype(np.float32)
        )
        mask = np.asarray(mask_from_scores(scores, 0.5))
        assert mask.shape == (3, 10)
        np.testing.assert_array_equal(mask.sum(-1), 5.0)
        # the kept positions are exactly the top-5 scores
        for b in range(3):
            top = np.argsort(-np.asarray(scores)[b])[:5]
            assert set(np.flatnonzero(mask[b])) == set(top)

    def test_threshold_keep_mask(self):
        # scores: softmax-like mass; threshold 0.5 drops the low tail holding
        # <= 0.5 cumulative mass (reference dynamic_vit.py:880-884)
        scores = np.array([[0.05, 0.1, 0.15, 0.3, 0.4]], np.float32)
        mask, ratios = threshold_keep_mask(jnp.asarray(scores), 0.5)
        mask = np.asarray(mask)
        # ascending cumsum: .05 .15 .3 .6 1.0 -> kept where cumsum > .5
        np.testing.assert_array_equal(mask[0], [0, 0, 0, 1, 1])
        np.testing.assert_allclose(np.asarray(ratios), [2 / 5])

    def test_compose_kept_indices(self):
        # stage 0 keeps originals [1,3,4]; stage 1 keeps locals [0,2] -> orig [1,4]
        s0 = jnp.array([[1, 3, 4]], jnp.int32)
        s1 = jnp.array([[0, 2]], jnp.int32)
        out = np.asarray(compose_kept_indices([s0, s1]))
        np.testing.assert_array_equal(out, [[1, 4]])


class TestPerturbedTopK:
    def _dense_reference(self, x, z, sigma, k):
        """Dense numpy transliteration of the reference forward/backward
        (peturbed_topk.py:27-80)."""
        b, nS, d = z.shape
        perturbed = x[:, None, :] + sigma * z
        idx = np.argsort(-perturbed, axis=-1)[..., :k]
        idx = np.sort(idx, axis=-1)
        onehot = np.zeros((b, nS, k, d), np.float64)
        bi, ni, ki = np.meshgrid(
            np.arange(b), np.arange(nS), np.arange(k), indexing="ij"
        )
        onehot[bi, ni, ki, idx] = 1.0
        indicators = onehot.mean(1)
        expected_grad = (
            np.einsum("bnkd,bnd->bkd", onehot, z) / nS / sigma
        )
        return indicators, expected_grad

    def test_forward_matches_dense_reference(self):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(2, 12)).astype(np.float32)
        z = rng.normal(size=(2, 50, 12)).astype(np.float32)
        sigma = 0.05
        want_fwd, _ = self._dense_reference(x, z, sigma, 4)
        got = _perturbed_topk_core(
            jnp.asarray(x), jnp.asarray(z), jnp.float32(sigma),
            jnp.zeros((4,), jnp.int8),
        )
        np.testing.assert_allclose(np.asarray(got), want_fwd, atol=1e-6)

    def test_backward_matches_dense_reference(self):
        rng = np.random.default_rng(6)
        x = rng.normal(size=(2, 12)).astype(np.float32)
        z = rng.normal(size=(2, 50, 12)).astype(np.float32)
        g = rng.normal(size=(2, 4, 12)).astype(np.float32)
        sigma = 0.05
        _, expected_grad = self._dense_reference(x, z, sigma, 4)
        want = np.einsum("bkd,bkd->bd", g, expected_grad)

        fn = lambda xx: _perturbed_topk_core(
            xx, jnp.asarray(z), jnp.float32(sigma), jnp.zeros((4,), jnp.int8)
        )
        _, vjp = jax.vjp(fn, jnp.asarray(x))
        (got,) = vjp(jnp.asarray(g))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    def test_wrapper_rows_are_distributions(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(jax.random.PRNGKey(1), (3, 20))
        out = perturbed_topk(key, x, k=7, num_samples=100, sigma=0.05)
        assert out.shape == (3, 7, 20)
        np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)

    def test_wrapper_grad_nonzero_and_finite(self):
        key = jax.random.PRNGKey(2)
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 16))
        loss = lambda xx: jnp.sum(
            perturbed_topk(key, xx, k=5, num_samples=200, sigma=0.5) ** 2
        )
        g = jax.grad(loss)(x)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestGumbel:
    def test_hard_keep_decisions_binary_and_anded(self):
        key = jax.random.PRNGKey(0)
        logits = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 2))
        prev = jnp.ones((4, 10, 1)).at[:, :3].set(0.0)
        out = np.asarray(gumbel_softmax_keep(key, logits, prev))
        assert out.shape == (4, 10, 1)
        # straight-through forward is hard up to float rounding
        assert np.all(np.isclose(out, 0.0, atol=1e-5) | np.isclose(out, 1.0, atol=1e-5))
        # previously dropped tokens stay dropped
        np.testing.assert_allclose(out[:, :3], 0.0, atol=1e-6)

    def test_straight_through_gradient_flows(self):
        key = jax.random.PRNGKey(4)
        logits = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 2))
        prev = jnp.ones((2, 6, 1))
        g = jax.grad(
            lambda l: jnp.sum(gumbel_softmax_keep(key, l, prev))
        )(logits)
        assert np.abs(np.asarray(g)).max() > 0

    def test_distribution_sanity(self):
        # strongly keep-biased logits should mostly keep
        key = jax.random.PRNGKey(6)
        logits = jnp.stack(
            [jnp.full((1, 1000), 4.0), jnp.full((1, 1000), -4.0)], axis=-1
        )
        out = np.asarray(
            gumbel_softmax_keep(key, logits, jnp.ones((1, 1000, 1)))
        )
        assert out.mean() > 0.9
