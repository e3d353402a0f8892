"""Loss parity tests against torch-functional goldens.

The goldens transliterate the documented reference math (losses.py) using
torch's own primitives (F.kl_div / cross_entropy), giving an independent
implementation to check the JAX versions bit-for-bit at fp32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from dense2sparse_vit_tpu.losses import (
    aggregate_teacher_cls_attn,
    backbone_loss,
    kd_loss,
    keep_ratio_loss,
    mask_loss,
)
from dense2sparse_vit_tpu.losses.backbone_loss import soft_target_cross_entropy

B, L, H, N = 4, 4, 3, 16
R = [0.75, 0.5]  # keep ratios; K = 12, 8


def _fixture(seed=0):
    rng = np.random.default_rng(seed)
    attns = rng.uniform(0.01, 1.0, size=(B, L, H, N + 1)).astype(np.float32)
    attns /= attns.sum(-1, keepdims=True)
    k1, k2 = int(N * R[0]), int(N * R[1])
    pred0 = rng.normal(size=(B, N)).astype(np.float32)
    pred1 = rng.normal(size=(B, k1)).astype(np.float32)
    kept0 = np.sort(
        np.stack([rng.choice(N, size=k1, replace=False) for _ in range(B)]), -1
    ).astype(np.int32)
    kept1 = np.sort(
        np.stack([rng.choice(k1, size=k2, replace=False) for _ in range(B)]), -1
    ).astype(np.int32)
    return attns, [pred0, pred1], [kept0, kept1]


def torch_mask_loss_kl(attns, preds, kept):
    """Golden: reference kl_div branch (losses.py:76-96)."""
    cls_attn = torch.tensor(attns).mean(dim=1)  # (B, H, N+1)
    cls_attn, _ = cls_attn.max(dim=1)  # (B, N+1)
    renorm = cls_attn[:, 1:] / cls_attn[:, 1:].sum(-1, keepdim=True)
    loss = 0.0
    for i, p in enumerate(preds):
        p = torch.tensor(p)
        if i > 0:
            renorm = torch.gather(renorm, 1, torch.tensor(kept[i - 1]).long())
            renorm = renorm / renorm.sum(1, keepdim=True)
        loss = loss + F.kl_div(
            F.log_softmax(p, dim=-1),
            torch.log(renorm),
            log_target=True,
            reduction="batchmean",
        )
    return float(loss)


class TestMaskLoss:
    def test_kl_matches_torch_golden(self):
        attns, preds, kept = _fixture()
        got, metrics = mask_loss(
            [jnp.asarray(p) for p in preds],
            jnp.asarray(attns),
            [jnp.asarray(k) for k in kept],
            R,
            loss_type="kl_div",
        )
        want = torch_mask_loss_kl(attns, preds, kept)
        np.testing.assert_allclose(float(got), want, rtol=2e-4)
        assert 0.0 <= float(metrics["mask_acc_0"]) <= 1.0

    def test_mse_matches_torch_golden(self):
        attns, preds, kept = _fixture(1)
        got, _ = mask_loss(
            [jnp.asarray(p) for p in preds],
            jnp.asarray(attns),
            [jnp.asarray(k) for k in kept],
            R,
            loss_type="mse",
        )
        # golden (losses.py:61-74): 100 * mse(raw_scores, renorm), chained
        cls_attn = torch.tensor(attns).mean(1).max(1)[0]
        renorm = cls_attn[:, 1:] / cls_attn[:, 1:].sum(-1, keepdim=True)
        want = 0.0
        for i, p in enumerate(preds):
            if i > 0:
                renorm = torch.gather(renorm, 1, torch.tensor(kept[i - 1]).long())
                renorm = renorm / renorm.sum(1, keepdim=True)
            want = want + 100 * F.mse_loss(
                torch.tensor(p), renorm, reduction="mean"
            )
        np.testing.assert_allclose(float(got), float(want), rtol=2e-4)

    def test_bce_mode_finite_and_positive(self):
        attns, preds, kept = _fixture(2)
        got, _ = mask_loss(
            [jnp.asarray(p) for p in preds],
            jnp.asarray(attns),
            [jnp.asarray(k) for k in kept],
            R,
            loss_type="bce",
        )
        assert np.isfinite(float(got)) and float(got) > 0

    def test_perfect_predictor_low_kl(self):
        attns, _, kept = _fixture(3)
        renorm = np.asarray(aggregate_teacher_cls_attn(jnp.asarray(attns)))
        # predictor logits = log of the target => KL ~ 0 at stage 0
        got, _ = mask_loss(
            [jnp.asarray(np.log(renorm))],
            jnp.asarray(attns),
            [jnp.asarray(kept[0])],
            [R[0]],
        )
        assert float(got) < 1e-4  # fp32 log/softmax roundtrip noise


class TestBackboneLoss:
    def test_matches_torch_golden_single_stage(self):
        rng = np.random.default_rng(4)
        C, K, D = 10, 8, 12
        ls = rng.normal(size=(B, C)).astype(np.float32)
        lt = rng.normal(size=(B, C)).astype(np.float32)
        ts = rng.normal(size=(B, K, D)).astype(np.float32)
        tt = rng.normal(size=(B, N, D)).astype(np.float32)
        labels = rng.integers(0, C, size=(B,))
        kept = np.sort(
            np.stack([rng.choice(N, size=K, replace=False) for _ in range(B)]),
            -1,
        ).astype(np.int32)

        got, m = backbone_loss(
            jnp.asarray(ls), jnp.asarray(ts), jnp.asarray(lt), jnp.asarray(tt),
            jnp.asarray(labels), kept_idx_orig=jnp.asarray(kept),
        )

        tls, tlt = torch.tensor(ls), torch.tensor(lt)
        cls_loss = F.cross_entropy(tls, torch.tensor(labels).long())
        cls_kl = F.kl_div(
            F.log_softmax(tls, -1), F.log_softmax(tlt, -1),
            reduction="batchmean", log_target=True,
        )
        g = torch.gather(
            torch.tensor(tt), 1,
            torch.tensor(kept).long()[..., None].expand(-1, -1, D),
        )
        token_kl = F.kl_div(
            F.log_softmax(torch.tensor(ts), -1).reshape(-1, D),
            F.log_softmax(g, -1).reshape(-1, D),
            reduction="batchmean", log_target=True,
        )
        want = float(cls_loss + cls_kl + token_kl)
        np.testing.assert_allclose(float(got), want, rtol=2e-4)
        np.testing.assert_allclose(float(m["cls_loss"]), float(cls_loss), rtol=2e-4)

    def test_soft_target_ce_matches_timm_semantics(self):
        rng = np.random.default_rng(5)
        logits = rng.normal(size=(B, 10)).astype(np.float32)
        target = rng.uniform(size=(B, 10)).astype(np.float32)
        target /= target.sum(-1, keepdims=True)
        got = soft_target_cross_entropy(jnp.asarray(logits), jnp.asarray(target))
        want = torch.mean(
            torch.sum(
                -torch.tensor(target)
                * F.log_softmax(torch.tensor(logits), dim=-1),
                dim=-1,
            )
        )
        np.testing.assert_allclose(float(got), float(want), rtol=2e-4)

    def test_threshold_mode_masked_token_kl(self):
        rng = np.random.default_rng(6)
        C, D = 10, 12
        ls = rng.normal(size=(B, C)).astype(np.float32)
        ts = rng.normal(size=(B, N, D)).astype(np.float32)
        tt = rng.normal(size=(B, N, D)).astype(np.float32)
        labels = rng.integers(0, C, size=(B,))
        mask = (rng.uniform(size=(B, N)) > 0.5).astype(np.float32)
        got, m = backbone_loss(
            jnp.asarray(ls), jnp.asarray(ts), jnp.asarray(ls), jnp.asarray(tt),
            jnp.asarray(labels), keep_mask=jnp.asarray(mask),
        )
        assert np.isfinite(float(got))
        assert float(m["token_kl_loss"]) >= 0


class TestBackboneLossPrecomputedDistribution:
    """The cached-teacher fast path (token_probs + token_entropy) must give
    the SAME token KL as the raw-tokens path: KL_row = sum q*log q -
    sum q*ls, with q = softmax(tokens_t)."""

    def _inputs(self, B=3, K=5, N=8, C=6, ncls=7):
        k = jax.random.PRNGKey(0)
        ks = jax.random.split(k, 6)
        logits_s = jax.random.normal(ks[0], (B, ncls))
        logits_t = jax.random.normal(ks[1], (B, ncls))
        tokens_s = jax.random.normal(ks[2], (B, K, C))
        tokens_t = jax.random.normal(ks[3], (B, N, C))
        labels = jax.random.randint(ks[4], (B,), 0, ncls)
        kept = jnp.sort(
            jax.random.permutation(
                ks[5], jnp.arange(N)[None].repeat(B, 0), axis=1,
                independent=True,
            )[:, :K], axis=1,
        )
        logq = jax.nn.log_softmax(tokens_t, axis=-1)
        q = jnp.exp(logq)
        h = jnp.sum(q * logq, axis=-1)
        return logits_s, tokens_s, logits_t, tokens_t, labels, kept, q, h

    def test_kept_idx_path_matches(self):
        ls, ts, lt, tt, y, kept, q, h = self._inputs()
        ref, mref = backbone_loss(ls, ts, lt, tt, y, kept_idx_orig=kept)
        fast, mfast = backbone_loss(
            ls, ts, lt, None, y, kept_idx_orig=kept,
            tokens_t_probs=q, tokens_t_entropy=h,
        )
        np.testing.assert_allclose(float(ref), float(fast), rtol=1e-6)
        np.testing.assert_allclose(
            float(mref["token_kl_loss"]), float(mfast["token_kl_loss"]),
            rtol=1e-6,
        )

    def test_keep_mask_path_matches(self):
        ls, ts, lt, tt, y, _, q, h = self._inputs(K=8)
        mask = (jax.random.uniform(jax.random.PRNGKey(9), (3, 8)) > 0.4)
        mask = mask.astype(jnp.float32)
        ref, _ = backbone_loss(ls, ts, lt, tt, y, keep_mask=mask)
        fast, _ = backbone_loss(
            ls, ts, lt, None, y, keep_mask=mask,
            tokens_t_probs=q, tokens_t_entropy=h,
        )
        np.testing.assert_allclose(float(ref), float(fast), rtol=1e-6)


class TestDistill:
    def test_keep_ratio_loss_zero_at_target(self):
        probs = [jnp.full((B, N), 0.75), jnp.full((B, 12), 0.5)]
        assert float(keep_ratio_loss(probs, [0.75, 0.5])) < 1e-10

    def test_kd_loss_components(self):
        rng = np.random.default_rng(7)
        ls = jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 10, size=(B,)))
        keep = jnp.full((B, N), 0.35)
        # at epoch >= 40 the target ratio floor is 0.35 => zero penalty
        loss, m = kd_loss(ls, ls, labels, keep, epoch=50.0)
        np.testing.assert_allclose(float(m["kd_kl"]), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(m["kd_ratio_penalty"]), 0.0, atol=1e-8)
        assert float(m["kd_ce"]) > 0
