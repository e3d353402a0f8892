"""Overfit-one-batch acceptance gate (run on the real TPU chip).

The reference keeps this as a commented-out fixture (train.py:22-25,
ddp_training.py:43-45, optimized_mask.py:54-57): repeat a single batch and
check the model can drive the loss down. Here it is an actual gate: 400
train steps on one fixed batch of the flagship DeiT-S 3-stage config must
overfit it: cross-entropy drops >= 8x, the total loss drops >= 4x, and
final mask accuracy is >= 0.9 without regressing. The thresholds reflect
the JOINT loss's equilibrium, not free memorization: the distill KL pulls
the student's logits toward a teacher that does not know the random
labels, so CE plateaus near 0.68 (measured 10.2x at 400 steps) and the
total loss keeps irreducible mask-KL/distill floors (measured 5.7x).
A broken optimization path sits far below these (the production
backbone-lr cap alone gives CE ~2x). Exits non-zero on failure.

Two gate-specific config choices (vs production):
  * backbone_lr_scale=1.0 — the production schedule caps the backbone at
    lr*0.01 (utils.py:141-147 semantics), which by design cannot overfit a
    batch this fast; the gate tests the OPTIMIZATION PATH, so the
    backbone gets the full cosine lr.
  * all steps run device-side in one lax.scan — under the axon relay every
    host readback is an RPC, so per-step float() would dominate wall time.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/overfit_gate.py
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

B = 32
STEPS = 400


def main() -> int:
    from dense2sparse_vit_tpu.core.config import (
        ExperimentConfig,
        PruningConfig,
        TrainConfig,
        deit_small,
    )
    from dense2sparse_vit_tpu.models import DiffPruningStudent, ViTTeacher
    from dense2sparse_vit_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    mcfg = deit_small(dtype="bfloat16", use_fused_attention=True)
    cfg = ExperimentConfig(
        model=mcfg,
        pruning=PruningConfig(
            pruning_locs=(3, 6, 9), keep_ratios=(0.7, 0.49, 0.343)
        ),
        # warmup_epochs=0: both losses active from step 0; epochs is large so
        # the cosine stays near its base lr across the gate's steps
        train=TrainConfig(
            batch_size=B, epochs=10_000, warmup_epochs=0,
            backbone_lr_scale=1.0,
        ),
    )
    student = DiffPruningStudent(cfg=mcfg, pruning=cfg.pruning)
    teacher = ViTTeacher(cfg=mcfg)
    imgs = jax.random.normal(
        jax.random.PRNGKey(0), (B, 224, 224, 3), jnp.bfloat16
    )
    labels = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, 1000)
    tx = make_optimizer(cfg.train, steps_per_epoch=1)
    state = create_train_state(student, tx, jax.random.PRNGKey(2), imgs[:1])
    tparams = teacher.init(jax.random.PRNGKey(3), imgs[:1])["params"]
    step = make_train_step(student, teacher, tx, cfg)

    @jax.jit
    def run(state):
        def body(carry, i):
            st = carry
            st, m = step(
                st, tparams, imgs, labels,
                jax.random.fold_in(jax.random.PRNGKey(4), i),
                jnp.float32(0.0),
            )
            return st, (
                m["loss"], m["cls_loss"],
                m.get("mask_acc_0", jnp.float32(0.0)),
            )

        state, (losses, ces, maccs) = jax.lax.scan(
            body, state, jnp.arange(STEPS)
        )
        return losses, ces, maccs

    losses, ces, maccs = jax.tree.map(jax.device_get, run(state))
    first, last = float(losses[0]), float(losses[-1])
    first_ce, last_ce = float(ces[0]), float(ces[-1])
    first_macc, last_macc = float(maccs[0]), float(maccs[-1])

    ratio = first / max(last, 1e-9)
    ce_ratio = first_ce / max(last_ce, 1e-9)
    ok = (
        ce_ratio >= 8.0
        and ratio >= 4.0
        and last_macc >= 0.9
        and last_macc >= first_macc - 1e-6
    )
    print(
        json.dumps(
            {
                "gate": "overfit_one_batch",
                "steps": STEPS,
                "first_loss": round(first, 4),
                "last_loss": round(last, 4),
                "loss_ratio": round(ratio, 2),
                "first_cls_loss": round(first_ce, 4),
                "last_cls_loss": round(last_ce, 4),
                "cls_loss_ratio": round(ce_ratio, 2),
                "first_mask_acc": round(first_macc, 4),
                "last_mask_acc": round(last_macc, 4),
                "pass": ok,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
