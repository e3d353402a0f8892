"""Flattened AdamW: the whole update as a handful of fused ops.

`make_optimizer` (train/optimizer.py) expresses the reference's param-group
schedule (utils.py:67-147) as an optax multi_transform — correct, but on
device it lowers to one small fused kernel chain PER PARAMETER LEAF
(~150 for DeiT-S), and the per-kernel launch/fusion overhead is a measured
part of the train step's glue tail (BENCHMARKS.md roofline: ~60 small
loss/optimizer fusions, no hot spot).

This module computes the IDENTICAL update on a single raveled parameter
vector: Adam moments, bias correction, per-element learning rate and weight
decay selected from an int8 group-id vector carried in the optimizer state.
Every operation is elementwise, so the result is bit-identical to the
per-leaf formulation (pinned by tests/test_flat_optimizer.py against
make_optimizer), while the device executes ~6 large fused ops instead of
~150 small chains.

Groups (same labeling as optimizer.py::label_params):
  0 frozen        — lr 0 (cls_token / pos_embed / performer prm_w)
  1 predictor     — cosine lr, weight decay       (incl. early_exit: the
                    reference's early-exit lr is dead code; intent = the
                    predictor schedule, utils.py:133)
  2 base_decay    — backbone lr, weight decay
  3 base_no_decay — backbone lr, no weight decay
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from dense2sparse_vit_tpu.core.config import TrainConfig
from dense2sparse_vit_tpu.train import schedule as sched
from dense2sparse_vit_tpu.train.optimizer import label_params

_GROUP_IDS = {
    "frozen": 0,
    "predictor": 1,
    "early_exit": 1,
    "base_decay": 2,
    "base_no_decay": 3,
}


class FlatAdamWState(NamedTuple):
    count: jnp.ndarray  # int32 update counter
    mu: jnp.ndarray  # first moment, flat
    nu: jnp.ndarray  # second moment, flat
    group_id: jnp.ndarray  # int8 per-element group, flat


def make_flat_optimizer(
    cfg: TrainConfig,
    steps_per_epoch: int,
    backbone_warmup_freeze: bool = True,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Drop-in replacement for make_optimizer with a flattened update.

    Wraps in optax.MultiSteps for grad accumulation exactly like
    make_optimizer does.
    """

    def group_vector(params) -> jnp.ndarray:
        labels = label_params(params)
        ids = jax.tree.map(
            lambda leaf, lab: jnp.full(leaf.size, _GROUP_IDS[lab], jnp.int8),
            params,
            labels,
        )
        flat, _ = ravel_pytree(ids)
        return flat

    def init(params):
        flat, _ = ravel_pytree(params)
        return FlatAdamWState(
            count=jnp.zeros((), jnp.int32),
            mu=jnp.zeros_like(flat),
            nu=jnp.zeros_like(flat),
            group_id=group_vector(params),
        )

    def update(grads, state: FlatAdamWState, params):
        if params is None:
            raise ValueError("flat AdamW requires params (weight decay)")
        g, _ = ravel_pytree(grads)
        p, unravel = ravel_pytree(params)

        count = state.count + 1
        mu = state.mu * b1 + g * (1.0 - b1)
        nu = state.nu * b2 + (g * g) * (1.0 - b2)
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1**c)
        nu_hat = nu / (1.0 - b2**c)

        # per-epoch schedules, same flooring as make_optimizer (the
        # reference adjusts lr once per epoch, utils.py:93-147); count is
        # the number of COMPLETED updates, matching optax schedule calls
        epoch = state.count // steps_per_epoch
        lr_pred = sched.predictor_lr(epoch, cfg)
        lr_back = sched.backbone_lr(
            epoch, cfg, warmup_freeze=backbone_warmup_freeze
        )
        gid = state.group_id
        lr = jnp.where(
            gid == 1,
            lr_pred,
            jnp.where(gid == 0, 0.0, lr_back),
        ).astype(jnp.float32)
        wd = jnp.where(
            (gid == 1) | (gid == 2), cfg.weight_decay, 0.0
        ).astype(jnp.float32)

        step_vec = -(lr * (mu_hat / (jnp.sqrt(nu_hat) + eps) + wd * p))
        return unravel(step_vec), FlatAdamWState(
            count=count, mu=mu, nu=nu, group_id=gid
        )

    tx = optax.GradientTransformation(init, update)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx
