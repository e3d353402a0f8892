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

from typing import Any, Callable, NamedTuple

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


class FlatGradientTransformation(NamedTuple):
    """optax.GradientTransformation plus a flat-space fused apply.

    `update` keeps the optax contract (returns an updates PYTREE) for
    composability and the equivalence tests. `apply_to_params` skips the
    per-leaf unravel-then-add round trip: the parameter step happens as ONE
    elementwise add on the raveled vector and the result is unraveled once —
    ~150 fewer per-leaf add fusions per train step on DeiT-S (a measured
    part of the step's glue tail; see scripts/profile_train256.py). The
    update is bit-identical: ravel/unravel are pure layout ops and the add
    is elementwise, so per-leaf `p + step` == unravel(`p_flat + step_flat`).
    """

    init: Callable[..., Any]
    update: Callable[..., Any]
    apply_to_params: Callable[..., Any]  # (grads, state, params) ->
    #                                      (new_params, new_state)


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

    def _flat_step(grads, state: FlatAdamWState, params):
        """Shared core: returns (step_vec, p_flat, unravel, new_state)."""
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
        return step_vec, p, unravel, FlatAdamWState(
            count=count, mu=mu, nu=nu, group_id=gid
        )

    def update(grads, state: FlatAdamWState, params):
        step_vec, _, unravel, new_state = _flat_step(grads, state, params)
        return unravel(step_vec), new_state

    def apply_to_params(grads, state: FlatAdamWState, params):
        step_vec, p, unravel, new_state = _flat_step(grads, state, params)
        return unravel(p + step_vec), new_state

    if cfg.grad_accum_steps > 1:
        # MultiSteps composes over the optax contract only; the flat-apply
        # fast path is a single-step optimization and falls away here
        return optax.MultiSteps(
            optax.GradientTransformation(init, update),
            every_k_schedule=cfg.grad_accum_steps,
        )
    return FlatGradientTransformation(init, update, apply_to_params)
