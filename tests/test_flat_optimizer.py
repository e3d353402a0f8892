"""Flattened AdamW must reproduce make_optimizer's updates exactly.

The flat optimizer is a pure re-expression (same elementwise math on a
raveled vector), so the comparison tolerance is essentially exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dense2sparse_vit_tpu.core.config import TrainConfig
from dense2sparse_vit_tpu.train.flat_optimizer import make_flat_optimizer
from dense2sparse_vit_tpu.train.optimizer import make_optimizer


def _tree(seed=0):
    """A params tree hitting every label group (optimizer.py::label_params)."""
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 8)
    return {
        "cls_token": jax.random.normal(ks[0], (1, 1, 8)),       # frozen
        "pos_embed": jax.random.normal(ks[1], (1, 17, 8)),      # frozen
        "score_predictor_0": {
            "in_dense": {
                "kernel": jax.random.normal(ks[2], (8, 8)),      # predictor
                "bias": jax.random.normal(ks[3], (8,)),
            }
        },
        "early_exit_head": {"kernel": jax.random.normal(ks[4], (8, 4))},
        "blocks_0": {
            "attn": {
                "qkv": {
                    "kernel": jax.random.normal(ks[5], (8, 24)),  # base_decay
                    "bias": jax.random.normal(ks[6], (24,)),      # no_decay
                }
            },
            "norm1": {"scale": jnp.ones((8,))},                   # no_decay
        },
        "head": {"kernel": jax.random.normal(ks[7], (8, 4))},     # base_decay
    }


def _run_updates(tx, params, n_steps):
    state = tx.init(params)
    for i in range(n_steps):
        # deterministic per-step, per-element pseudo-gradients
        grads = jax.tree.map(
            lambda p, k=i: 0.1 * jnp.sin(p * (k + 1)) + 0.01 * p, params
        )
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return params


def _assert_equal_trees(a, b, atol=1e-12):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_flatten_with_path(b)[0]
    for (path, la), (_, lb) in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=0, atol=atol,
            err_msg=f"mismatch at {jax.tree_util.keystr(path)}",
        )


@pytest.mark.parametrize("warmup_freeze", [True, False])
def test_matches_multi_transform_across_warmup_boundary(warmup_freeze):
    """8 updates at 2 steps/epoch with warmup_epochs=2: crosses the
    backbone unfreeze boundary (epoch 2 at update 4) mid-run."""
    cfg = TrainConfig(warmup_epochs=2, epochs=6, lr=1e-3, weight_decay=0.05)
    params = _tree()
    ref = _run_updates(
        make_optimizer(cfg, 2, backbone_warmup_freeze=warmup_freeze),
        params, 8,
    )
    flat = _run_updates(
        make_flat_optimizer(cfg, 2, backbone_warmup_freeze=warmup_freeze),
        params, 8,
    )
    _assert_equal_trees(ref, flat)
    # sanity: something actually moved
    assert float(jnp.abs(
        ref["head"]["kernel"] - params["head"]["kernel"]
    ).max()) > 0


def test_frozen_group_never_moves():
    cfg = TrainConfig(warmup_epochs=0, epochs=4)
    params = _tree()
    out = _run_updates(make_flat_optimizer(cfg, 2), params, 4)
    _assert_equal_trees(
        {"cls": params["cls_token"], "pos": params["pos_embed"]},
        {"cls": out["cls_token"], "pos": out["pos_embed"]},
    )


def test_grad_accum_matches():
    cfg = TrainConfig(warmup_epochs=0, epochs=4, grad_accum_steps=2)
    params = _tree()
    ref = _run_updates(make_optimizer(cfg, 2), params, 6)
    flat = _run_updates(make_flat_optimizer(cfg, 2), params, 6)
    _assert_equal_trees(ref, flat)


def test_jitted_update_and_state_checkpointable():
    """The flat state must thread through jit + donate like the multi
    version (TrainState holds it; orbax saves it)."""
    cfg = TrainConfig(warmup_epochs=1, epochs=4)
    params = _tree()
    tx = make_flat_optimizer(cfg, 2)
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.tree.map(lambda p: 0.1 * p + 0.01, params)
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    p1, s1 = step(params, state)
    p2, s2 = step(p1, s1)
    assert int(s2.count) == 2
    leaves = jax.tree_util.tree_leaves((p2, s2))
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_apply_to_params_bit_identical_to_update_path():
    """The fused flat-space apply (one add on the raveled vector, then one
    unravel) must be BIT-identical to update + optax.apply_updates — it is
    the same elementwise add reassociated through pure layout ops."""
    cfg = TrainConfig(warmup_epochs=1, epochs=4)
    tx = make_flat_optimizer(cfg, steps_per_epoch=2)
    params_a = params_b = _tree()
    state_a = state_b = tx.init(params_a)
    for i in range(5):
        grads = jax.tree.map(
            lambda p, k=i: 0.1 * jnp.sin(p * (k + 1)) + 0.01 * p, params_a
        )
        updates, state_a = tx.update(grads, state_a, params_a)
        params_a = optax.apply_updates(params_a, updates)
        params_b, state_b = tx.apply_to_params(grads, state_b, params_b)
        _assert_equal_trees(params_a, params_b, atol=0)
    _assert_equal_trees(
        {"mu": state_a.mu, "nu": state_a.nu},
        {"mu": state_b.mu, "nu": state_b.nu},
        atol=0,
    )


def test_grad_accum_falls_back_to_optax_contract():
    """MultiSteps-wrapped flat optimizer exposes no apply_to_params; the
    train step's getattr fast path must fall back cleanly."""
    cfg = TrainConfig(warmup_epochs=0, epochs=4, grad_accum_steps=2)
    tx = make_flat_optimizer(cfg, steps_per_epoch=2)
    assert getattr(tx, "apply_to_params", None) is None
