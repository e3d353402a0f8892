"""ONE-TRAIN-STEP gradient/update parity against the reference's own code.

test_reference_parity.py pins the forward bit-for-bit; this pins the
BACKWARD and the optimizer update — the strongest accuracy-parity evidence
available without the published checkpoints (zero egress):

  same converted random weights + same batch + same loss config
    -> reference torch step: teacher fwd -> student train fwd ->
       MaskLoss + BackboneLoss -> warmup gate -> backward [-> AdamW]
       (train.py:40-57 semantics, with losses.py's own MaskLoss/BackboneLoss
       classes loaded via the timm shim)
    -> our jitted make_train_step on the flax side
  and the per-parameter gradients / update deltas must agree at fp32
  tolerance, for 1-stage topk, 3-stage topk, and threshold mode.

Gradients are extracted from the real train step by running it with
SGD(lr=1): delta == -grad, so the comparison exercises the exact jitted
code path the driver uses, not a reimplementation. The torch gradient dict
is mapped onto the flax tree through utils/convert — every conversion is a
layout-only linear op (transpose/reshape/concat), so it maps gradients
exactly as it maps weights.

Known reference defects documented inline and NOT replicated:
  * BackboneLoss gathers full teacher tokens with the LAST stage's
    stage-local indices (losses.py:212) — only correct single-stage. Our
    backbone_loss uses composed original-coordinate indices; for the
    3-stage case the torch side is fed the stage-(n-1) survivor tokens so
    its internal gather lands on the same teacher tokens (3-line alignment,
    flagged below).
  * BackboneLoss's threshold branch reads `C` before assignment
    (losses.py:207-216: `B, N, C = token_t.size()` only runs in the
    fixed-ratio branch) — reference threshold training would crash; the
    threshold case therefore pins the mask-loss-only (warmup) gradients.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from reference_loader import load_reference_module, load_reference_toplevel

from dense2sparse_vit_tpu.core.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    PruningConfig,
    TrainConfig,
)
from dense2sparse_vit_tpu.models import DiffPruningStudent, ViTTeacher
from dense2sparse_vit_tpu.train.train_step import (
    create_train_state,
    make_train_step,
)
from dense2sparse_vit_tpu.utils.convert import (
    convert_deit_state_dict,
    convert_student_state_dict,
)

TINY = ModelConfig(
    img_size=224, patch_size=16, embed_dim=48, depth=4, num_heads=2,
    num_classes=7,
)


class Bunch:
    def __init__(self, **kw):
        self.__dict__.update(kw)


@pytest.fixture(scope="module")
def ref():
    return load_reference_module("dynamic_vit")


@pytest.fixture(scope="module")
def ref_losses():
    return load_reference_toplevel("losses")


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(7)
    images = rng.normal(size=(2, 224, 224, 3)).astype(np.float32)
    labels = rng.integers(0, TINY.num_classes, size=(2,)).astype(np.int64)
    return images, labels


def _numpy_sd(mapping):
    # .copy(): torch state_dict tensors alias the live parameter storage,
    # and in-place optimizer steps would otherwise mutate captured arrays
    return {k: v.detach().numpy().copy() for k, v in mapping.items()}


def _build_pair(ref, locs, ratios, threshold=None, predictor_bn=False):
    torch.manual_seed(0)
    rm = ref.VisionTransformerDiffPruning(
        img_size=TINY.img_size, patch_size=TINY.patch_size,
        embed_dim=TINY.embed_dim, depth=TINY.depth, num_heads=TINY.num_heads,
        num_classes=TINY.num_classes, pruning_loc=list(locs),
        token_ratio=list(ratios), topk_selection=True,
        predictor_loss_type="kl_div", small_predictor=True,
        patch_score_threshold=threshold, predictor_bn=predictor_bn,
    )
    torch.manual_seed(1)
    tm = ref.VisionTransformerTeacher(
        img_size=TINY.img_size, patch_size=TINY.patch_size,
        embed_dim=TINY.embed_dim, depth=TINY.depth, num_heads=TINY.num_heads,
        num_classes=TINY.num_classes,
    )
    pruning = PruningConfig(
        pruning_locs=tuple(locs), keep_ratios=tuple(ratios),
        small_predictor=True, patch_score_threshold=threshold,
        predictor_bn=predictor_bn,
    )
    student = DiffPruningStudent(cfg=TINY, pruning=pruning)
    teacher = ViTTeacher(cfg=TINY)
    return rm, tm, student, teacher, pruning


def _convert_student(rm, student, images, with_stats=False):
    variables = student.init(jax.random.PRNGKey(0), jnp.asarray(images))
    if not with_stats:
        variables = {"params": variables["params"]}
    new_vars, _, skipped = convert_student_state_dict(
        _numpy_sd(rm.state_dict()), variables
    )
    assert not [k for k in skipped if "num_batches_tracked" not in k]
    return new_vars


def _convert_teacher(tm, teacher, images):
    params = teacher.init(jax.random.PRNGKey(1), jnp.asarray(images))["params"]
    params, _, skipped = convert_deit_state_dict(_numpy_sd(tm.state_dict()), params)
    assert not skipped
    return params


def _make_cfg(pruning, warmup_epochs):
    return ExperimentConfig(
        model=TINY, pruning=pruning,
        train=TrainConfig(batch_size=2, epochs=10, warmup_epochs=warmup_epochs),
        data=DataConfig(num_classes=TINY.num_classes),
    )


def _torch_loss(ref_losses, rm, tm, images, labels, ratios,
                backbone_active, threshold=None):
    """The reference train-step loss (train.py:40-53) on its own modules."""
    ti = torch.tensor(images).permute(0, 3, 1, 2).contiguous()
    tl = torch.tensor(labels)
    rm.train()
    tm.eval()
    logits_t, token_t, cls_attn_weights = tm(ti.clone())
    out = rm(ti.clone())
    logits_s, token_s, pred_logits, kept = out
    margs = Bunch(keep_ratios=list(ratios), mask_loss_type="kl_div")
    mask_loss_fn = ref_losses.MaskLoss(margs, "train")
    if threshold is not None:
        # threshold train returns a single pred tensor and stores flattened
        # boolean masks; MaskLoss's single-stage kl path only reads
        # pred_logits[0] (losses.py:96-104)
        pred_logits = [pred_logits] if not isinstance(pred_logits, list) else pred_logits
        kept = [kept]
    loss = mask_loss_fn(pred_logits, cls_attn_weights, kept, {})
    if backbone_active:
        bargs = Bunch(mixup=0.0, patch_score_threshold=None)
        backbone_loss_fn = ref_losses.BackboneLoss(bargs)
        if len(kept) > 1:
            # ALIGNMENT (documented fix): compose stage-local kept indices to
            # original coordinates and hand BackboneLoss the stage-(n-1)
            # survivor tokens, so its internal last-stage gather
            # (losses.py:212) lands on the same teacher tokens our
            # composed-index backbone_loss uses
            orig = kept[0]
            for idx in kept[1:-1]:
                orig = torch.gather(orig, 1, idx)
            C = token_t.shape[-1]
            token_t = torch.gather(
                token_t, 1, orig.unsqueeze(-1).expand(-1, -1, C)
            )
        loss = loss + backbone_loss_fn(
            logits_s, token_s, logits_t, token_t, kept, tl, {}
        )
    return loss


def _torch_grads(ref_losses, rm, tm, images, labels, ratios,
                 backbone_active, threshold=None):
    rm.zero_grad(set_to_none=True)
    loss = _torch_loss(
        ref_losses, rm, tm, images, labels, ratios, backbone_active, threshold
    )
    loss.backward()
    grads = {
        k: p.grad.detach().numpy() if p.grad is not None
        else np.zeros(p.shape, np.float32)
        for k, p in rm.named_parameters()
    }
    return float(loss.detach()), grads


def _flax_step_delta(student, teacher, cfg, variables, tparams, images,
                     labels, tx, epoch, n_steps=1):
    """Run the real jitted train step; return (loss_first, params_after)."""
    state = create_train_state(
        student, tx, jax.random.PRNGKey(0), jnp.asarray(images[:1])
    )
    state = state.replace(
        params=variables["params"], opt_state=tx.init(variables["params"])
    )
    step = jax.jit(make_train_step(student, teacher, tx, cfg))
    loss0 = None
    for i in range(n_steps):
        state, metrics = step(
            state, tparams, jnp.asarray(images), jnp.asarray(labels),
            jax.random.PRNGKey(3), jnp.float32(epoch),
        )
        if loss0 is None:
            loss0 = float(metrics["loss"])
    return loss0, state.params


def _grads_to_flax_tree(grads_sd, student, images):
    """Map the torch gradient dict onto the flax tree via the converter.

    Every weight conversion is layout-only (transpose/reshape/concat), so
    applying it to gradients produces the exactly corresponding gradient
    tree. The template is zeroed first so unconverted leaves would be
    loudly wrong rather than silently matching init values.
    """
    template = student.init(jax.random.PRNGKey(0), jnp.asarray(images))
    template = {"params": jax.tree.map(jnp.zeros_like, template["params"])}
    new_vars, _, skipped = convert_student_state_dict(grads_sd, template)
    assert not [k for k in skipped if "num_batches_tracked" not in k]
    return new_vars["params"]


def _assert_trees_close(tree_a, tree_b, rtol, atol, what):
    flat_a = jax.tree_util.tree_flatten_with_path(tree_a)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(tree_b)[0]
    assert len(flat_a) == len(flat_b)
    for (path_a, leaf_a), (_, leaf_b) in zip(flat_a, flat_b):
        name = jax.tree_util.keystr(path_a)
        np.testing.assert_allclose(
            np.asarray(leaf_a), np.asarray(leaf_b), rtol=rtol, atol=atol,
            err_msg=f"{what}: mismatch at {name}",
        )


def _run_grad_parity(ref, ref_losses, batch, locs, ratios, epoch,
                     warmup_epochs, threshold=None, atol=2e-5):
    images, labels = batch
    rm, tm, student, teacher, pruning = _build_pair(
        ref, locs, ratios, threshold
    )
    variables = _convert_student(rm, student, images)
    tparams = _convert_teacher(tm, teacher, images)
    cfg = _make_cfg(pruning, warmup_epochs)

    backbone_active = epoch >= warmup_epochs
    t_loss, t_grads = _torch_grads(
        ref_losses, rm, tm, images, labels, ratios, backbone_active, threshold
    )
    # SGD(lr=1): params_after = params - grad, run through the REAL step
    f_loss, params_after = _flax_step_delta(
        student, teacher, cfg, variables, tparams, images, labels,
        optax.sgd(1.0), epoch,
    )
    assert f_loss == pytest.approx(t_loss, rel=2e-4), "loss scalar mismatch"
    f_grads = jax.tree.map(
        lambda p, q: p - q, variables["params"], params_after
    )
    t_grads_tree = _grads_to_flax_tree(t_grads, student, images)
    _assert_trees_close(f_grads, t_grads_tree, 1e-3, atol, "grad")


class TestGradientParity:
    def test_single_stage_topk_full_loss(self, ref, ref_losses, batch):
        _run_grad_parity(
            ref, ref_losses, batch, (1,), (0.5,), epoch=5.0, warmup_epochs=1
        )

    def test_single_stage_topk_warmup_gate(self, ref, ref_losses, batch):
        """epoch < warmup: mask-loss-only gradients (train.py:50-53) —
        backbone gradients must be exactly gated off."""
        _run_grad_parity(
            ref, ref_losses, batch, (1,), (0.5,), epoch=0.0, warmup_epochs=1
        )

    def test_three_stage_topk_full_loss(self, ref, ref_losses, batch):
        _run_grad_parity(
            ref, ref_losses, batch, (1, 2, 3), (0.6, 0.4, 0.25),
            epoch=5.0, warmup_epochs=1,
        )

    def test_threshold_mode_mask_loss(self, ref, ref_losses, batch):
        """Threshold-mode gradients through the policy-masked attention;
        mask-loss-only (the reference's threshold BackboneLoss branch is
        dead code — undefined C, losses.py:207-216)."""
        _run_grad_parity(
            ref, ref_losses, batch, (1,), (0.5,), epoch=0.0, warmup_epochs=1,
            threshold=0.25,
        )


class TestOptimizerUpdateParity:
    """Two AdamW steps on the same batch: per-parameter UPDATE deltas match.

    Pins torch.optim.AdamW == optax.adamw semantics (decoupled weight decay,
    bias-corrected moments) on top of the gradient parity above — i.e. the
    full train.py:55-57 step. Two steps make the comparison sensitive to
    gradient magnitudes, not just signs (a single Adam step is ~sign(g)*lr).
    """

    def _run(self, ref, ref_losses, batch, weight_decay):
        images, labels = batch
        locs, ratios = (1,), (0.5,)
        rm, tm, student, teacher, pruning = _build_pair(ref, locs, ratios)
        variables = _convert_student(rm, student, images)
        tparams = _convert_teacher(tm, teacher, images)
        cfg = _make_cfg(pruning, warmup_epochs=1)
        lr = 5e-4

        # elements whose true gradient is ~0 (e.g. the predictor's final
        # scalar bias: log_softmax is shift-invariant, so its analytic
        # gradient is exactly 0) get Adam updates of +-lr in a direction set
        # purely by fp32 roundoff — exclude them from the delta comparison
        _, g0 = _torch_grads(
            ref_losses, rm, tm, images, labels, ratios, backbone_active=True
        )
        grad_floor_tree = _grads_to_flax_tree(g0, student, images)

        opt = torch.optim.AdamW(
            rm.parameters(), lr=lr, betas=(0.9, 0.999), eps=1e-8,
            weight_decay=weight_decay,
        )
        pre_sd = _numpy_sd(rm.state_dict())
        for _ in range(2):
            opt.zero_grad(set_to_none=True)
            loss = _torch_loss(
                ref_losses, rm, tm, images, labels, ratios,
                backbone_active=True,
            )
            loss.backward()
            opt.step()
        post_sd = _numpy_sd(rm.state_dict())
        t_delta_sd = {k: post_sd[k] - pre_sd[k] for k in pre_sd}

        tx = optax.adamw(
            lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
        )
        _, params_after = _flax_step_delta(
            student, teacher, cfg, variables, tparams, images, labels, tx,
            epoch=5.0, n_steps=2,
        )
        f_delta = jax.tree.map(
            lambda q, p: q - p, params_after, variables["params"]
        )
        t_delta_tree = _grads_to_flax_tree(t_delta_sd, student, images)
        # deltas are O(2*lr) = 1e-3. Adam normalizes by sqrt(v_hat), so for
        # near-noise gradients the update direction is noise-amplified —
        # atol ~15% of one step's update plus the degenerate-direction mask
        # above; systematic semantic differences (wrong wd coupling, wrong
        # bias correction) would shift EVERY element by O(lr)
        flat_f = jax.tree_util.tree_flatten_with_path(f_delta)[0]
        flat_t = jax.tree_util.tree_flatten_with_path(t_delta_tree)[0]
        flat_g = jax.tree_util.tree_flatten_with_path(grad_floor_tree)[0]
        n_skipped = n_total = 0
        for (path, lf), (_, lt), (_, lg) in zip(flat_f, flat_t, flat_g):
            live = np.abs(np.asarray(lg)) >= 1e-6
            n_total += live.size
            n_skipped += int(live.size - live.sum())
            np.testing.assert_allclose(
                np.asarray(lf)[live], np.asarray(lt)[live],
                rtol=5e-3, atol=1.5e-4,
                err_msg=f"adamw delta mismatch at {jax.tree_util.keystr(path)}",
            )
        assert n_skipped / n_total < 0.01, (
            f"too many degenerate-gradient elements skipped: {n_skipped}"
        )

    def test_adamw_no_weight_decay(self, ref, ref_losses, batch):
        self._run(ref, ref_losses, batch, weight_decay=0.0)

    def test_adamw_decoupled_weight_decay(self, ref, ref_losses, batch):
        self._run(ref, ref_losses, batch, weight_decay=0.05)


class TestBNPredictorTrajectoryParity:
    """Three full train steps with the BatchNorm predictor: final params AND
    BN running statistics match the reference.

    The one-step tests above never advance BN state; this pins the
    cross-step threading of the batch_stats collection through the jitted
    train step and TorchBatchNorm's unbiased running-var update
    (nn/predictor.py) against the reference's plain BatchNorm1d
    (dynamic_vit.py:350-367) over a real multi-step optimization trajectory.
    """

    @pytest.mark.slow
    def test_three_sgd_steps_params_and_running_stats(
        self, ref, ref_losses, batch
    ):
        images, labels = batch
        locs, ratios = (1,), (0.5,)
        rm, tm, student, teacher, pruning = _build_pair(
            ref, locs, ratios, predictor_bn=True
        )
        variables = _convert_student(rm, student, images, with_stats=True)
        tparams = _convert_teacher(tm, teacher, images)
        cfg = _make_cfg(pruning, warmup_epochs=1)
        lr = 1e-3

        opt = torch.optim.SGD(rm.parameters(), lr=lr)
        for _ in range(3):
            opt.zero_grad(set_to_none=True)
            loss = _torch_loss(
                ref_losses, rm, tm, images, labels, ratios,
                backbone_active=True,
            )
            loss.backward()
            opt.step()

        tx = optax.sgd(lr)
        state = create_train_state(
            student, tx, jax.random.PRNGKey(0), jnp.asarray(images[:1])
        )
        state = state.replace(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
        )
        step = jax.jit(make_train_step(student, teacher, tx, cfg))
        for _ in range(3):
            state, _ = step(
                state, tparams, jnp.asarray(images), jnp.asarray(labels),
                jax.random.PRNGKey(3), jnp.float32(5.0),
            )

        template = student.init(jax.random.PRNGKey(0), jnp.asarray(images))
        template = jax.tree.map(jnp.zeros_like, template)
        final_vars, _, skipped = convert_student_state_dict(
            _numpy_sd(rm.state_dict()), template
        )
        assert not [k for k in skipped if "num_batches_tracked" not in k]
        _assert_trees_close(
            state.params, final_vars["params"], 1e-3, 5e-5, "params@step3"
        )
        _assert_trees_close(
            state.batch_stats, final_vars["batch_stats"], 1e-3, 5e-5,
            "batch_stats@step3",
        )


class TestPerturbedTopKParity:
    """Forward indicators AND backward gradient vs the reference's own
    autograd function (peturbed_topk.py:16-80) under IDENTICAL noise.

    The reference materializes the (B, nS, k, N) one-hot tensor; ours is a
    scatter/gather restructuring — same estimator, so with the same noise
    tensor both passes must agree to fp32 tolerance.
    """

    @pytest.mark.slow
    def test_forward_and_backward_match_reference(self, ref):
        import types

        from dense2sparse_vit_tpu.ops.perturbed_topk import (
            _perturbed_topk_core,
        )

        B, N, k, nS, sigma = 3, 12, 5, 64, 0.1
        rng = np.random.default_rng(11)
        x_np = rng.normal(size=(B, N)).astype(np.float32)
        z_np = rng.normal(size=(B, nS, N)).astype(np.float32)
        g_np = rng.normal(size=(B, k, N)).astype(np.float32)

        # torch side: pin the noise by intercepting torch.normal
        ref_mod = load_reference_module("peturbed_topk")
        orig_normal = torch.normal

        def fixed_normal(mean=0.0, std=1.0, size=None, **kw):
            assert tuple(size) == (B, nS, N)
            return torch.tensor(z_np)

        torch.normal = fixed_normal
        try:
            xt = torch.tensor(x_np, requires_grad=True)
            ind_t = ref_mod.PerturbedTopKFunction.apply(xt, k, nS, sigma)
            ind_t.backward(torch.tensor(g_np))
        finally:
            torch.normal = orig_normal

        # jax side: the core takes the noise tensor explicitly
        def f(x):
            return _perturbed_topk_core(
                jnp.asarray(x), jnp.asarray(z_np), jnp.float32(sigma),
                jnp.zeros((k,)),
            )

        ind_j, vjp = jax.vjp(f, jnp.asarray(x_np))
        (gx_j,) = vjp(jnp.asarray(g_np))

        np.testing.assert_allclose(
            np.asarray(ind_j), ind_t.detach().numpy(), rtol=0, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(gx_j), xt.grad.numpy(), rtol=1e-5, atol=1e-6
        )
