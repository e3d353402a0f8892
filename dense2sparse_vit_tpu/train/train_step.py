"""Jitted train/eval steps.

Replaces the reference's per-batch Python loop bodies
(/root/reference/train.py:9-84, evaluate.py:8-85) with pure, jittable step
functions:

  * teacher forward -> student forward -> MaskLoss + BackboneLoss ->
    grad -> AdamW update, all inside one jit; optimizer state donated
  * the warmup gate (mask-loss-only for the first warmup epochs,
    train.py:50-53) is a traced multiplier, and backbone updates stay frozen
    through the per-group lr schedule (optimizer.py)
  * SPMD: callers jit these with a Mesh; the batch is sharded over 'data',
    params replicated — XLA inserts all collectives (no DDP/NCCL code)
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from dense2sparse_vit_tpu.core.config import ExperimentConfig
from dense2sparse_vit_tpu.losses import backbone_loss, mask_loss
from dense2sparse_vit_tpu.losses.backbone_loss import cross_entropy


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any  # empty dict unless the BN predictor is used


def create_train_state(
    student, tx: optax.GradientTransformation, rng, sample_images
) -> TrainState:
    """Initialize student params + optimizer state."""
    variables = student.init(
        {"params": rng, "selection": jax.random.fold_in(rng, 1)},
        sample_images,
        deterministic=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
    )


def _maybe_device_normalize(images, cfg: ExperimentConfig):
    """uint8-fed input path (make_loader(as_uint8=True)): normalize on
    device — jit specializes on dtype, so the float path is untouched."""
    if images.dtype == jnp.uint8:
        from dense2sparse_vit_tpu.data.pipeline import device_normalize

        return device_normalize(images, cfg.data)
    return images


def _teacher_outputs(teacher, teacher_in, images, cached_teacher) -> dict:
    """Frozen-teacher supervision as a dict (all entries stop-gradded).

    Keys: 'logits', 'attns', 'target', and the final-token supervision as
    either 'tokens' (live forward / gumbel cache) or
    'token_probs'+'token_entropy' (diff-pruning cache — the precomputed
    softmax/entropy form backbone_loss consumes without per-step
    log_softmax; train/teacher_cache.py::make_teacher_outputs_fn).
    Missing keys are None."""
    if cached_teacher:
        out = {
            "logits": teacher_in["logits"].astype(jnp.float32),
            "tokens": teacher_in.get("tokens"),
            "token_probs": teacher_in.get("token_probs"),
            "token_entropy": teacher_in.get("token_entropy"),
            "attns": teacher_in.get("attns"),
            "target": teacher_in.get("target"),
        }
    else:
        t_logits, t_tokens, t_attns = teacher.apply(
            {"params": teacher_in}, images, deterministic=True
        )
        out = {
            "logits": t_logits,
            "tokens": t_tokens,
            "token_probs": None,
            "token_entropy": None,
            "attns": t_attns,
            "target": None,
        }
    return {
        k: (jax.lax.stop_gradient(v) if v is not None else None)
        for k, v in out.items()
    }


def _optimizer_step(tx, state: TrainState, grads, new_stats) -> TrainState:
    """AdamW update + TrainState advance shared by both step builders.

    The flat AdamW (train/flat_optimizer.py) exposes apply_to_params: the
    parameter step happens as one add on the raveled vector instead of
    ~150 per-leaf update+add fusions — bit-identical, measurably less
    glue (scripts/profile_train256.py)."""
    fast_apply = getattr(tx, "apply_to_params", None)
    if fast_apply is not None:
        new_params, new_opt_state = fast_apply(
            grads, state.opt_state, state.params
        )
        return TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_stats,
        )
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(
        step=state.step + 1,
        params=new_params,
        opt_state=new_opt_state,
        batch_stats=new_stats,
    )


def make_train_step(
    student,
    teacher,
    tx: optax.GradientTransformation,
    cfg: ExperimentConfig,
    mixup_active: bool = False,
    cached_teacher: bool = False,
) -> Callable:
    """Build the jittable train step.

    Signature of the returned fn:
      (state, teacher_params, images, labels, rng, epoch) -> (state, metrics)

    `epoch` is a traced scalar driving the warmup gate; lr schedules read the
    step counter inside the optimizer.

    cached_teacher: the frozen-teacher forward is skipped; `teacher_params`
    is replaced by the dict make_teacher_outputs_fn produces for this batch
    (train/teacher_cache.py) — 'logits'/'tokens' plus 'target' or 'attns'.
    """
    pr = cfg.pruning
    tr = cfg.train

    def loss_fn(params, batch_stats, teacher_in, images, labels, rng, epoch):
        images = _maybe_device_normalize(images, cfg)
        t = _teacher_outputs(teacher, teacher_in, images, cached_teacher)
        t_logits = t["logits"].astype(jnp.float32)
        t_attns, t_target = t["attns"], t["target"]

        variables = {"params": params}
        has_bn = bool(batch_stats)
        if has_bn:
            variables["batch_stats"] = batch_stats
        rngs = {
            "dropout": jax.random.fold_in(rng, 0),
            "selection": jax.random.fold_in(rng, 1),
        }
        # no training loss consumes the STUDENT's per-layer CLS attentions
        # (MaskLoss supervises with the teacher's), so skip collecting them —
        # this keeps the fused-attention student on the plain kernel path
        # with the fully fused backward
        kwargs = dict(deterministic=False, collect_cls_attns=False)
        if pr.cls_from_teacher:
            kwargs["teacher_cls_attns"] = t_attns
        if pr.differentiable_topk:
            from dense2sparse_vit_tpu.train.schedule import sigma_schedule

            kwargs["soft_topk"] = True
            kwargs["sigma"] = sigma_schedule(
                epoch, tr.epochs, pr.initial_sigma
            )
        if has_bn:
            out, new_model_state = student.apply(
                variables, images, rngs=rngs, mutable=["batch_stats"], **kwargs
            )
            new_stats = new_model_state["batch_stats"]
        elif cfg.model.remat:
            # rematerialize the student forward under grad: only its inputs
            # are saved, activations are recomputed in the backward — the
            # memory lever for large configs (cfg.model.remat)
            out = jax.checkpoint(
                lambda v, x: student.apply(v, x, rngs=rngs, **kwargs)
            )(variables, images)
            new_stats = batch_stats
        else:
            out = student.apply(variables, images, rngs=rngs, **kwargs)
            new_stats = batch_stats

        m_loss, m_metrics = mask_loss(
            out.pred_logits,
            t_attns,
            out.kept_idx,
            pr.keep_ratios,
            loss_type=pr.mask_loss_type,
            mean_heads=pr.mean_heads,
            keep_masks=out.keep_masks,
            teacher_target=t_target,
        )
        b_loss, b_metrics = backbone_loss(
            out.logits,
            out.features,
            t_logits,
            t["tokens"],
            labels,
            kept_idx_orig=out.kept_idx_orig,
            keep_mask=out.keep_mask,
            mixup_active=mixup_active,
            tokens_t_probs=t["token_probs"],
            tokens_t_entropy=t["token_entropy"],
        )
        # warmup gate: mask loss only for the first warmup epochs
        # (train.py:50-53)
        backbone_active = (epoch >= tr.warmup_epochs).astype(jnp.float32)
        loss = m_loss + backbone_active * b_loss
        if pr.early_exit and out.early_exit_logits is not None:
            if mixup_active:
                from dense2sparse_vit_tpu.losses.backbone_loss import (
                    soft_target_cross_entropy,
                )

                ee = soft_target_cross_entropy(
                    out.early_exit_logits.astype(jnp.float32), labels
                )
            else:
                ee = cross_entropy(
                    out.early_exit_logits.astype(jnp.float32), labels
                )
            loss = loss + ee
            m_metrics = {**m_metrics, "early_exit_loss": ee}
        metrics = {**m_metrics, **b_metrics, "loss": loss}
        return loss, (metrics, new_stats)

    def train_step(state, teacher_params, images, labels, rng, epoch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, teacher_params, images, labels,
            rng, epoch,
        )
        return _optimizer_step(tx, state, grads, new_stats), metrics

    return train_step


def make_dynamic_vit_train_step(
    student,
    teacher,
    tx: optax.GradientTransformation,
    cfg: ExperimentConfig,
    mixup_active: bool = False,
    cached_teacher: bool = False,
) -> Callable:
    """Jittable train step for the DynamicViT-baseline (gumbel) student.

    Same signature as make_train_step's result:
      (state, teacher_in, images, labels, rng, epoch) -> (state, metrics).

    Loss surface = the reference's --use-ratio-loss / --ratio-weight /
    --use-token-dist-loss / --dist-weight / --cls-weight / --softmax-temp /
    --teacher-cls-loss flag family (utils.py:228-244) consumed from
    TrainConfig, feeding dynamic_vit_distill_loss — the DynamicViT-paper
    recipe the reference intended via its dead DistillDiffPruningLoss
    wiring (ddp_training.py:81, default_dynamic_vit.py:435-487).

    `epoch` is accepted for signature parity; the gumbel recipe has no
    warmup gate (the whole loss applies from step 0).
    """
    tr = cfg.train
    pr = cfg.pruning
    from dense2sparse_vit_tpu.losses import (
        aggregate_teacher_cls_attn,
        dynamic_vit_distill_loss,
        predictor_bce_vs_teacher,
    )

    def loss_fn(params, teacher_in, images, labels, rng):
        images = _maybe_device_normalize(images, cfg)
        t = _teacher_outputs(teacher, teacher_in, images, cached_teacher)
        t_logits = t["logits"].astype(jnp.float32)
        t_tokens, t_attns, t_target = t["tokens"], t["attns"], t["target"]

        out = student.apply(
            {"params": params},
            images,
            training=True,
            rngs={
                "gumbel": jax.random.fold_in(rng, 0),
                "dropout": jax.random.fold_in(rng, 1),
            },
        )
        loss, metrics = dynamic_vit_distill_loss(
            out.logits,
            out.features,
            t_logits,
            t_tokens,
            labels,
            out.pred_keep_probs,
            out.decisions,
            pr.keep_ratios,
            cls_weight=tr.cls_weight,
            ratio_weight=tr.ratio_weight,
            dist_weight=tr.dist_weight,
            use_ratio_loss=tr.use_ratio_loss,
            use_token_dist_loss=tr.use_token_dist_loss,
            mixup_active=mixup_active,
            temperature=tr.softmax_temp,
        )
        if tr.teacher_cls_loss:
            if t_target is None:
                t_target = aggregate_teacher_cls_attn(
                    jax.lax.stop_gradient(t_attns), pr.mean_heads
                )
            t_target = jax.lax.stop_gradient(t_target)
            bce = predictor_bce_vs_teacher(
                out.pred_keep_probs, t_target, pr.keep_ratios
            )
            loss = loss + bce
            metrics = {**metrics, "dyn_teacher_cls_bce": bce}
        metrics = {**metrics, "loss": loss}
        return loss, metrics

    def train_step(state, teacher_in, images, labels, rng, epoch):
        del epoch
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(
            state.params, teacher_in, images, labels, rng
        )
        return _optimizer_step(tx, state, grads, state.batch_stats), metrics

    return train_step


def make_dynamic_vit_eval_step(student, teacher, cfg: ExperimentConfig) -> Callable:
    """Eval step for the gumbel-baseline student: pruned (static-K hard
    gather, default_dynamic_vit.py:461-468) + unpruned + teacher top-1, CE,
    with the same label==-1 tail-padding semantics as make_eval_step."""

    def eval_step(params, batch_stats, teacher_params, images, labels):
        del batch_stats  # the baseline student has no BN predictor variant
        images = _maybe_device_normalize(images, cfg)
        valid = (labels >= 0).astype(jnp.float32)
        n_valid = jnp.maximum(jnp.sum(valid), 1.0)
        labels = jnp.maximum(labels, 0)

        def macc(pred_logits):
            hit = (jnp.argmax(pred_logits, -1) == labels).astype(jnp.float32)
            return jnp.sum(hit * valid) / n_valid

        t_logits, _, _ = teacher.apply(
            {"params": teacher_params}, images, deterministic=True
        )
        out = student.apply({"params": params}, images)
        out_unpruned = student.apply({"params": params}, images, unpruned=True)

        logp = jax.nn.log_softmax(out.logits.astype(jnp.float32), axis=-1)
        ce_per = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        ce = jnp.sum(ce_per * valid) / n_valid
        return {
            "val_loss": ce,
            "val_cls_loss": ce,
            "val_acc": macc(out.logits),
            "unpruned_acc": macc(out_unpruned.logits),
            "teacher_acc": macc(t_logits),
            "n_valid": n_valid,
        }

    return eval_step


def make_eval_step(student, teacher, cfg: ExperimentConfig) -> Callable:
    """Build the jittable eval step.

    Parity: evaluate_performance (evaluate.py:8-85): pruned forward, unpruned
    forward of the same student (the reference toggles `model.unpruned` which
    its forward ignores — we implement the intent), mask loss + CE + top-1.

    Returns (state-free): (params, batch_stats, teacher_params, images,
    labels) -> metrics.

    Padded rows (label == -1) are excluded from every accuracy/CE metric —
    the loop pads the final val batch instead of dropping it, so all 50 000
    val images are counted (the reference's drop_last silently skipped
    50000 % batch_size images). Metrics come with an 'n_valid' entry for
    weighted cross-batch aggregation.
    """
    pr = cfg.pruning

    def eval_step(params, batch_stats, teacher_params, images, labels):
        images = _maybe_device_normalize(images, cfg)
        valid = (labels >= 0).astype(jnp.float32)
        n_valid = jnp.maximum(jnp.sum(valid), 1.0)
        labels = jnp.maximum(labels, 0)

        def macc(pred_logits):
            hit = (jnp.argmax(pred_logits, -1) == labels).astype(jnp.float32)
            return jnp.sum(hit * valid) / n_valid

        t_logits, t_tokens, t_attns = teacher.apply(
            {"params": teacher_params}, images, deterministic=True
        )
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        # eval metrics never read the student's CLS attentions; skipping the
        # capture keeps eval on the fused-attention fast path
        kwargs = dict(deterministic=True, collect_cls_attns=False)
        if pr.cls_from_teacher:
            kwargs["teacher_cls_attns"] = t_attns
        if pr.selection == "random":
            kwargs["rngs"] = {"selection": jax.random.PRNGKey(0)}
        out = student.apply(variables, images, **kwargs)
        out_unpruned = student.apply(variables, images, unpruned=True, **kwargs)

        m_loss, m_metrics = mask_loss(
            out.pred_logits,
            t_attns,
            out.kept_idx,
            pr.keep_ratios,
            loss_type=pr.mask_loss_type,
            mean_heads=pr.mean_heads,
            keep_masks=out.keep_masks,
        )
        # per-sample CE, masked mean over valid rows
        logp = jax.nn.log_softmax(out.logits.astype(jnp.float32), axis=-1)
        ce_per = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        ce = jnp.sum(ce_per * valid) / n_valid
        metrics = {
            **{f"val_{k}": v for k, v in m_metrics.items()},
            "val_loss": m_loss + ce,
            "val_cls_loss": ce,
            "val_acc": macc(out.logits),
            "unpruned_acc": macc(out_unpruned.logits),
            "teacher_acc": macc(t_logits),
            "n_valid": n_valid,
        }
        if out.keep_ratios is not None:
            # threshold mode keep-ratio stats (evaluate.py:53-63)
            metrics["min_keep_ratio"] = jnp.min(out.keep_ratios)
            metrics["avg_keep_ratio"] = jnp.mean(out.keep_ratios)
            metrics["max_keep_ratio"] = jnp.max(out.keep_ratios)
        return metrics

    return eval_step
