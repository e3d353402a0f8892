"""Direct mask-logit optimization experiment.

Parity: reference optimized_mask.py: freeze student AND teacher ViTs; make
the per-patch keep/drop logits the ONLY trainable tensor (:200-228), push
them through the masked distilled ViT with Gumbel sampling, and optimize
  kd_loss = KL distill + CE + ratio penalty (max(0.35, 1 - epoch/40) -
  mean_keep)^2  (:24-41)
with SGD(lr=1, momentum=0.5) + StepLR(10, 0.5) (:228-231). Periodically
renders patch-drop panels (:127-134).

TPU-native: one jitted update step; the mask logits are the whole param
pytree, so the optimizer state is tiny and the ViT forwards are pure
inference.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dense2sparse_vit_tpu.core.config import ModelConfig, deit_small
from dense2sparse_vit_tpu.losses.distill import kd_loss
from dense2sparse_vit_tpu.models.deit import DistilledDeiT, MaskedDistilledDeiT
from dense2sparse_vit_tpu.viz.attention_segmentation import display_patch_drop


def sgd_step_lr(
    lr: float = 1.0, momentum: float = 0.5, step_size: int = 10,
    gamma: float = 0.5, steps_per_epoch: int = 1,
) -> optax.GradientTransformation:
    """SGD + StepLR schedule (optimized_mask.py:228-231)."""

    def sched(count):
        epoch = count // steps_per_epoch
        return lr * gamma ** (epoch // step_size)

    return optax.sgd(learning_rate=sched, momentum=momentum)


def run_optimized_mask(
    images: jnp.ndarray,
    labels: jnp.ndarray,
    num_epochs: int = 40,
    cfg: Optional[ModelConfig] = None,
    student_params=None,
    teacher_params=None,
    temperature: float = 1.0,
    seed: int = 212,  # reference seed (optimized_mask.py:19)
    save_dir: Optional[str] = None,
    viz_every: int = 10,
    mask_block: int = 7,
):
    """Optimize per-patch mask logits for a FIXED batch of images.

    Returns (mask_logits, history dict).
    """
    cfg = cfg or deit_small()
    rng = jax.random.PRNGKey(seed)
    student = MaskedDistilledDeiT(cfg=cfg, mask_block=mask_block)
    teacher = DistilledDeiT(cfg=cfg)

    n_patches = (images.shape[1] // cfg.patch_size) * (
        images.shape[2] // cfg.patch_size
    )
    if student_params is None:
        student_params = student.init(
            {"params": rng, "gumbel": jax.random.fold_in(rng, 1)},
            images[:1], jnp.zeros((n_patches, 2)),
        )["params"]
    if teacher_params is None:
        teacher_params = teacher.init(jax.random.fold_in(rng, 2), images[:1])[
            "params"
        ]

    # xavier-normal init of the (N, 2) logits (optimized_mask.py:207)
    fan = n_patches + 2
    mask_logits = jax.random.normal(
        jax.random.fold_in(rng, 3), (n_patches, 2)
    ) * jnp.sqrt(2.0 / fan)

    # teacher logits are fixed: compute once, fuse cls/dist heads
    t_cls, t_dist = teacher.apply({"params": teacher_params}, images)
    t_logits = jax.lax.stop_gradient((t_cls + t_dist) / 2)

    tx = sgd_step_lr()
    opt_state = tx.init(mask_logits)

    def loss_fn(ml, key, epoch):
        s_cls, s_dist, keep = student.apply(
            {"params": student_params}, images, ml, rngs={"gumbel": key}
        )
        s_logits = (s_cls + s_dist) / 2
        loss, metrics = kd_loss(
            s_logits, t_logits, labels, keep[..., 0], epoch,
            temperature=temperature,
        )
        # reference optimizes the CE part as `loss` while tracking the rest
        # (optimized_mask.py:130: loss = loss_cls), but the published kd_loss
        # sums all three; we follow kd_loss (the documented intent)
        acc = jnp.mean(jnp.argmax(s_logits, -1) == labels)
        t_agree = jnp.mean(jnp.argmax(s_logits, -1) == jnp.argmax(t_logits, -1))
        metrics.update({"acc": acc, "teacher_agreement": t_agree})
        return loss, metrics

    @jax.jit
    def step(ml, opt_state, key, epoch):
        (loss, metrics), g = jax.value_and_grad(loss_fn, has_aux=True)(
            ml, key, epoch
        )
        updates, opt_state = tx.update(g, opt_state, ml)
        return optax.apply_updates(ml, updates), opt_state, loss, metrics

    history = []
    for epoch in range(num_epochs):
        key = jax.random.fold_in(rng, 1000 + epoch)
        mask_logits, opt_state, loss, metrics = step(
            mask_logits, opt_state, key, jnp.float32(epoch)
        )
        history.append({k: float(v) for k, v in metrics.items()})
        if save_dir and (epoch % viz_every == 0 or epoch == num_epochs - 1):
            keep_probs = jax.nn.softmax(mask_logits, -1)[:, 0]
            keep = (keep_probs > 0.5).astype(np.float32)
            display_patch_drop(
                np.asarray(images),
                np.broadcast_to(np.asarray(keep)[None], (images.shape[0], n_patches)),
                os.path.join(save_dir, f"optimized_mask_epoch_{epoch}.png"),
                patch_size=cfg.patch_size,
            )
    return mask_logits, history


def main():  # pragma: no cover - thin CLI (optimized_mask.py:152-233)
    import argparse

    from dense2sparse_vit_tpu.core.config import DataConfig
    from dense2sparse_vit_tpu.data import ImageFolder, eval_transform

    p = argparse.ArgumentParser(
        description="Optimize per-patch mask logits for one fixed batch"
    )
    p.add_argument("--imgnet-val-dir", required=True)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--save-path", default="test_imgs/")
    p.add_argument("--viz-every", type=int, default=10)
    p.add_argument("--mask-block", type=int, default=7)
    p.add_argument("--seed", type=int, default=212)
    args = p.parse_args()

    ds = ImageFolder(args.imgnet_val_dir, eval_transform(DataConfig()))
    n = min(len(ds), args.batch_size)
    pairs = [ds[i] for i in range(n)]
    images = jnp.asarray(np.stack([im for im, _ in pairs]))
    labels = jnp.asarray(np.array([y for _, y in pairs]))
    os.makedirs(args.save_path, exist_ok=True)
    _, history = run_optimized_mask(
        images, labels, num_epochs=args.epochs, seed=args.seed,
        save_dir=args.save_path, viz_every=args.viz_every,
        mask_block=args.mask_block,
    )
    for epoch, metrics in enumerate(history):
        line = " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items()))
        print(f"epoch {epoch}: {line}")


if __name__ == "__main__":  # pragma: no cover
    main()
