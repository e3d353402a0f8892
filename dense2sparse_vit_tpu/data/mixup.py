"""Mixup / CutMix with soft targets, in JAX.

Parity with the timm `Mixup` used by the reference
(/root/reference/mask_predictor.py:261-267): batch-mode mixup/cutmix with
switch probability, label smoothing folded into the soft targets. Runs inside
jit on device — the reference does this on CPU inside the data loader worker.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _one_hot_smooth(labels, num_classes, smoothing):
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _rand_bbox(key, h, w, lam):
    """CutMix box with area ratio (1 - lam), centered uniformly (timm-style)."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(key)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    return y1, y2, x1, x2


def mixup_cutmix_batch(
    key: jax.Array,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    prob: float = 1.0,
    switch_prob: float = 0.5,
    smoothing: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply batch-mode mixup or cutmix (flip of the batch), returning
    (mixed_images, soft_targets).

    images: (B, H, W, C) NHWC. labels: (B,) int.
    """
    B, H, W, _ = images.shape
    k_apply, k_switch, k_lam_m, k_lam_c, k_box = jax.random.split(key, 5)

    apply = jax.random.uniform(k_apply) < prob
    use_cutmix = jax.random.uniform(k_switch) < switch_prob

    lam_m = jax.random.beta(k_lam_m, mixup_alpha, mixup_alpha) if mixup_alpha > 0 else 1.0
    lam_c = jax.random.beta(k_lam_c, cutmix_alpha, cutmix_alpha) if cutmix_alpha > 0 else 1.0

    flipped = images[::-1]

    # mixup branch
    lam_m = jnp.where(apply, lam_m, 1.0)
    mixed_m = images * lam_m + flipped * (1.0 - lam_m)

    # cutmix branch: paste the flipped batch's box
    y1, y2, x1, x2 = _rand_bbox(k_box, H, W, lam_c)
    yy = jnp.arange(H)[None, :, None, None]
    xx = jnp.arange(W)[None, None, :, None]
    in_box = (yy >= y1) & (yy < y2) & (xx >= x1) & (xx < x2)
    mixed_c = jnp.where(in_box & apply, flipped, images)
    # corrected lambda from the actual box area (timm correct_lam=True)
    lam_c_eff = 1.0 - ((y2 - y1) * (x2 - x1)) / (H * W)
    lam_c_eff = jnp.where(apply, lam_c_eff, 1.0)

    images_out = jnp.where(use_cutmix, mixed_c, mixed_m)
    lam = jnp.where(use_cutmix, lam_c_eff, lam_m).astype(jnp.float32)

    t1 = _one_hot_smooth(labels, num_classes, smoothing)
    t2 = _one_hot_smooth(labels[::-1], num_classes, smoothing)
    targets = t1 * lam + t2 * (1.0 - lam)
    return images_out.astype(images.dtype), targets


class Mixup:
    """Config-bound wrapper mirroring the timm Mixup constructor surface
    (mask_predictor.py:261-267)."""

    def __init__(
        self,
        mixup_alpha=0.8,
        cutmix_alpha=1.0,
        cutmix_minmax: Optional[Tuple[float, float]] = None,
        prob=1.0,
        switch_prob=0.5,
        mode="batch",
        label_smoothing=0.1,
        num_classes=1000,
    ):
        if cutmix_minmax is not None:
            raise NotImplementedError(
                "cutmix_minmax is not supported (the reference default is "
                "None, utils.py:308-309)"
            )
        if mode != "batch":
            raise NotImplementedError(
                "only batch mode is supported (reference default, utils.py:314)"
            )
        self.mixup_alpha = mixup_alpha
        self.cutmix_alpha = cutmix_alpha
        self.prob = prob
        self.switch_prob = switch_prob
        self.label_smoothing = label_smoothing
        self.num_classes = num_classes

    @property
    def active(self) -> bool:
        return self.mixup_alpha > 0 or self.cutmix_alpha > 0

    def __call__(self, key, images, labels):
        return mixup_cutmix_batch(
            key,
            images,
            labels,
            self.num_classes,
            mixup_alpha=self.mixup_alpha,
            cutmix_alpha=self.cutmix_alpha,
            prob=self.prob,
            switch_prob=self.switch_prob,
            smoothing=self.label_smoothing,
        )
