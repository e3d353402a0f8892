"""Mixup / CutMix with soft targets, in JAX.

Parity with the timm `Mixup` used by the reference
(/root/reference/mask_predictor.py:261-267, flag surface utils.py:305-315):
batch/elem/pair modes, mixup/cutmix switch probability, cutmix_minmax box
sampling, label smoothing folded into the soft targets. Runs inside jit on
device — the reference does this on CPU inside the data loader worker.
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
    """CutMix box with area ratio (1 - lam), centered uniformly (timm-style).

    lam may be a scalar (batch mode) or (B,) (elem/pair modes); outputs
    broadcast accordingly.
    """
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(key)
    shape = jnp.shape(lam)
    cy = jax.random.randint(ky, shape, 0, h)
    cx = jax.random.randint(kx, shape, 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    return y1, y2, x1, x2


def _rand_bbox_minmax(key, h, w, minmax, shape):
    """timm rand_bbox_minmax: per-side cut fraction uniform in [mn, mx],
    box placed uniformly inside the image; lam comes from the box area."""
    mn, mx = minmax
    kh, kw, ky, kx = jax.random.split(key, 4)
    cut_h = jax.random.randint(kh, shape, int(h * mn), int(h * mx) + 1)
    cut_w = jax.random.randint(kw, shape, int(w * mn), int(w * mx) + 1)
    # uniform offset in [0, dim - cut]; bounds are traced, so sample a float
    y1 = (jax.random.uniform(ky, shape) * (h - cut_h + 1)).astype(jnp.int32)
    x1 = (jax.random.uniform(kx, shape) * (w - cut_w + 1)).astype(jnp.int32)
    return y1, y1 + cut_h, x1, x1 + cut_w


def mixup_cutmix_batch(
    key: jax.Array,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    cutmix_minmax: Optional[Tuple[float, float]] = None,
    prob: float = 1.0,
    switch_prob: float = 0.5,
    smoothing: float = 0.1,
    mode: str = "batch",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply mixup or cutmix against the flipped batch, returning
    (mixed_images, soft_targets).

    Modes (timm parity):
      batch: one lam + one mixup/cutmix decision for the whole batch
      elem:  per-sample lam and decision
      pair:  per-sample, but sample i and its mirror B-1-i share lam/decision
             (symmetric pair mixing)

    images: (B, H, W, C) NHWC. labels: (B,) int.
    """
    if mode not in ("batch", "elem", "pair"):
        raise ValueError(f"unknown mixup mode {mode!r}")
    B, H, W, _ = images.shape
    k_apply, k_switch, k_lam_m, k_lam_c, k_box = jax.random.split(key, 5)

    per = () if mode == "batch" else (B,)
    apply = jax.random.uniform(k_apply, per) < prob
    if mixup_alpha > 0 and cutmix_alpha > 0:
        use_cutmix = jax.random.uniform(k_switch, per) < switch_prob
    else:  # only one augmentation enabled -> always that one (timm)
        use_cutmix = jnp.full(per, cutmix_alpha > 0 or cutmix_minmax is not None)

    lam_m = (
        jax.random.beta(k_lam_m, mixup_alpha, mixup_alpha, per)
        if mixup_alpha > 0 else jnp.ones(per)
    )
    lam_c = (
        jax.random.beta(k_lam_c, cutmix_alpha, cutmix_alpha, per)
        if cutmix_alpha > 0 else jnp.ones(per)
    )

    if mode == "pair":
        # mirror-pair sharing: draws indexed by min(i, B-1-i)
        i = jnp.arange(B)
        pair_idx = jnp.minimum(i, B - 1 - i)
        apply = apply[pair_idx]
        use_cutmix = use_cutmix[pair_idx]
        lam_m = lam_m[pair_idx]
        lam_c = lam_c[pair_idx]

    flipped = images[::-1]
    bc = per if mode == "batch" else (B, 1, 1, 1)

    # mixup branch
    lam_m = jnp.where(apply, lam_m, 1.0)
    mixed_m = (
        images * lam_m.reshape(bc) + flipped * (1.0 - lam_m).reshape(bc)
        if mode != "batch"
        else images * lam_m + flipped * (1.0 - lam_m)
    )

    # cutmix branch: paste the flipped batch's box
    if cutmix_minmax is not None:
        y1, y2, x1, x2 = _rand_bbox_minmax(k_box, H, W, cutmix_minmax, per)
    else:
        y1, y2, x1, x2 = _rand_bbox(k_box, H, W, lam_c)
    if mode != "batch":
        y1, y2, x1, x2 = (v[:, None, None, None] for v in (y1, y2, x1, x2))
    yy = jnp.arange(H)[None, :, None, None]
    xx = jnp.arange(W)[None, None, :, None]
    in_box = (yy >= y1) & (yy < y2) & (xx >= x1) & (xx < x2)
    apply_bc = apply if mode == "batch" else apply[:, None, None, None]
    mixed_c = jnp.where(in_box & apply_bc, flipped, images)
    # corrected lambda from the actual box area (timm correct_lam=True)
    area = ((y2 - y1) * (x2 - x1)).reshape(per)
    lam_c_eff = jnp.where(apply, 1.0 - area / (H * W), 1.0)

    use_bc = use_cutmix if mode == "batch" else use_cutmix[:, None, None, None]
    images_out = jnp.where(use_bc, mixed_c, mixed_m)
    lam = jnp.where(use_cutmix, lam_c_eff, lam_m).astype(jnp.float32)
    if mode != "batch":
        lam = lam[:, None]

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
        if mode not in ("batch", "elem", "pair"):
            raise ValueError(f"unknown mixup mode {mode!r}")
        self.mixup_alpha = mixup_alpha
        self.cutmix_alpha = cutmix_alpha
        self.cutmix_minmax = cutmix_minmax
        self.prob = prob
        self.switch_prob = switch_prob
        self.mode = mode
        self.label_smoothing = label_smoothing
        self.num_classes = num_classes

    @property
    def active(self) -> bool:
        return (
            self.mixup_alpha > 0
            or self.cutmix_alpha > 0
            or self.cutmix_minmax is not None
        )

    def __call__(self, key, images, labels):
        return mixup_cutmix_batch(
            key,
            images,
            labels,
            self.num_classes,
            mixup_alpha=self.mixup_alpha,
            cutmix_alpha=self.cutmix_alpha,
            cutmix_minmax=self.cutmix_minmax,
            prob=self.prob,
            switch_prob=self.switch_prob,
            smoothing=self.label_smoothing,
            mode=self.mode,
        )
