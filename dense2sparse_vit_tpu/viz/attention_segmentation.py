"""Attention segmentation / patch-drop visualization.

Parity: reference attention_segmentation.py
(/root/reference/attention_segmentation.py). Pure numpy + matplotlib,
host-side (run on process 0 only under SPMD). All tensor inputs accept
numpy or JAX arrays; images are NHWC in [0,1] or normalized (denormalized
via mean/std when given).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _np(x):
    return np.asarray(x)


def denormalize(images: np.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """Undo ImageNet normalization to [0, 1] for display."""
    return np.clip(_np(images) * std + mean, 0.0, 1.0)


def dynamic_keep_ratio_hist(
    keep_ratios: np.ndarray, title: str = "", save_path: Optional[str] = None
):
    """Histogram of per-image keep ratios (attention_segmentation.py:8-24),
    used in threshold-pruning mode."""
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(_np(keep_ratios).ravel(), bins=20, range=(0, 1))
    ax.set_xlabel("keep ratio")
    ax.set_ylabel("# images")
    ax.set_title(title or "dynamic keep ratios")
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return fig


def get_attention_masks(
    attn: np.ndarray, threshold: float = 0.6, grid: Optional[int] = None,
    patch_size: int = 16,
) -> np.ndarray:
    """Threshold the top attention mass into a boolean patch mask, upsampled
    to pixels (attention_segmentation.py:26-68).

    Args:
      attn: (B, N) CLS attention over spatial tokens (head-aggregated).
      threshold: keep patches holding the top `threshold` attention mass
        (reference: cumsum of sorted values > 1 - threshold).

    Returns:
      (B, H, W) boolean pixel mask (nearest upsample by patch_size).
    """
    attn = _np(attn)
    B, N = attn.shape
    g = grid or int(round(np.sqrt(N)))
    order = np.argsort(attn, axis=-1)  # ascending
    sorted_vals = np.take_along_axis(attn, order, axis=-1)
    cum = np.cumsum(sorted_vals / sorted_vals.sum(-1, keepdims=True), axis=-1)
    keep_sorted = cum > (1.0 - threshold)
    mask = np.zeros((B, N), bool)
    np.put_along_axis(mask, order, keep_sorted, axis=-1)
    mask = mask.reshape(B, g, g)
    return np.kron(mask, np.ones((patch_size, patch_size), bool))


def generate_patch_mask(
    keep_mask: np.ndarray, patch_size: int = 16
) -> np.ndarray:
    """(B, N) patch keep mask -> (B, H, W, 1) pixel mask
    (attention_segmentation.py:80-90)."""
    keep_mask = _np(keep_mask)
    B, N = keep_mask.shape
    g = int(round(np.sqrt(N)))
    grid = keep_mask.reshape(B, g, g)
    return np.kron(grid, np.ones((patch_size, patch_size)))[..., None]


def save_image_grid(
    images: np.ndarray,
    save_path: str,
    titles: Optional[Sequence[str]] = None,
    ncols: int = 4,
    suptitle: str = "",
):
    """Image grid writer (attention_segmentation.py:147-229)."""
    images = _np(images)
    n = len(images)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(3 * ncols, 3 * nrows))
    axes = np.atleast_1d(axes).ravel()
    for i, ax in enumerate(axes):
        ax.axis("off")
        if i < n:
            ax.imshow(np.clip(images[i], 0, 1))
            if titles is not None and i < len(titles):
                ax.set_title(str(titles[i]), fontsize=8)
    if suptitle:
        fig.suptitle(suptitle)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return save_path


def display_patch_drop(
    images: np.ndarray,
    keep_mask: np.ndarray,
    save_path: str,
    patch_scores: Optional[np.ndarray] = None,
    correct: Optional[np.ndarray] = None,
    patch_size: int = 16,
    denorm: bool = True,
):
    """Masked-image grid with optional predictor-score heatmap overlay and
    correct/wrong titles (attention_segmentation.py:93-145).

    Args:
      images: (B, H, W, 3) normalized images.
      keep_mask: (B, N) binary patch keep mask.
      patch_scores: optional (B, N) predictor scores rendered as a red
        overlay on dropped regions.
      correct: optional (B,) bool prediction correctness for titles.
    """
    imgs = denormalize(images) if denorm else np.clip(_np(images), 0, 1)
    pix_mask = generate_patch_mask(keep_mask, patch_size)
    masked = imgs * pix_mask
    if patch_scores is not None:
        heat = generate_patch_mask(
            _np(patch_scores) / (_np(patch_scores).max(-1, keepdims=True) + 1e-8),
            patch_size,
        )
        overlay = np.zeros_like(masked)
        overlay[..., 0] = heat[..., 0]
        masked = np.where(pix_mask > 0, masked, 0.6 * overlay)
    titles = None
    if correct is not None:
        titles = ["correct" if c else "wrong" for c in _np(correct)]
    return save_image_grid(
        masked, save_path, titles=titles,
        suptitle=f"kept {float(_np(keep_mask).mean()):.0%} of patches",
    )


def get_jaccard_similarity(
    keep_mask: np.ndarray, attention_mask: np.ndarray
) -> np.ndarray:
    """IoU between kept patches and attention segmentation
    (attention_segmentation.py:232-255). Inputs (B, N) / (B, N) binary."""
    a = _np(keep_mask).astype(bool)
    b = _np(attention_mask).astype(bool)
    inter = (a & b).sum(-1)
    union = (a | b).sum(-1)
    return inter / np.maximum(union, 1)


def visualize_heads(
    cls_attns: Sequence[np.ndarray],
    save_path: str,
    kept_idx_per_stage: Optional[Sequence[np.ndarray]] = None,
    image_index: int = 0,
    num_patches: Optional[int] = None,
    pruning_locs: Optional[Sequence[int]] = None,
):
    """Layer x head CLS-attention evolution maps
    (attention_segmentation.py:258-354).

    Pruned layers have fewer tokens; their attention rows are scattered back
    into the original grid (zeros on dropped positions) using the stage-local
    kept-index chain, mirroring visualizations.py:36-56.

    Pass `pruning_locs` (one cls_attns entry per layer assumed) to compose
    exactly the stages applied before each layer; without it, a width-based
    fallback composes stages until the widths match, which is ambiguous when
    two consecutive stages share a width.
    """
    cls_attns = [_np(a) for a in cls_attns]  # each (B, H, N_layer)
    L = len(cls_attns)
    H = cls_attns[0].shape[1]
    N = num_patches or cls_attns[0].shape[-1]
    g = int(round(np.sqrt(N)))

    def compose(chain):
        idx = None
        for stage in chain:
            stage = _np(stage)[image_index]
            idx = stage if idx is None else idx[stage]
        return idx

    # original-coordinate map per layer width
    full_rows = []
    for li, a in enumerate(cls_attns):
        row = a[image_index]  # (H, N_layer)
        n_layer = row.shape[-1]
        if n_layer != N and kept_idx_per_stage is not None:
            if pruning_locs is not None:
                # exact: the gather at a pruning layer happens BEFORE its
                # block, so layer li has every stage with loc <= li applied
                n_stages = sum(1 for loc in pruning_locs if loc <= li)
                idx = compose(kept_idx_per_stage[:n_stages])
            else:  # width-based fallback
                idx = None
                for k in range(1, len(kept_idx_per_stage) + 1):
                    cand = compose(kept_idx_per_stage[:k])
                    if len(cand) == n_layer:
                        idx = cand
                        break
            if idx is None or len(idx) != n_layer:
                raise ValueError(
                    f"cannot map layer {li} width {n_layer} onto the "
                    f"original {N} tokens from the kept-index chain "
                    f"{[ _np(s).shape[-1] for s in kept_idx_per_stage ]}; "
                    "pass pruning_locs for exact composition"
                )
            padded = np.zeros((row.shape[0], N), row.dtype)
            padded[:, idx] = row
            row = padded
        full_rows.append(row)

    fig, axes = plt.subplots(L, H, figsize=(1.6 * H, 1.6 * L))
    axes = np.atleast_2d(axes)
    for li in range(L):
        for hi in range(H):
            ax = axes[li, hi]
            ax.axis("off")
            ax.imshow(full_rows[li][hi].reshape(g, g), cmap="viridis")
            if li == 0:
                ax.set_title(f"head {hi}", fontsize=7)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return save_path


def cls_attention_histogram(
    cls_attns: np.ndarray, save_path: str, bins: int = 30
):
    """Per-layer histograms of CLS attention weights
    (attention_segmentation.py:357-420). cls_attns: (B, L, H, N)."""
    a = _np(cls_attns)
    L = a.shape[1]
    fig, axes = plt.subplots(1, L, figsize=(2.2 * L, 2.4))
    axes = np.atleast_1d(axes)
    for li in range(L):
        axes[li].hist(a[:, li].ravel(), bins=bins)
        axes[li].set_title(f"layer {li}", fontsize=8)
        axes[li].set_yticks([])
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return save_path
