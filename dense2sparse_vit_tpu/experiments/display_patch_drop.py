"""Attention-based patch-drop visual study.

Parity: reference display_patch_drop.py: load a (distilled) DINO/DeiT model,
take the last-layer CLS (or shape-token) self-attention, drop {10..90}% of
foreground/background patches by cumulative attention mass, save image grids
(:33-85); unlabeled-folder dataset (:14-28).
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from dense2sparse_vit_tpu.viz.attention_segmentation import (
    denormalize,
    generate_patch_mask,
    save_image_grid,
)


class UnlabeledImageFolder:
    """Flat folder of images, no class structure (display_patch_drop.py:14-28)."""

    def __init__(self, root: str, transform: Optional[Callable] = None):
        self.root = root
        self.transform = transform
        self.files = sorted(
            f for f in os.listdir(root)
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp", ".webp"))
        )
        if not self.files:
            raise FileNotFoundError(f"no images under {root}")

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i):
        img = Image.open(os.path.join(self.root, self.files[i])).convert("RGB")
        return self.transform(img) if self.transform else img


def attention_keep_mask(
    cls_attn: np.ndarray, drop_rate: float, foreground: bool
) -> np.ndarray:
    """Drop `drop_rate` of the attention MASS from the foreground (highest
    attention) or background (lowest) patches (display_patch_drop.py:62-78).

    Args:
      cls_attn: (B, N) head-aggregated CLS attention over spatial tokens.

    Returns (B, N) keep mask.
    """
    a = np.asarray(cls_attn)
    a = a / a.sum(-1, keepdims=True)
    B, N = a.shape
    # sort descending for foreground drops, ascending for background
    order = np.argsort(-a if foreground else a, axis=-1)
    sorted_vals = np.take_along_axis(a, order, axis=-1)
    cum = np.cumsum(sorted_vals, axis=-1)
    total = cum[:, -1:]
    drop_sorted = cum <= drop_rate * total
    keep = np.ones((B, N), bool)
    np.put_along_axis(keep, order, ~drop_sorted, axis=-1)
    return keep.astype(np.float32)


def generate_patch_drop_masked_image(
    model,
    variables,
    images: jnp.ndarray,
    save_dir: str,
    patch_size: int = 16,
    drop_rates=(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
    use_shape_token: bool = False,
    mean_heads: bool = True,
) -> List[str]:
    """Render fg/bg patch-drop grids for each drop rate
    (display_patch_drop.py:33-85).

    Args:
      model: a DeiT/DINO family module exposing
        `__call__(x, return_selfattention=True)` -> (B, H, N+extra).
      use_shape_token: use the dist/shape token's attention row instead of
        CLS (the "Intriguing Properties" shape-distilled study,
        display_patch_drop.py:46-54). For 2-extra-token models the spatial
        offset is 2, else 1.
    """
    attn = model.apply(variables, images, return_selfattention=True)
    attn = np.asarray(attn)  # (B, H, n_tokens); row of CLS (or shape) token
    n_extra = getattr(model, "num_extra_tokens", 1)
    agg = attn.mean(1) if mean_heads else attn.max(1)
    spatial = agg[:, n_extra:]
    spatial = spatial / spatial.sum(-1, keepdims=True)

    imgs = denormalize(np.asarray(images))
    written = []
    for fg in (True, False):
        for rate in drop_rates:
            keep = attention_keep_mask(spatial, rate, foreground=fg)
            masked = imgs * generate_patch_mask(keep, patch_size)
            name = f"{'fg' if fg else 'bg'}_drop_{int(rate * 100)}.png"
            written.append(
                save_image_grid(
                    masked, os.path.join(save_dir, name),
                    suptitle=f"{'foreground' if fg else 'background'} "
                             f"drop {rate:.0%}",
                )
            )
    return written


def main():  # pragma: no cover - thin CLI (display_patch_drop.py:88-136)
    import argparse

    import jax
    import jax.numpy as jnp

    from dense2sparse_vit_tpu.core.config import DataConfig
    from dense2sparse_vit_tpu.data import eval_transform
    from dense2sparse_vit_tpu.models import create_model

    p = argparse.ArgumentParser()
    p.add_argument("--model-name", default="dino_small")
    p.add_argument("--patch-size", type=int, default=16)
    p.add_argument("--use-shape", action="store_true", default=False)
    p.add_argument("--input-dir", default="test_imgs/input/custom/")
    p.add_argument("--save-path", default="test_imgs/")
    p.add_argument("--batch-size", type=int, default=16)
    args = p.parse_args()

    model = create_model(args.model_name, patch_size=args.patch_size)
    tf = eval_transform(DataConfig())
    ds = UnlabeledImageFolder(args.input_dir, tf)
    batch = jnp.asarray(
        np.stack([ds[i] for i in range(min(len(ds), args.batch_size))])
    )
    variables = model.init(jax.random.PRNGKey(0), batch[:1])
    files = generate_patch_drop_masked_image(
        model, variables, batch, args.save_path,
        patch_size=args.patch_size, use_shape_token=args.use_shape,
    )
    print("\n".join(files))


if __name__ == "__main__":  # pragma: no cover
    main()
