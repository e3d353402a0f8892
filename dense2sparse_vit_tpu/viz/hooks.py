"""Epoch-end visualization hook.

Parity: reference visualizations.py (a function relying on enclosing-scope
globals, not importable as-is — we implement the intent as a pure function):
reconstruct the keep/drop patch mask from the student's kept indices via
scatter (visualizations.py:18-26), render the patch-drop grid (:29-34), and
the CLS-attention head-evolution maps with pruned layers padded (:36-56).
"""

from __future__ import annotations

import os
import numpy as np

from dense2sparse_vit_tpu.ops.topk import compose_kept_indices, scatter_token_mask
from dense2sparse_vit_tpu.viz.attention_segmentation import (
    display_patch_drop,
    visualize_heads,
)


def epoch_visualize(
    images,
    student_output,
    num_patches: int,
    save_dir: str,
    epoch: int,
    labels=None,
    patch_size: int = 16,
    visualize_patch_drop: bool = True,
    visualize_cls_attn_evo: bool = False,
    pruning_locs=None,
):
    """Render the per-epoch visual artifacts for a fixed image panel.

    Args:
      student_output: StudentOutput from DiffPruningStudent.
      num_patches: original spatial token count.

    Returns list of written file paths.
    """
    out = student_output
    written = []
    os.makedirs(save_dir, exist_ok=True)

    if out.keep_mask is not None:
        keep_mask = np.asarray(out.keep_mask)
    elif out.kept_idx:
        kept_orig = compose_kept_indices([np.asarray(i) for i in out.kept_idx])
        keep_mask = np.asarray(
            scatter_token_mask(kept_orig, num_patches)
        )
    else:
        keep_mask = np.ones((images.shape[0], num_patches), np.float32)

    correct = None
    if labels is not None:
        correct = np.argmax(np.asarray(out.logits), -1) == np.asarray(labels)

    if visualize_patch_drop:
        scores = None
        if out.pred_logits:
            s = np.asarray(out.pred_logits[0])
            scores = np.exp(s - s.max(-1, keepdims=True))
            scores /= scores.sum(-1, keepdims=True)
        written.append(
            display_patch_drop(
                np.asarray(images),
                keep_mask,
                os.path.join(save_dir, f"patch_drop_epoch_{epoch}.png"),
                patch_scores=scores,
                correct=correct,
                patch_size=patch_size,
            )
        )
    if visualize_cls_attn_evo and out.cls_attns:
        written.append(
            visualize_heads(
                [np.asarray(a) for a in out.cls_attns],
                os.path.join(save_dir, f"cls_attn_evo_epoch_{epoch}.png"),
                kept_idx_per_stage=[np.asarray(i) for i in out.kept_idx],
                num_patches=num_patches,
                pruning_locs=pruning_locs,
            )
        )
    return written
