"""Dynamic token-pruning student ViT.

Parity: reference VisionTransformerDiffPruning
(/root/reference/vit_models/dynamic_vit.py:642-1015). A DeiT-shape ViT whose
forward inserts score-predictor pruning stages at `pruning_locs`: the
predictor scores spatial tokens, the top K = int(N * keep_ratio) survive
(CLS always kept), and later blocks run on the reduced sequence.

TPU-first design:
  * fixed-ratio mode: K is compile-time static, so every segment between
    pruning stages has a static (smaller) sequence length — real FLOP savings
    through the MXU, no ragged shapes. (The reference's eval path gathers
    data-dependent counts, dynamic_vit.py:960; ours is identical math with
    static K.)
  * threshold mode: per-image keep counts are data-dependent, so tokens are
    never gathered — the keep decision becomes a policy mask consumed by the
    masked-softmax attention (static shapes, reference dynamic_vit.py:880-894).
  * selection modes: 'topk' (predictor scores; grads reach the predictor via
    the mask loss), 'attn' (CLS-attention importance, --attn-selection),
    'random' (--random-drop), 'gumbel' handled by models/dynamic_vit_default.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from dense2sparse_vit_tpu.core.config import ModelConfig, PruningConfig
from dense2sparse_vit_tpu.nn.layers import Block, PatchEmbed, trunc_normal_init
from dense2sparse_vit_tpu.nn.predictor import PredictorLG
from dense2sparse_vit_tpu.ops.topk import (
    gather_tokens,
    threshold_keep_mask,
    topk_keep_indices,
)


@flax.struct.dataclass
class StudentOutput:
    """Everything the losses/metrics/visualizers need from one forward."""

    logits: jnp.ndarray  # (B, num_classes)
    features: jnp.ndarray  # (B, K_last, D) final spatial tokens, post-norm
    # per-stage predictor logits, each (B, N_stage) — N_stage shrinks
    pred_logits: Tuple[jnp.ndarray, ...]
    # per-stage kept/dropped indices in STAGE-LOCAL coordinates (sorted
    # ascending), exactly like the reference's bookkeeping
    # (dynamic_vit.py:861-864)
    kept_idx: Tuple[jnp.ndarray, ...]
    dropped_idx: Tuple[jnp.ndarray, ...]
    # kept indices of the final stage composed into ORIGINAL token
    # coordinates (B, K_last) — what the token-distillation gather actually
    # needs (fixes the reference defect at losses.py:212 for multi-stage)
    kept_idx_orig: Optional[jnp.ndarray]
    # per-layer CLS attention rows over spatial tokens; widths differ across
    # pruning segments so this is a tuple, not a stack
    cls_attns: Tuple[jnp.ndarray, ...]
    # threshold mode only: (B, N) spatial keep mask and (B,) keep fractions
    keep_mask: Optional[jnp.ndarray] = None
    keep_ratios: Optional[jnp.ndarray] = None
    early_exit_logits: Optional[jnp.ndarray] = None
    # threshold mode: PER-STAGE spatial keep masks (B, N) — the mask-loss
    # chain restricts stage i's teacher target to stage i-1's survivors
    # (gather-mode does this with kept_idx; threshold mode has no gathers)
    keep_masks: Tuple[jnp.ndarray, ...] = ()


class DiffPruningStudent(nn.Module):
    """See module docstring.

    `stem`/`pos_embed_type` make the pruning machinery backbone-agnostic:
    the default is the DeiT conv patch embed with a learned position
    embedding; a T2T stem with the fixed sinusoid table gives the pruned
    T2T-ViT (BASELINE config 4), and a headless/DINO-initialized config
    gives the pruned DINO student (BASELINE config 5).
    """

    cfg: ModelConfig
    pruning: PruningConfig
    stem: Optional[nn.Module] = None
    pos_embed_type: str = "learned"  # 'learned' | 'sinusoid'

    @nn.compact
    def __call__(
        self,
        x,
        *,
        deterministic: bool = True,
        teacher_cls_attns: Optional[jnp.ndarray] = None,
        unpruned: bool = False,
        collect_cls_attns: bool = True,
        soft_topk: bool = False,
        sigma: float = 0.05,
        threshold_override=None,
    ) -> StudentOutput:
        """Forward with pruning stages.

        Args:
          x: (B, H, W, 3) images, NHWC.
          deterministic: disables dropout; selection rng is only needed for
            'random' mode.
          teacher_cls_attns: (B, L, H, N+1) teacher CLS attention stack, used
            when pruning.cls_from_teacher (reference --cls-from-teacher).
          unpruned: skip all pruning stages (the reference's intent with
            `model.unpruned`, evaluate.py:36-40 — which its forward never
            actually read; we implement the intent).
          collect_cls_attns: capture per-layer CLS attention rows (needed for
            training losses/visualization and 'attn' selection). Disable on
            the inference hot path: it lets XLA avoid materializing the full
            (B, H, N, N) attention probabilities for non-pruning layers.
          soft_topk: training-time differentiable selection — kept tokens are
            the perturbed-top-k indicator matrix times the spatial tokens
            (x_kept = I @ x), so gradients flow into the predictor THROUGH
            the selection, not only via the mask loss. This is the
            reference's intended --topk-selection mechanism ("multiply
            transposed indicators with tokens to obtain differentiable topK
            selection", dynamic_vit.py:896-897, wiring commented at :556).
            Requires an 'selection' rng; sigma follows the linear decay
            schedule (utils.py:95).
          sigma: perturbation std for soft_topk (may be a traced scalar).
          threshold_override: traced scalar replacing
            pruning.patch_score_threshold — lets the threshold curriculum
            (utils.py:165-179) step per epoch WITHOUT recompiling (the keep
            count is data-dependent either way; shapes stay static).
        """
        collect = collect_cls_attns or self.pruning.selection == "attn"
        cfg, pr = self.cfg, self.pruning
        dtype = jnp.dtype(cfg.dtype)
        B = x.shape[0]
        N = cfg.num_patches
        keep_counts = pr.keep_counts(N)

        if self.stem is not None:
            x = self.stem(x.astype(dtype), deterministic=deterministic)
        else:
            x = PatchEmbed(
                cfg.patch_size, cfg.embed_dim, dtype, name="patch_embed"
            )(x.astype(dtype))
        cls_token = self.param("cls_token", trunc_normal_init, (1, 1, cfg.embed_dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, cfg.embed_dim)).astype(dtype), x],
            axis=1,
        )
        if self.pos_embed_type == "learned":
            pos_embed = self.param(
                "pos_embed", trunc_normal_init, (1, N + 1, cfg.embed_dim)
            )
            x = x + pos_embed.astype(dtype)
        else:  # fixed sinusoid table (T2T convention, t2t_vit.py:119)
            from dense2sparse_vit_tpu.nn.t2t import get_sinusoid_encoding

            x = x + jnp.asarray(
                get_sinusoid_encoding(N + 1, cfg.embed_dim), dtype
            )
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        pred_logits, kept_stage, dropped_stage, cls_attns = [], [], [], []
        keep_masks_stage = []  # threshold mode: per-stage spatial masks
        keep_mask_full = None  # (B, N+1) policy for threshold mode
        keep_ratios = None
        early_exit_logits = None
        # current spatial position -> original token id (for teacher gathers)
        cur_orig_idx = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[None], (B, N)
        )
        last_cls_attn = None
        p = 0

        # teacher importance in original coords: mean over layers, max/mean
        # over heads, renormalized over spatial tokens (losses.py:76-79 style)
        teacher_score = None
        if teacher_cls_attns is not None:
            t = jnp.mean(teacher_cls_attns, axis=1)  # (B, H, N+1)
            t = jnp.mean(t, axis=1) if pr.mean_heads else jnp.max(t, axis=1)
            t = t[:, 1:]
            teacher_score = t / jnp.sum(t, axis=-1, keepdims=True)

        for i in range(cfg.depth):
            blk = Block(
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                qk_scale=cfg.qk_scale,
                drop=cfg.drop_rate,
                attn_drop=cfg.attn_drop_rate,
                drop_path=cfg.drop_path_rate * i / max(cfg.depth - 1, 1),
                layer_norm_eps=cfg.layer_norm_eps,
                dtype=dtype,
                use_fused=cfg.use_fused_attention,
                quant=cfg.quant,
                name=f"blocks_{i}",
            )
            is_pruning_layer = i in pr.pruning_locs

            if is_pruning_layer and pr.early_exit and p == 0:
                # early-exit head on the CLS token just before the first
                # pruning stage (reference dynamic_vit.py:752-758)
                ee = nn.LayerNorm(
                    epsilon=cfg.layer_norm_eps, dtype=dtype, name="early_exit_norm"
                )(x[:, 0])
                early_exit_logits = nn.Dense(
                    cfg.num_classes, dtype=dtype,
                    kernel_init=trunc_normal_init, name="early_exit_head",
                )(ee)

            if is_pruning_layer and not unpruned:
                scores_logits, scores = self._stage_scores(
                    p, x, cur_orig_idx, last_cls_attn, teacher_score,
                    deterministic,
                )
                if pr.patch_score_threshold is not None:
                    # data-dependent keep count -> masked compute, static shape
                    thr = (
                        threshold_override
                        if threshold_override is not None
                        else pr.patch_score_threshold
                    )
                    mask, keep_ratios = threshold_keep_mask(
                        jax.lax.stop_gradient(scores), thr
                    )
                    cls_ones = jnp.ones((B, 1), mask.dtype)
                    keep_mask_full = jnp.concatenate([cls_ones, mask], axis=1)
                    pred_logits.append(scores_logits)
                    keep_masks_stage.append(mask)
                    x = blk(x, policy=keep_mask_full, deterministic=deterministic)
                else:
                    k = keep_counts[p]
                    kept, dropped = topk_keep_indices(scores, k)
                    kept_stage.append(kept)
                    dropped_stage.append(dropped)
                    pred_logits.append(scores_logits)
                    cur_orig_idx = jnp.take_along_axis(cur_orig_idx, kept, axis=-1)
                    if soft_topk and not deterministic:
                        # differentiable selection: expected top-k indicator
                        # times the tokens (Cordonnier et al.); the hard
                        # indices above remain the bookkeeping for losses
                        from dense2sparse_vit_tpu.ops.perturbed_topk import (
                            perturbed_topk,
                        )

                        ind = perturbed_topk(
                            self.make_rng("selection"),
                            scores,
                            k,
                            num_samples=pr.topk_num_samples,
                            sigma=sigma,
                        )  # (B, k, N_sp)
                        soft_kept = jnp.einsum(
                            "bkn,bnd->bkd", ind.astype(x.dtype), x[:, 1:]
                        )
                        x = jnp.concatenate([x[:, :1], soft_kept], axis=1)
                    else:
                        # gather CLS + kept tokens; K static => static shapes
                        idx_full = jnp.concatenate(
                            [jnp.zeros((B, 1), kept.dtype), kept + 1], axis=1
                        )
                        if cfg.use_fused_attention:
                            # one-hot-matmul gather kernel: XLA's gather at
                            # these shapes measured ~1.9 ms/stage in-model
                            # (~20% of the pruned forward); the MXU does the
                            # row selection for ~6 GFLOP instead
                            from dense2sparse_vit_tpu.ops.pallas.gather import (
                                fused_gather_tokens,
                            )

                            x = fused_gather_tokens(x, idx_full)
                        else:
                            x = gather_tokens(x, idx_full)
                    if collect:
                        x, cls_attn = blk(
                            x, return_cls_attn=True, deterministic=deterministic
                        )
                        last_cls_attn = cls_attn
                        cls_attns.append(cls_attn[:, :, 1:])
                    else:
                        x = blk(x, deterministic=deterministic)
                p += 1
            else:
                if keep_mask_full is not None:
                    x = blk(x, policy=keep_mask_full, deterministic=deterministic)
                elif collect:
                    x, cls_attn = blk(
                        x, return_cls_attn=True, deterministic=deterministic
                    )
                    last_cls_attn = cls_attn
                    cls_attns.append(cls_attn[:, :, 1:])
                else:
                    x = blk(x, deterministic=deterministic)
                if is_pruning_layer:
                    p += 1  # unpruned pass still walks past the stage

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, name="norm")(x)
        features = x[:, 1:]
        logits = nn.Dense(
            cfg.num_classes, dtype=dtype, kernel_init=trunc_normal_init, name="head"
        )(x[:, 0])

        return StudentOutput(
            logits=logits,
            features=features,
            pred_logits=tuple(pred_logits),
            kept_idx=tuple(kept_stage),
            dropped_idx=tuple(dropped_stage),
            kept_idx_orig=cur_orig_idx if kept_stage else None,
            cls_attns=tuple(cls_attns),
            keep_mask=(
                keep_mask_full[:, 1:] if keep_mask_full is not None else None
            ),
            keep_ratios=keep_ratios,
            early_exit_logits=early_exit_logits,
            keep_masks=tuple(keep_masks_stage),
        )

    def _stage_scores(
        self, p, x, cur_orig_idx, last_cls_attn, teacher_score, deterministic
    ):
        """Per-token keep scores for pruning stage `p`.

        Returns (scores_logits, scores): raw logits for the mask loss and
        normalized scores used for ranking (reference pred_logits/pred_score,
        dynamic_vit.py:855).
        """
        pr = self.pruning
        spatial = x[:, 1:]
        B, n_sp, _ = spatial.shape

        if pr.selection == "random":
            # --random-drop: rank tokens by pure noise
            rnd = jax.random.uniform(self.make_rng("selection"), (B, n_sp))
            return rnd, rnd
        if pr.cls_from_teacher and teacher_score is not None:
            # teacher CLS attention as importance, gathered into the current
            # token set (--cls-from-teacher)
            s = jnp.take_along_axis(teacher_score, cur_orig_idx, axis=-1)
            s = s / jnp.sum(s, axis=-1, keepdims=True)
            return s, s
        if pr.selection == "attn" and last_cls_attn is not None:
            # --attn-selection: previous block's CLS attention row
            agg = (
                jnp.mean(last_cls_attn, axis=1)
                if pr.mean_heads
                else jnp.max(last_cls_attn, axis=1)
            )  # (B, N_cur+1)
            s = agg[:, 1:]
            s = s / jnp.sum(s, axis=-1, keepdims=True)
            return s, s
        scores_logits, scores = PredictorLG(
            embed_dim=self.cfg.embed_dim,
            small_predictor=pr.small_predictor,
            use_bn=pr.predictor_bn,
            loss_type=pr.mask_loss_type,
            dtype=jnp.dtype(self.cfg.dtype),
            use_fused=self.cfg.use_fused_attention,
            name=f"score_predictor_{p}",
        )(spatial, use_running_average=deterministic)
        return scores_logits, scores
