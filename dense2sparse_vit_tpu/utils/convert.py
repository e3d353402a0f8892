"""PyTorch -> flax checkpoint conversion for DeiT-family ViT weights.

The reference loads published DeiT/DINO checkpoints from torch hub
(/root/reference/vit_models/dynamic_vit.py:1221,1253,1304) with a filter that
reshapes legacy patch-embed weights and resizes position embeddings
(dynamic_vit.py:1198-1213). This module is the JAX equivalent: it maps a
torch state_dict (numpy arrays) onto the parameter pytrees of ViTTeacher /
DiffPruningStudent.

Layout conversions:
  conv kernels   (O, I, kH, kW) -> (kH, kW, I, O)
  dense kernels  (out, in)      -> (in, out)
  LayerNorm      weight/bias    -> scale/bias
  blocks.N.*     -> blocks_N.*
Missing target entries (score predictor, early-exit head) keep their
initialized values, mirroring the reference's strict=False load
(dynamic_vit.py:1239).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def resize_pos_embed(
    posemb: np.ndarray, n_tokens_new: int, n_extra: int = 1
) -> np.ndarray:
    """Bilinearly resize the (1, N_old+n_extra, D) grid to n_tokens_new.

    Parity: reference resize_pos_embed (dynamic_vit.py:1178-1195) — the CLS
    (and dist, for distilled checkpoints) slots pass through, the spatial
    grid is resized as a 2D image.
    """
    tok, grid = posemb[:, :n_extra], posemb[0, n_extra:]
    gs_old = int(round(np.sqrt(grid.shape[0])))
    gs_new = int(round(np.sqrt(n_tokens_new - n_extra)))
    if gs_old == gs_new:
        return posemb
    D = grid.shape[-1]
    grid = grid.reshape(gs_old, gs_old, D)
    # bilinear resize with align_corners=False (torch F.interpolate default)
    out = np.empty((gs_new, gs_new, D), grid.dtype)
    scale = gs_old / gs_new
    coords = (np.arange(gs_new) + 0.5) * scale - 0.5
    c0 = np.clip(np.floor(coords).astype(int), 0, gs_old - 1)
    c1 = np.clip(c0 + 1, 0, gs_old - 1)
    w1 = np.clip(coords - c0, 0.0, 1.0)
    w0 = 1.0 - w1
    tmp = (
        grid[c0] * w0[:, None, None] + grid[c1] * w1[:, None, None]
    )  # rows resized: (gs_new, gs_old, D)
    out = (
        tmp[:, c0] * w0[None, :, None] + tmp[:, c1] * w1[None, :, None]
    )
    return np.concatenate([tok, out.reshape(1, gs_new * gs_new, D)], axis=1)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray, strict: bool):
    node = tree
    for k in path[:-1]:
        if k not in node:
            if strict:
                raise KeyError(f"missing {'/'.join(path)} in target params")
            return False
        node = node[k]
    leaf = path[-1]
    if leaf not in node:
        if strict:
            raise KeyError(f"missing {'/'.join(path)} in target params")
        return False
    if node[leaf].shape != value.shape:
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: "
            f"target {node[leaf].shape} vs checkpoint {value.shape}"
        )
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
    return True


def convert_deit_state_dict(
    state_dict: Mapping[str, np.ndarray],
    params,
    strict: bool = False,
) -> Tuple[Dict, list, list]:
    """Map a DeiT torch state_dict onto a params pytree.

    Args:
      state_dict: torch key -> numpy array (call .numpy() on tensors first;
        a top-level 'model' wrapper dict is also accepted).
      params: target flax params dict (from module.init); not mutated.
      strict: raise on checkpoint keys the target has no slot for.

    Returns:
      (new_params, loaded_keys, skipped_keys).
    """
    import copy

    if "model" in state_dict and not hasattr(
        state_dict["model"], "shape"
    ):  # nested {'model': {...}} wrapper used by DeiT releases
        state_dict = state_dict["model"]

    out = copy.deepcopy(
        {k: np.asarray(v) for k, v in _to_plain_dict(params).items()}
    )
    out = copy.deepcopy(_unflatten(out))

    loaded, skipped = [], []
    n_tokens = None
    pe = _get(out, ("pos_embed",))
    if pe is not None:
        n_tokens = pe.shape[1]

    for key, v in state_dict.items():
        v = np.asarray(v)
        path = _map_key(key, v)
        if path is None:
            skipped.append(key)
            continue
        if key == "pos_embed" and n_tokens is not None and v.shape[1] != n_tokens:
            # distilled checkpoints carry CLS + dist slots ahead of the grid
            n_extra = 2 if "dist_token" in state_dict else 1
            v = resize_pos_embed(v, n_tokens, n_extra=n_extra)
        if key.endswith("patch_embed.proj.weight"):
            if v.ndim < 4:
                # legacy linear patchify -> conv reshape
                # (checkpoint_filter_fn, dynamic_vit.py:1205-1208)
                tgt = _get(out, path)
                kh, kw, i, o = tgt.shape
                v = v.reshape(o, i, kh, kw)
            v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif key.endswith(".weight") and v.ndim == 2:
            v = v.T  # (out,in) -> (in,out)
        ok = _set(out, path, v, strict)
        (loaded if ok else skipped).append(key)
    return out, loaded, skipped


def convert_student_state_dict(
    state_dict: Mapping[str, np.ndarray],
    variables,
    strict: bool = False,
) -> Tuple[Dict, list, list]:
    """Map a reference VisionTransformerDiffPruning state_dict onto the
    DiffPruningStudent variables.

    Extends convert_deit_state_dict with the student-only modules:
      score_predictor.{p}.{in_conv,out_conv}.{m}[.bn].*   (PredictorLG,
        dynamic_vit.py:370-560; norm/dense pairs at sequential indices
        3j / 3j+1, the last out_conv pair being the final norm + 1-unit head)
      early_exit_head.{0,1}.*                              (dynamic_vit.py:752-758)
    BatchNorm running statistics land in the 'batch_stats' collection.

    Args:
      variables: either a bare params dict or a full flax variables dict
        {'params': ..., 'batch_stats': ...}; same structure is returned.

    Returns:
      (new_variables, loaded_keys, skipped_keys).
    """
    import copy

    if "model" in state_dict and not hasattr(state_dict["model"], "shape"):
        state_dict = state_dict["model"]

    has_collections = "params" in variables and isinstance(
        variables["params"], Mapping
    )
    params = variables["params"] if has_collections else variables
    batch_stats = variables.get("batch_stats") if has_collections else None

    backbone, special = {}, {}
    for k, v in state_dict.items():
        if k.startswith("score_predictor.") or k.startswith("early_exit_head."):
            special[k] = np.asarray(v)
        else:
            backbone[k] = v

    new_params, loaded, skipped = convert_deit_state_dict(
        backbone, params, strict
    )
    new_stats = None
    if batch_stats is not None:
        new_stats = copy.deepcopy(
            _unflatten(
                {k: np.asarray(v) for k, v in _to_plain_dict(batch_stats).items()}
            )
        )

    # number of out_conv (norm, dense) pairs per predictor — the final pair
    # maps to final_norm/final_dense instead of out_{j}
    out_pairs: Dict[int, int] = {}
    for k in special:
        parts = k.split(".")
        if parts[0] == "score_predictor" and parts[2] == "out_conv":
            p, j = int(parts[1]), int(parts[3]) // 3
            out_pairs[p] = max(out_pairs.get(p, 0), j + 1)

    for k, v in special.items():
        path, collection, transpose = _map_student_key(k, out_pairs)
        if path is None:
            skipped.append(k)
            continue
        tgt = new_stats if collection == "batch_stats" else new_params
        if tgt is None:  # BN stats but model has no batch_stats collection
            skipped.append(k)
            continue
        if transpose:
            v = v.T
        ok = _set(tgt, path, v, strict)
        (loaded if ok else skipped).append(k)

    if has_collections:
        out_vars = dict(variables)
        out_vars["params"] = new_params
        if new_stats is not None:
            out_vars["batch_stats"] = new_stats
        return out_vars, loaded, skipped
    return new_params, loaded, skipped


def _map_student_key(key: str, out_pairs: Dict[int, int]):
    """torch student-module key -> (flax path, collection, transpose)."""
    parts = key.split(".")
    if parts[0] == "early_exit_head":
        # Sequential(norm_layer, Linear) (dynamic_vit.py:755-758)
        idx, leaf = int(parts[1]), parts[2]
        if idx == 0:
            return ("early_exit_norm", _ln(leaf)), "params", False
        return ("early_exit_head", _wb(leaf)), "params", leaf == "weight"

    # score_predictor.{p}.{conv}.{m}[.bn].{leaf}
    p, conv, m = int(parts[1]), parts[2], int(parts[3])
    rest = parts[4:]
    j, pos = m // 3, m % 3  # Sequential repeats (norm, dense, act)
    pred = f"score_predictor_{p}"
    is_final = conv == "out_conv" and j == out_pairs.get(p, 0) - 1
    unit = f"in_{j}" if conv == "in_conv" else f"out_{j}"

    if rest[0] == "bn":  # BatchNormLayer wrapper (dynamic_vit.py:350-367)
        leaf = rest[1]
        if leaf == "num_batches_tracked":
            return None, None, False
        norm_path = (
            (pred, "final_norm") if (is_final and pos == 0) else (pred, unit, "norm")
        )
        if leaf in ("running_mean", "running_var"):
            name = "mean" if leaf == "running_mean" else "var"
            return norm_path + (name,), "batch_stats", False
        return norm_path + (_ln(leaf),), "params", False

    leaf = rest[0]
    if pos == 0:  # LayerNorm
        norm_path = (pred, "final_norm") if is_final else (pred, unit, "norm")
        return norm_path + (_ln(leaf),), "params", False
    if is_final:  # final 1-unit Dense
        return (pred, "final_dense", _wb(leaf)), "params", leaf == "weight"
    return (pred, unit, "dense", _wb(leaf)), "params", leaf == "weight"


def export_student_state_dict(
    variables,
    template_sd: Mapping[str, np.ndarray],
    strict: bool = True,
) -> Tuple[Dict[str, np.ndarray], list]:
    """Inverse of convert_student_state_dict: flax variables -> torch
    state_dict for the reference's own model classes.

    Takes a TPU-trained student (or plain DeiT/teacher) back to the
    reference torch ecosystem — e.g. evaluating a student trained here with
    the reference's evaluate.py, or handing weights to fvcore/timm tools.
    Every forward-conversion layout op is a bijective transpose/reshape, so
    the export is exact (bit-for-bit round-trip).

    Args:
      variables: flax params dict or full {'params', 'batch_stats'} dict.
      template_sd: a state_dict of the TARGET reference module (same
        geometry) — supplies the torch key set, shapes for the legacy
        patchify reshape, and the num_batches_tracked counters (flax does
        not track those; they pass through from the template).
      strict: raise if a template key has no flax source.

    Returns:
      (state_dict of numpy arrays, list of passthrough/missing keys).
    """
    has_collections = "params" in variables and isinstance(
        variables["params"], Mapping
    )
    params = variables["params"] if has_collections else variables
    batch_stats = (
        variables.get("batch_stats", {}) if has_collections else {}
    )

    out_pairs: Dict[int, int] = {}
    for k in template_sd:
        parts = k.split(".")
        if parts[0] == "score_predictor" and parts[2] == "out_conv":
            p, j = int(parts[1]), int(parts[3]) // 3
            out_pairs[p] = max(out_pairs.get(p, 0), j + 1)

    out: Dict[str, np.ndarray] = {}
    passthrough: list = []
    for key, tmpl in template_sd.items():
        tmpl = np.asarray(tmpl)
        if key.endswith("num_batches_tracked"):
            out[key] = tmpl.copy()
            passthrough.append(key)
            continue
        if key.startswith("score_predictor.") or key.startswith(
            "early_exit_head."
        ):
            path, collection, transpose = _map_student_key(key, out_pairs)
            v = _get(
                batch_stats if collection == "batch_stats" else params, path
            )
            if v is None:
                if strict:
                    raise KeyError(f"no flax source for {key} (path {path})")
                passthrough.append(key)
                out[key] = tmpl.copy()
                continue
            v = np.asarray(v)
            if transpose:
                v = v.T
        else:
            path = _map_key(key, tmpl)
            v = _get(params, path) if path is not None else None
            if v is None:
                if strict:
                    raise KeyError(f"no flax source for {key} (path {path})")
                passthrough.append(key)
                out[key] = tmpl.copy()
                continue
            v = np.asarray(v)
            if key.endswith("patch_embed.proj.weight"):
                v = v.transpose(3, 2, 0, 1)  # HWIO -> OIHW
                if tmpl.ndim < 4:  # legacy linear patchify layout
                    v = v.reshape(tmpl.shape)
            elif key.endswith(".weight") and v.ndim == 2:
                v = v.T  # (in,out) -> (out,in)
            elif key == "pos_embed" and v.shape != tmpl.shape:
                raise ValueError(
                    f"pos_embed token count mismatch {v.shape} vs "
                    f"{tmpl.shape}: export requires the same geometry "
                    "(there is no inverse of the interpolating resize)"
                )
        if v.shape != tmpl.shape:
            raise ValueError(
                f"shape mismatch for {key}: flax {v.shape} vs torch "
                f"{tmpl.shape}"
            )
        out[key] = v.astype(tmpl.dtype, copy=False)
    return out, passthrough


def convert_t2t_state_dict(
    state_dict: Mapping[str, np.ndarray],
    params,
    strict: bool = False,
) -> Tuple[Dict, list, list]:
    """Map a T2T-ViT torch checkpoint onto a T2TViT params pytree.

    Handles the published tarball layout ({'state_dict_ema': ...},
    t2t_vit.py:186-277) and the tokens_to_token stem:
      attention{1,2} as Token_performer (kqv/proj/norm1/norm2/mlp.0/mlp.2 +
      frozen random-feature matrix w -> prm_w, token_performer.py:8-29) or
      Token_transformer (norm1/attn.qkv/attn.proj/norm2/mlp.fc1/fc2,
      token_transformer.py:45-60), project Linear, or the 3-conv stem
      (t2t_vit.py:74-79). The fixed sinusoid pos_embed (t2t_vit.py:119) is
      deliberately skipped — ours is computed, not stored.
    Backbone blocks/norm/head reuse the DeiT mapping.
    """
    import copy

    for wrapper in ("state_dict_ema", "model", "state_dict"):
        if wrapper in state_dict and not hasattr(state_dict[wrapper], "shape"):
            state_dict = state_dict[wrapper]

    out = copy.deepcopy(
        _unflatten({k: np.asarray(v) for k, v in _to_plain_dict(params).items()})
    )
    loaded, skipped = [], []
    for key, v in state_dict.items():
        v = np.asarray(v)
        path, transform = _map_t2t_key(key, v)
        if path is None:
            skipped.append(key)
            continue
        if transform == "T":
            v = v.T
        elif transform == "conv":
            v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        ok = _set(out, path, v, strict)
        (loaded if ok else skipped).append(key)
    return out, loaded, skipped


def _map_t2t_key(key: str, v: np.ndarray):
    """T2T torch key -> (flax path, transform) with transform in
    (None, 'T', 'conv')."""
    parts = key.split(".")
    if key == "cls_token":
        return ("cls_token",), None
    if key == "pos_embed":
        return None, None  # fixed sinusoid table, computed in the model
    if parts[0] == "tokens_to_token":
        t2t = ("tokens_to_token",)
        sub = parts[1]
        if sub == "project":
            if v.ndim == 4:  # convolution stem's 3rd conv
                return t2t + ("conv_2", _wb(parts[2], conv=True)), "conv"
            return (
                t2t + ("project", _wb(parts[2])),
                "T" if parts[2] == "weight" else None,
            )
        if sub in ("soft_split0", "soft_split1"):
            # only the convolution stem has parameters here (nn.Unfold has
            # none); conv index 0/1 respectively
            idx = "conv_0" if sub == "soft_split0" else "conv_1"
            return t2t + (idx, _wb(parts[2], conv=True)), "conv"
        if sub in ("attention1", "attention2"):
            rest = parts[2:]
            unit = t2t + (sub,)
            if rest[0] == "w":  # performer frozen projection -> prm_w
                return unit + ("prm_w",), None
            if rest[0] in ("norm1", "norm2"):
                return unit + (rest[0], _ln(rest[1])), None
            if rest[0] in ("kqv", "proj"):  # performer linears
                return (
                    unit + (rest[0], _wb(rest[1])),
                    "T" if rest[1] == "weight" else None,
                )
            if rest[0] == "attn":  # transformer unit: attn.qkv / attn.proj
                return (
                    unit + (rest[1], _wb(rest[2])),
                    "T" if rest[2] == "weight" else None,
                )
            if rest[0] == "mlp":
                if rest[1] in ("fc1", "fc2"):  # transformer unit Mlp
                    return (
                        unit + ("mlp", rest[1], _wb(rest[2])),
                        "T" if rest[2] == "weight" else None,
                    )
                # performer Sequential: mlp.0 / mlp.2 are the linears
                name = {"0": "mlp_fc1", "2": "mlp_fc2"}.get(rest[1])
                if name is None:
                    return None, None
                return (
                    unit + (name, _wb(rest[2])),
                    "T" if rest[2] == "weight" else None,
                )
        return None, None
    # backbone: blocks.N / norm / head — same layout as DeiT
    path = _map_key(key, v)
    if path is None:
        return None, None
    transform = "T" if (key.endswith(".weight") and v.ndim == 2) else None
    return path, transform


def convert_dino_state_dict(
    state_dict: Mapping[str, np.ndarray],
    params,
    strict: bool = False,
) -> Tuple[Dict, list, list]:
    """Map a DINO torch checkpoint onto DINOViT / DINODistilledViT /
    DINOPredictorViT params.

    DINO checkpoints (dino.py:527-533) are HEADLESS (self-supervised: no
    'head.*' keys — the flax head keeps its initialization, mirroring the
    reference's strict=False load) and otherwise DeiT-shaped; the
    shape-distilled release (dino.py:609-615) arrives wrapped in {'model':
    ...} with cls+dist tokens — both handled by the DeiT mapping. The
    pruning predictor (dino.py:340-366: in_conv LN+Linear, out_conv three
    Linears at Sequential indices 0/2/4) maps onto _DinoPredictor.
    """
    import copy

    if "model" in state_dict and not hasattr(state_dict["model"], "shape"):
        state_dict = state_dict["model"]
    if "teacher" in state_dict and not hasattr(state_dict["teacher"], "shape"):
        # full DINO training checkpoints carry student+teacher nets; the
        # released backbones are the teacher weights
        state_dict = {
            k.removeprefix("backbone."): v
            for k, v in state_dict["teacher"].items()
            if k.startswith("backbone.")
        }

    backbone, special = {}, {}
    for k, v in state_dict.items():
        if k.startswith("predictor."):
            special[k] = np.asarray(v)
        else:
            backbone[k] = v
    out, loaded, skipped = convert_deit_state_dict(backbone, params, strict)

    pred_map = {
        "in_conv.0": ("in_norm", _ln),
        "in_conv.1": ("in_dense", _wb),
        "out_conv.0": ("out_0", _wb),
        "out_conv.2": ("out_1", _wb),
        "out_conv.4": ("out_2", _wb),
    }
    for k, v in special.items():
        parts = k.split(".")
        sub, leaf = ".".join(parts[1:3]), parts[3]
        if sub not in pred_map:
            skipped.append(k)
            continue
        name, leaf_fn = pred_map[sub]
        if leaf == "weight" and v.ndim == 2:
            v = v.T
        ok = _set(out, ("predictor", name, leaf_fn(leaf)), v, strict)
        (loaded if ok else skipped).append(k)
    return out, loaded, skipped


def _map_key(key: str, v: np.ndarray):
    """torch key -> flax path tuple, or None for keys we deliberately skip."""
    parts = key.split(".")
    if key in ("cls_token", "pos_embed", "dist_token"):
        return (key,)
    if parts[0] == "head_dist":
        return ("head_dist", _wb(parts[1]))
    if parts[0] == "patch_embed" and parts[1] == "proj":
        return ("patch_embed", "proj", _wb(parts[2], conv=True))
    if parts[0] == "blocks":
        blk = f"blocks_{parts[1]}"
        rest = parts[2:]
        if rest[0] in ("norm1", "norm2"):
            return (blk, rest[0], _ln(rest[1]))
        if rest[0] == "attn":
            return (blk, "attn", rest[1], _wb(rest[2]))
        if rest[0] == "mlp":
            return (blk, "mlp", rest[1], _wb(rest[2]))
        return None
    if parts[0] == "norm":
        return ("norm", _ln(parts[1]))
    if parts[0] == "head":
        return ("head", _wb(parts[1]))
    return None


def _wb(name: str, conv: bool = False) -> str:
    return {"weight": "kernel", "bias": "bias"}[name]


def _ln(name: str) -> str:
    return {"weight": "scale", "bias": "bias"}[name]


def _get(tree, path):
    node = tree
    for k in path:
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return node


def _to_plain_dict(params, prefix=()) -> Dict[Tuple[str, ...], np.ndarray]:
    flat = {}
    for k, v in params.items():
        if isinstance(v, Mapping):
            flat.update(_to_plain_dict(v, prefix + (k,)))
        else:
            flat["/".join(prefix + (k,))] = np.asarray(v)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    out: Dict = {}
    for k, v in flat.items():
        node = out
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out
