"""Model registry + factory dispatch.

Replaces the reference's timm `@register_model` factories and the substring
dispatch in `utils.get_model` (/root/reference/utils.py:14-65) with an explicit
name -> factory registry. Factories return (module, init_fn) pairs are not
needed in JAX; they return the flax Module — parameters are created by
`module.init` at the call site (weights load separately via utils/convert).
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

from dense2sparse_vit_tpu.core.config import (
    ModelConfig,
    PruningConfig,
    deit_base,
    deit_small,
    deit_tiny,
)
from dense2sparse_vit_tpu.models.student import DiffPruningStudent
from dense2sparse_vit_tpu.models.teacher import ViTTeacher

_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(f"duplicate model name {name!r}")
        _REGISTRY[name] = fn
        return fn

    return deco


def list_models():
    return sorted(_REGISTRY)


_ALIASES: Dict[str, str] = {}


def register_alias(alias: str, target: str):
    _ALIASES[alias] = target


def create_model(name: str, **kwargs):
    """Instantiate a registered model module by name (aliases accepted)."""
    name = _ALIASES.get(name, name)
    if name not in _REGISTRY:
        raise ValueError(f"unknown model {name!r}; available: {list_models()}")
    return _REGISTRY[name](**kwargs)


def _student(size_cfg: ModelConfig):
    def factory(
        pruning_locs: Sequence[int] = (3,),
        keep_ratios: Sequence[float] = (0.7,),
        **kwargs,
    ):
        pruning_kwargs = {
            k: kwargs.pop(k)
            for k in list(kwargs)
            if k in PruningConfig.__dataclass_fields__
        }
        return DiffPruningStudent(
            cfg=size_cfg.replace(**kwargs),
            pruning=PruningConfig(
                pruning_locs=tuple(pruning_locs),
                keep_ratios=tuple(keep_ratios),
                **pruning_kwargs,
            ),
        )

    return factory


def _teacher(size_cfg: ModelConfig):
    def factory(**kwargs):
        return ViTTeacher(cfg=size_cfg.replace(**kwargs))

    return factory


def _default_student(size_cfg: ModelConfig):
    def factory(
        pruning_locs: Sequence[int] = (3, 6, 9),
        keep_ratios: Sequence[float] = (0.7, 0.49, 0.343),
        **kwargs,
    ):
        from dense2sparse_vit_tpu.models.dynamic_vit_default import (
            DynamicViTStudent,
        )

        pruning_kwargs = {
            k: kwargs.pop(k)
            for k in list(kwargs)
            if k in PruningConfig.__dataclass_fields__
        }
        pruning_kwargs.setdefault("selection", "gumbel")
        return DynamicViTStudent(
            cfg=size_cfg.replace(**kwargs),
            pruning=PruningConfig(
                pruning_locs=tuple(pruning_locs),
                keep_ratios=tuple(keep_ratios),
                **pruning_kwargs,
            ),
        )

    return factory


# parity with reference factories (dynamic_vit.py:1216-1381)
register_model("dynamic_vit_tiny_patch16_224_student")(_student(deit_tiny()))
register_model("dynamic_vit_small_patch16_224_student")(_student(deit_small()))
register_model("dynamic_vit_base_patch16_224_student")(_student(deit_base()))
register_model("dynamic_vit_tiny_patch16_224_teacher")(_teacher(deit_tiny()))
register_model("dynamic_vit_small_patch16_224_teacher")(_teacher(deit_small()))
register_model("dynamic_vit_base_patch16_224_teacher")(_teacher(deit_base()))
# DynamicViT-paper baseline (default_dynamic_vit.py:638-782)
register_model("default_dynamic_vit_tiny_patch16_224_student")(
    _default_student(deit_tiny())
)
register_model("default_dynamic_vit_small_patch16_224_student")(
    _default_student(deit_small())
)
register_model("default_dynamic_vit_base_patch16_224_student")(
    _default_student(deit_base())
)
# the 'default teacher' is architecturally the same plain ViT
register_model("default_dynamic_vit_tiny_patch16_224_teacher")(
    _teacher(deit_tiny())
)
register_model("default_dynamic_vit_small_patch16_224_teacher")(
    _teacher(deit_small())
)
register_model("default_dynamic_vit_base_patch16_224_teacher")(
    _teacher(deit_base())
)


def _deit(cls_name: str, size_cfg: ModelConfig, **fixed):
    def factory(**kwargs):
        from dense2sparse_vit_tpu.models import deit as deit_mod

        cls = getattr(deit_mod, cls_name)
        extra = {
            k: kwargs.pop(k)
            for k in list(kwargs)
            if k in cls.__dataclass_fields__ and k != "cfg"
        }
        return cls(cfg=size_cfg.replace(**kwargs), **{**fixed, **extra})

    return factory


# DeiT family (deit.py:641-808 factory surface)
register_model("deit_tiny_patch16_224")(_deit("DeiT", deit_tiny()))
register_model("deit_small_patch16_224")(_deit("DeiT", deit_small()))
register_model("deit_base_patch16_224")(_deit("DeiT", deit_base()))
register_model("deit_base_patch16_384")(
    _deit("DeiT", deit_base(img_size=384))
)
register_model("deit_tiny_distilled_patch16_224")(
    _deit("DistilledDeiT", deit_tiny())
)
register_model("deit_small_distilled_patch16_224")(
    _deit("DistilledDeiT", deit_small())
)
register_model("deit_base_distilled_patch16_224")(
    _deit("DistilledDeiT", deit_base())
)
register_model("vanilla_deit_tiny_patch16_224")(
    _deit("VanillaDeiT", deit_tiny())
)
register_model("vanilla_deit_small_patch16_224")(
    _deit("VanillaDeiT", deit_small())
)
register_model("vanilla_deit_base_patch16_224")(
    _deit("VanillaDeiT", deit_base())
)
register_model("nonspatial_deit_small_patch16_224")(
    _deit("NonSpatialDeiT", deit_small())
)
register_model("deit_small_patch16_224_masked")(
    _deit("MaskedDistilledDeiT", deit_small())
)
register_model("deit_small_patch16_224_predictor")(
    _deit("MaskPredictorDeiT", deit_small())
)


def _dino(cls_name: str, size_cfg: ModelConfig, **fixed):
    def factory(patch_size: int = 16, **kwargs):
        from dense2sparse_vit_tpu.models import dino as dino_mod

        cls = getattr(dino_mod, cls_name)
        extra = {
            k: kwargs.pop(k)
            for k in list(kwargs)
            if k in cls.__dataclass_fields__ and k != "cfg"
        }
        return cls(
            cfg=size_cfg.replace(patch_size=patch_size, **kwargs),
            **{**fixed, **extra},
        )

    return factory


# DINO family (dino.py:503-618); DINO checkpoints are headless (num_classes=0)
register_model("dino_tiny")(_dino("DINOViT", deit_tiny(num_classes=0)))
register_model("dino_small")(_dino("DINOViT", deit_small(num_classes=0)))
register_model("dino_base")(_dino("DINOViT", deit_base(num_classes=0)))
register_model("dino_small_predictor")(
    _dino("DINOPredictorViT", deit_small(num_classes=0))
)
register_model("dino_small_dist")(
    _dino("DINODistilledViT", deit_small(num_classes=0))
)
register_model("dino_tiny_dist")(
    _dino("DINODistilledViT", deit_tiny(num_classes=0))
)
register_model("dino_small_patch16_224_masked")(
    _dino("DINOMaskedViT", deit_small())
)


def _t2t(cls_name: str, embed_dim, depth, num_heads, mlp_ratio,
         tokens_type="performer", **fixed):
    def factory(**kwargs):
        from dense2sparse_vit_tpu.models import t2t as t2t_mod

        cls = getattr(t2t_mod, cls_name)
        extra = {
            k: kwargs.pop(k)
            for k in list(kwargs)
            if k in cls.__dataclass_fields__ and k != "cfg"
        }
        cfg = ModelConfig(
            embed_dim=embed_dim, depth=depth, num_heads=num_heads,
            mlp_ratio=mlp_ratio, qkv_bias=False, layer_norm_eps=1e-5,
            **kwargs,
        )
        return cls(cfg=cfg, tokens_type=tokens_type, **{**fixed, **extra})

    return factory


# T2T-ViT family (t2t_vit.py:181-301 factory surface)
register_model("t2t_vit_7")(_t2t("T2TViT", 256, 7, 4, 2.0))
register_model("t2t_vit_10")(_t2t("T2TViT", 256, 10, 4, 2.0))
register_model("t2t_vit_12")(_t2t("T2TViT", 256, 12, 4, 2.0))
register_model("t2t_vit_14")(_t2t("T2TViT", 384, 14, 6, 3.0))
register_model("t2t_vit_19")(_t2t("T2TViT", 448, 19, 7, 3.0))
register_model("t2t_vit_24")(_t2t("T2TViT", 512, 24, 8, 3.0))
register_model("t2t_vit_t_14")(
    _t2t("T2TViT", 384, 14, 6, 3.0, tokens_type="transformer")
)
register_model("t2t_vit_t_19")(
    _t2t("T2TViT", 448, 19, 7, 3.0, tokens_type="transformer")
)
register_model("t2t_vit_t_24")(
    _t2t("T2TViT", 512, 24, 8, 3.0, tokens_type="transformer")
)
register_model("t2t_vit_14_resnext")(_t2t("T2TViT", 384, 14, 32, 3.0))
register_model("t2t_vit_14_wide")(_t2t("T2TViT", 768, 4, 12, 3.0))
register_model("t2t_vit_14_se")(_t2t("T2TViTSE", 384, 14, 6, 3.0))
register_model("t2t_vit_16_ghost")(_t2t("T2TViTGhost", 384, 16, 6, 3.0))
register_model("t2t_vit_dense")(_t2t("T2TViTDense", 128, 12, 4, 2.0))


def _tnt(embed_dim, depth, num_heads, in_dim, in_num_head):
    def factory(**kwargs):
        from dense2sparse_vit_tpu.models.tnt import TNT

        return TNT(
            cfg=ModelConfig(
                embed_dim=embed_dim, depth=depth, num_heads=num_heads,
                qkv_bias=False, layer_norm_eps=1e-5, **kwargs,
            ),
            in_dim=in_dim,
            in_num_head=in_num_head,
        )

    return factory


# TNT (tnt.py:230-249)
register_model("tnt_s_patch16_224")(_tnt(384, 12, 6, 24, 4))
register_model("tnt_b_patch16_224")(_tnt(640, 12, 10, 40, 4))


def _drop_resnet(**fixed):
    def factory(**kwargs):
        from dense2sparse_vit_tpu.models.resnet import drop_resnet50

        return drop_resnet50(**{**fixed, **kwargs})

    return factory


register_model("drop_resnet50")(_drop_resnet())


def _heads(cls_name: str, size_cfg: ModelConfig):
    def factory(**kwargs):
        from dense2sparse_vit_tpu.models import deit_heads

        cls = getattr(deit_heads, cls_name)
        return cls(cfg=size_cfg.replace(**kwargs))

    return factory


# hierarchical / ensemble DeiT (deit_modified.py:123-167, deit_ensemble.py:118-171)
register_model("tiny_patch16_224_hierarchical")(
    _heads("HierarchicalDeiT", deit_tiny())
)
register_model("small_patch16_224_hierarchical")(
    _heads("HierarchicalDeiT", deit_small())
)
register_model("base_patch16_224_hierarchical")(
    _heads("HierarchicalDeiT", deit_base())
)
register_model("tiny_patch16_224_ensemble")(
    _heads("EnsembleDeiT", deit_tiny())
)
register_model("small_patch16_224_ensemble")(
    _heads("EnsembleDeiT", deit_small())
)

# timm-style vanilla ViT with per-layer logits (vit.py:37-150); the original
# timm v0.1 'vit_small' is 768d / depth 8 / 8 heads / mlp 3
register_model("vit_small_patch16_224")(
    _deit(
        "VanillaDeiT",
        ModelConfig(embed_dim=768, depth=8, num_heads=8, mlp_ratio=3.0),
    )
)
register_model("vit_base_patch16_224")(
    _deit("VanillaDeiT", ModelConfig(embed_dim=768, depth=12, num_heads=12))
)
register_model("vit_base_patch16_384")(
    _deit(
        "VanillaDeiT",
        ModelConfig(embed_dim=768, depth=12, num_heads=12, img_size=384),
    )
)
register_model("vit_base_patch32_384")(
    _deit(
        "VanillaDeiT",
        ModelConfig(
            embed_dim=768, depth=12, num_heads=12, img_size=384, patch_size=32
        ),
    )
)
register_model("vit_large_patch16_224")(
    _deit("VanillaDeiT", ModelConfig(embed_dim=1024, depth=24, num_heads=16))
)
register_model("vit_large_patch16_384")(
    _deit(
        "VanillaDeiT",
        ModelConfig(embed_dim=1024, depth=24, num_heads=16, img_size=384),
    )
)
register_model("vit_large_patch32_384")(
    _deit(
        "VanillaDeiT",
        ModelConfig(
            embed_dim=1024, depth=24, num_heads=16, img_size=384, patch_size=32
        ),
    )
)


# exact reference factory-name aliases (capitalized T2T names,
# t2t_vit.py:181-301; dist'd dino names, dino.py:503-618)
for _t2t_name in ("7", "10", "12", "14", "19", "24"):
    register_alias(f"T2t_vit_{_t2t_name}", f"t2t_vit_{_t2t_name}")
for _t2t_name in ("14", "19", "24"):
    register_alias(f"T2t_vit_t_{_t2t_name}", f"t2t_vit_t_{_t2t_name}")
register_alias("T2t_vit_14_resnext", "t2t_vit_14_resnext")
register_alias("T2t_vit_14_wide", "t2t_vit_14_wide")
register_alias("T2t_vit_16_ghost", "t2t_vit_16_ghost")
register_alias("vit_deit_tiny_patch16_224", "deit_tiny_patch16_224")
register_alias("vit_deit_small_patch16_224", "deit_small_patch16_224")
register_alias("vit_deit_base_patch16_224", "deit_base_patch16_224")
register_alias(
    "vit_deit_small_distilled_patch16_224", "deit_small_distilled_patch16_224"
)
register_alias("deit_small_dist_masked", "deit_small_patch16_224_masked")
register_alias("deit_small_dist_predictor", "deit_small_patch16_224_predictor")


def _t2t_student(embed_dim, depth, num_heads, mlp_ratio, tokens_type="performer"):
    def factory(
        pruning_locs: Sequence[int] = (3, 6, 9),
        keep_ratios: Sequence[float] = (0.7, 0.49, 0.343),
        **kwargs,
    ):
        from dense2sparse_vit_tpu.nn.t2t import T2TModule

        pruning_kwargs = {
            k: kwargs.pop(k)
            for k in list(kwargs)
            if k in PruningConfig.__dataclass_fields__
        }
        cfg = ModelConfig(
            embed_dim=embed_dim, depth=depth, num_heads=num_heads,
            mlp_ratio=mlp_ratio, qkv_bias=False, layer_norm_eps=1e-5,
            **kwargs,
        )
        import jax.numpy as jnp

        return DiffPruningStudent(
            cfg=cfg,
            pruning=PruningConfig(
                pruning_locs=tuple(pruning_locs),
                keep_ratios=tuple(keep_ratios),
                **pruning_kwargs,
            ),
            stem=T2TModule(
                embed_dim=embed_dim, tokens_type=tokens_type,
                dtype=jnp.dtype(cfg.dtype), name="tokens_to_token",
            ),
            pos_embed_type="sinusoid",
        )

    return factory


# pruned T2T-ViT students (BASELINE config 4: T2T-14 + pruning stages)
register_model("t2t_vit_14_student")(_t2t_student(384, 14, 6, 3.0))
register_model("t2t_vit_t_14_student")(
    _t2t_student(384, 14, 6, 3.0, tokens_type="transformer")
)


def _dino_student(size_cfg: ModelConfig):
    def factory(
        pruning_locs: Sequence[int] = (3, 6, 9),
        keep_ratios: Sequence[float] = (0.7, 0.49, 0.343),
        **kwargs,
    ):
        pruning_kwargs = {
            k: kwargs.pop(k)
            for k in list(kwargs)
            if k in PruningConfig.__dataclass_fields__
        }
        # BASELINE config 5: DINO backbone + perturbed-top-k masks —
        # differentiable selection on by default
        pruning_kwargs.setdefault("differentiable_topk", True)
        return DiffPruningStudent(
            cfg=size_cfg.replace(**kwargs),
            pruning=PruningConfig(
                pruning_locs=tuple(pruning_locs),
                keep_ratios=tuple(keep_ratios),
                **pruning_kwargs,
            ),
        )

    return factory


register_model("dino_small_student")(_dino_student(deit_small()))
register_model("dino_tiny_student")(_dino_student(deit_tiny()))
