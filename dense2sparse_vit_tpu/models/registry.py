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


def create_model(name: str, **kwargs):
    """Instantiate a registered model module by name."""
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


# parity with reference factories (dynamic_vit.py:1216-1381)
register_model("dynamic_vit_tiny_patch16_224_student")(_student(deit_tiny()))
register_model("dynamic_vit_small_patch16_224_student")(_student(deit_small()))
register_model("dynamic_vit_base_patch16_224_student")(_student(deit_base()))
register_model("dynamic_vit_tiny_patch16_224_teacher")(_teacher(deit_tiny()))
register_model("dynamic_vit_small_patch16_224_teacher")(_teacher(deit_small()))
register_model("dynamic_vit_base_patch16_224_teacher")(_teacher(deit_base()))
