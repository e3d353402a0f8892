"""Import the reference's own PyTorch model code for parity testing.

The reference (/root/reference/vit_models/) depends on timm 0.4.12, which is
not installed in this environment. Everything it actually uses from timm is
tiny (constants, DropPath, to_2tuple, trunc_normal_, a registry decorator),
so we install a minimal shim into sys.modules and load the reference modules
under a synthetic package so their relative imports resolve.

This lets tests run e.g. VisionTransformerDiffPruning
(dynamic_vit.py:642-1015) forward on CPU with random weights and assert our
flax models reproduce its logits / pred_logits / kept indices after weight
conversion — full-model numerical parity without network access.
"""

from __future__ import annotations

import importlib
import math
import sys
import types

REFERENCE_VIT_DIR = "/root/reference/vit_models"
_PKG = "refvit"


def _install_timm_shim() -> None:
    if "timm" in sys.modules:
        return

    import torch
    import torch.nn as nn

    timm = types.ModuleType("timm")
    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)

    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        # inverse-CDF truncated normal, matching timm's _no_grad_trunc_normal_
        def norm_cdf(v):
            return (1.0 + math.erf(v / math.sqrt(2.0))) / 2.0

        with torch.no_grad():
            lo, up = norm_cdf((a - mean) / std), norm_cdf((b - mean) / std)
            tensor.uniform_(2 * lo - 1, 2 * up - 1)
            tensor.erfinv_()
            tensor.mul_(std * math.sqrt(2.0)).add_(mean)
            tensor.clamp_(min=a, max=b)
            return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * mask.floor_()

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop = nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    layers.Mlp = Mlp

    loss_mod = types.ModuleType("timm.loss")

    class SoftTargetCrossEntropy(nn.Module):
        def forward(self, x, target):
            return torch.mean(
                torch.sum(-target * torch.nn.functional.log_softmax(x, -1), -1)
            )

    loss_mod.SoftTargetCrossEntropy = SoftTargetCrossEntropy

    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn: fn

    helpers = types.ModuleType("timm.models.helpers")

    def load_pretrained(*a, **k):  # factories with pretrained=True only
        raise RuntimeError("load_pretrained unavailable in tests (no egress)")

    helpers.load_pretrained = load_pretrained

    models.layers = layers
    models.registry = registry
    models.helpers = helpers
    timm.data = data
    timm.models = models

    timm.loss = loss_mod
    for name, mod in {
        "timm": timm,
        "timm.data": data,
        "timm.models": models,
        "timm.models.layers": layers,
        "timm.models.registry": registry,
        "timm.models.helpers": helpers,
        "timm.loss": loss_mod,
    }.items():
        sys.modules[name] = mod


def load_reference_module(name: str):
    """Load /root/reference/vit_models/<name>.py as module refvit.<name>."""
    _install_timm_shim()
    if _PKG not in sys.modules:
        pkg = types.ModuleType(_PKG)
        pkg.__path__ = [REFERENCE_VIT_DIR]
        pkg.__package__ = _PKG
        sys.modules[_PKG] = pkg
    return importlib.import_module(f"{_PKG}.{name}")


def load_reference_toplevel(name: str):
    """Load /root/reference/<name>.py (e.g. losses) as module reftop.<name>.

    Only modules whose imports the shim covers (losses.py needs torch +
    timm.loss); train.py et al. pull fvcore/tqdm/wandb and are re-created
    inline by the tests that pin their semantics.
    """
    _install_timm_shim()
    pkg_name = "reftop"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = ["/root/reference"]
        pkg.__package__ = pkg_name
        sys.modules[pkg_name] = pkg
    return importlib.import_module(f"{pkg_name}.{name}")
