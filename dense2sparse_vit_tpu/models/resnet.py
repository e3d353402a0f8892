"""Drop-ResNet: ResNet-50 with Bernoulli spatial feature-drop masks.

Parity: reference resnet.py (/root/reference/vit_models/resnet.py:8-73): a
stock ResNet whose forward can zero a random spatial mask (shared across
batch and channels) before a chosen stage, used to study spatial-information
robustness alongside the ViT patch-drop experiments.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, use_running_average: bool = True):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=use_running_average, momentum=0.9,
                epsilon=1e-5, dtype=self.dtype, name=name,
            )

        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features * 4, (1, 1), strides=(self.strides,) * 2,
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class DropResNet(nn.Module):
    """ResNet with optional pre-stage spatial drop (resnet.py:8-51)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        *,
        drop_percent: float = 0.0,
        drop_layer: int = 0,
        use_running_average: bool = True,
    ):
        dtype = self.dtype
        x = x.astype(dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=use_running_average,
                         momentum=0.9, epsilon=1e-5, dtype=dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        def maybe_drop(x, stage):
            # Bernoulli spatial mask shared over batch and channels
            # (resnet.py:15-18: mask over (H, W), broadcast)
            if drop_layer == stage and drop_percent > 0.0:
                mask = jax.random.uniform(
                    self.make_rng("feature_drop"), x.shape[1:3]
                ) > drop_percent
                x = x * mask[None, :, :, None].astype(x.dtype)
            return x

        for s, n_blocks in enumerate(self.stage_sizes):
            x = maybe_drop(x, s + 1)
            for b in range(n_blocks):
                strides = 2 if s > 0 and b == 0 else 1
                x = Bottleneck(
                    64 * 2**s, strides, dtype, name=f"layer{s + 1}_{b}"
                )(x, use_running_average=use_running_average)
        x = maybe_drop(x, 5)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=dtype, name="fc")(x)


def drop_resnet50(num_classes: int = 1000, **kw) -> DropResNet:
    """drop_resnet50 factory (resnet.py:63-73)."""
    return DropResNet(stage_sizes=(3, 4, 6, 3), num_classes=num_classes, **kw)
