"""ResNet backbones in Flax (NHWC).

Reference parity: ``imports/hand4whole/common/nets/resnet.py`` (torchvision
ResNet-18/50 without the classification head; output stride 32, feature dims
512/2048). Used by the Hand4Whole body/hand/face towers.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=self.strides, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, name="bn2")(y)
        if residual.shape[-1] != self.filters or self.strides != 1:
            residual = nn.Conv(self.filters, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype, name="down_conv")(x)
            residual = nn.BatchNorm(use_running_average=True, name="down_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=self.strides, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=True, name="bn3")(y)
        if residual.shape[-1] != self.filters * 4 or self.strides != 1:
            residual = nn.Conv(self.filters * 4, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype, name="down_conv")(x)
            residual = nn.BatchNorm(use_running_average=True, name="down_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Feature extractor: input (B, H, W, 3) -> (B, H/32, W/32, feat_dim)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)   # ResNet-50
    bottleneck: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        block = Bottleneck if self.bottleneck else BasicBlock
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (n_blocks, filters) in enumerate(zip(self.stage_sizes, (64, 128, 256, 512))):
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = block(filters, strides, self.dtype, name=f"layer{i + 1}_{j}")(x)
        return x

    @property
    def feat_dim(self) -> int:
        return 2048 if self.bottleneck else 512


def resnet50(dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), bottleneck=True, dtype=dtype)


def resnet18(dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), bottleneck=False, dtype=dtype)
