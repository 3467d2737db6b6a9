"""ResNet-50 encoder (flax, NHWC).

Re-design of ``Models/encoder/resnet_encoder.py:62-110``: standard bottleneck
ResNet-50 returning the five stage outputs deepest-first.  BatchNorm runs in
inference mode when ``deterministic`` (running stats in the 'batch_stats'
collection).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ResNetEncoder"]


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        bn = lambda name: nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                                       epsilon=1e-5, dtype=self.dtype, name=name)
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.has_downsample:
            x = nn.Conv(self.planes * 4, (1, 1), strides=self.stride, use_bias=False,
                        dtype=self.dtype, name="downsample_conv")(x)
            x = bn("downsample_bn")(x)
        return nn.relu(out + x)


class ResNetEncoder(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        out1 = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = [out1]
        h = out1
        for i, (blocks, planes) in enumerate(zip(self.layers, (64, 128, 256, 512))):
            stride = 1 if i == 0 else 2
            for b in range(blocks):
                h = Bottleneck(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    has_downsample=(b == 0),
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{b}",
                )(h, deterministic)
            outs.append(h)
        # deepest-first: (out5, out4, out3, out2, out1) — resnet_encoder.py:110
        return outs[::-1]
