"""Darknet-21/53 backbones in Flax (NHWC).

Architecture parity with `yolo/nets/backbone/darknet.py:10-107`: a 3x3
stem to 32 channels, then five stages of (stride-2 3x3 downsample + N
residual blocks of 1x1-halve / 3x3-restore), LeakyReLU(0.1) everywhere,
returning the C3/C4/C5 feature maps (256/512/1024 channels at strides
8/16/32).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from object_detectors_tpu.models.common import ConvBN


class ResidualBlock(nn.Module):
    """1x1 bottleneck to planes[0], 3x3 back to planes[1], + identity."""

    planes: Sequence[int]
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        x = ConvBN(self.planes[0], 1, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="conv1")(x, train)
        x = ConvBN(self.planes[1], 3, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="conv2")(x, train)
        return x + residual


class DarkNet(nn.Module):
    """Stage layout [1,2,8,8,4] = Darknet-53; [1,1,2,2,1] = Darknet-21."""

    layers: Sequence[int]
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None

    # channel plan per stage: (bottleneck, out)
    STAGE_PLANES = ((32, 64), (64, 128), (128, 256), (256, 512), (512, 1024))
    out_channels = (256, 512, 1024)  # C3, C4, C5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(32, 3, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                   name="stem")(x, train)
        feats = []
        for stage, (planes, blocks) in enumerate(
            zip(self.STAGE_PLANES, self.layers)
        ):
            x = ConvBN(planes[1], 3, strides=2, dtype=self.dtype,
                       bn_axis_name=self.bn_axis_name,
                       name=f"down{stage+1}")(x, train)
            for i in range(blocks):
                x = ResidualBlock(planes, dtype=self.dtype,
                                  bn_axis_name=self.bn_axis_name,
                                  name=f"stage{stage+1}_block{i}")(x, train)
            if stage >= 2:  # C3, C4, C5
                feats.append(x)
        return tuple(feats)


def darknet53(dtype=jnp.float32, bn_axis_name=None) -> DarkNet:
    return DarkNet(layers=(1, 2, 8, 8, 4), dtype=dtype,
                   bn_axis_name=bn_axis_name)


def darknet21(dtype=jnp.float32, bn_axis_name=None) -> DarkNet:
    return DarkNet(layers=(1, 1, 2, 2, 1), dtype=dtype,
                   bn_axis_name=bn_axis_name)
