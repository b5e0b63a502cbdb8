"""Shared Flax building blocks.

TPU conventions used across the model zoo:
* NHWC layout (XLA:TPU native conv layout — channels on the 128-lane dim).
* ``dtype`` is the compute/activation dtype (bfloat16 in production,
  float32 in tests); parameters stay float32 (``param_dtype``).
* BatchNorm follows torch semantics: eps 1e-5, running-stat momentum 0.1
  (flax ``momentum = 0.9``), exercised with ``use_running_average`` driven
  by a ``train`` flag. Cross-replica SyncBN (the reference's apex
  ``convert_syncbn_model``, yolo/procedures/initialize.py:32) is expressed
  with ``axis_name='batch'`` so BN stats psum over the data mesh axis.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class ConvBN(nn.Module):
    """conv + batch_norm + leaky_relu(0.1) — the reference 'CBL' block
    (yolo/nets/yolohead.py:41-49, darknet.py:13-21)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    use_bn: bool = True
    act: bool = True
    negative_slope: float = 0.1
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=((pad, pad), (pad, pad)),
            use_bias=not self.use_bn,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                axis_name=self.bn_axis_name if train else None,
                name="bn",
            )(x)
        if self.act:
            x = nn.leaky_relu(x, negative_slope=self.negative_slope)
        return x


def max_pool_same(x, window: int, stride: int = 1):
    """MaxPool2d(kernel, stride, padding=(k-1)//2) torch semantics, NHWC."""
    pad = (window - 1) // 2
    return nn.max_pool(
        x,
        window_shape=(window, window),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
    )


def max_pool_3x3_s2(x):
    """3x3/stride-2/pad-1 max pool (the ResNet stem pool,
    utilities/resnet.py:148) via EXACT phase decomposition.

    NOTE: measured SLOWER than plain reduce_window on v5e (stem detail
    ablate, bs16 640²: +2.63 ms vs +0.84 ms for nn.max_pool) — the
    dense reshapes materialize full intermediates while reduce_window
    fuses. Kept for the ablation harness; the ResNet stem uses
    max_pool_same (resnet.py:243).
    With row phases e[p] = x[2p], o[p] = x[2p+1] the window
    {2p-1, 2p, 2p+1} is max(o[p-1], e[p], o[p]) — one paired
    reshape-max plus one shifted max per axis, all dense reshapes and
    elementwise maxima (no windows). Identical to nn.max_pool incl. the
    -inf boundary (o[-1] doesn't exist -> the p=0 window only sees two
    taps). Falls back to nn.max_pool for odd H or W."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        return max_pool_same(x, 3, 2)

    def pool_axis(t, axis):
        n = t.shape[axis]
        pair = t.reshape(t.shape[:axis] + (n // 2, 2) + t.shape[axis + 1:])
        m = jnp.max(pair, axis=axis + 1)          # max(e[p], o[p])
        o = jax.lax.index_in_dim(pair, 1, axis + 1, keepdims=False)
        pad_cfg = [(0, 0, 0)] * o.ndim
        pad_cfg[axis] = (1, -1, 0)                # shift: o[p-1], drop o[-1]
        oprev = jax.lax.pad(o, jnp.asarray(-jnp.inf, o.dtype), pad_cfg)
        return jnp.maximum(m, oprev)

    return pool_axis(pool_axis(x, 1), 2)


def upsample_nearest_2x(x):
    """nn.Upsample(scale_factor=2, mode='nearest') for NHWC tensors.

    Implemented as reshape+broadcast (XLA fuses this; avoids gather)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed (non-trainable, non-updating) statistics —
    torchvision FrozenBatchNorm2d used by detection ResNets
    (tvision/_utils.py:7, backbone_utils.py). scale/bias/mean/var are
    plain variables in the 'frozen' collection so checkpoints can load
    pretrained stats; math is (x - mean) * rsqrt(var + eps) * weight + bias
    folded into one multiply-add."""

    features: int
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # train ignored — frozen
        weight = self.variable(
            "frozen", "weight", lambda: jnp.ones(self.features, jnp.float32)
        ).value
        bias = self.variable(
            "frozen", "bias", lambda: jnp.zeros(self.features, jnp.float32)
        ).value
        mean = self.variable(
            "frozen", "running_mean",
            lambda: jnp.zeros(self.features, jnp.float32),
        ).value
        var = self.variable(
            "frozen", "running_var",
            lambda: jnp.ones(self.features, jnp.float32),
        ).value
        scale = weight / jnp.sqrt(var + self.epsilon)
        shift = bias - mean * scale
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


class ClassAttention(nn.Module):
    """SE-style class-logit attention (yolo/utilities/custom.py:135-160 —
    present in the reference but unused on its main path; kept for
    capability parity). Pools the class logits over (anchor, H, W),
    squeezes through a bottleneck MLP, and returns per-class gates."""

    num_classes: int
    reduction_ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, class_logits):
        # class_logits: [B, H, W, A, C] (or any [B, ..., C])
        pooled = jnp.mean(
            class_logits.reshape(class_logits.shape[0], -1,
                                 self.num_classes), axis=1)
        x = nn.softmax(pooled)
        x = nn.relu(nn.Dense(self.reduction_ratio, dtype=self.dtype,
                             param_dtype=jnp.float32, name="fc1")(x))
        x = nn.Dense(self.num_classes, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(x)
        return nn.sigmoid(x)
