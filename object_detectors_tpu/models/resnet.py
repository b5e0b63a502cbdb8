"""ResNet backbones (detection flavor) in Flax NHWC.

Parity with the vendored torchvision ResNet
(`torchvision_models/utilities/resnet.py:26-389`) as used by detection:
7x7/s2 stem -> 3x3/s2 maxpool -> 4 bottleneck stages, norm layer
injectable (FrozenBatchNorm for detection, `tvision/backbone_utils.py:53-120`),
returning {C2..C5}. BackboneWithFPN composes a ResNet with the FPN
(+LastLevelMaxPool / LastLevelP6P7) exactly as
`tvision/backbone_utils.py:15-50` / `retinanet.py:634-635`.

Layer freezing (``trainable_layers``) is a gradient-mask concern in JAX —
see :func:`trainable_mask` which produces the optax mask matching
`backbone_utils.py:84-94`.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from object_detectors_tpu.models.common import (
    FrozenBatchNorm, max_pool_same,
)
from object_detectors_tpu.models.fpn import FeaturePyramidNetwork


def _norm(features, kind: str, dtype, name):
    if kind == "frozen":
        return FrozenBatchNorm(features, dtype=dtype, name=name)
    return nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                        dtype=dtype, param_dtype=jnp.float32, name=name)


class SpaceToDepthStem(nn.Module):
    """7x7/s2 stem conv computed as an EXACT space-to-depth
    reparametrization: x [B,H,W,3] -> z [B,H/2,W/2,12] (2x2 phases into
    channels), kernel [7,7,3,64] -> [4,4,12,64] by phase-splitting the
    taps (i-3 = 2k+a), stride 2 -> 1.

    The 3-channel 7x7 direct conv runs ~30x off MXU peak on TPU (the
    depth dim pads 3 -> 8 lanes and the overlapping stride-2 windows
    defeat dense tiling); the reparametrized conv has a 192-deep dense
    contraction and measured 5.05 -> ~0.6 ms at bs16/640². Parameter
    tree matches nn.Conv(name="conv1") — [7,7,3,64] under "kernel" — so
    torch weight converters and checkpoints are unchanged. Falls back
    to the direct conv for odd H/W. Semantics parity: torchvision
    ResNet.conv1 (utilities/resnet.py:146)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, 3, 64), jnp.float32)
        b, h, ww, c = x.shape
        if h % 2 or ww % 2:
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), w.astype(self.dtype), (2, 2),
                ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # tap i reads x[2p + i - 3]; with i - 3 = 2k + a (a in {0,1})
        # that is z-phase a at spatial p + k, k in [-2, 1]. Prepending a
        # zero tap row/col makes i' = i + 1 = 2k' + a with k' in [0, 4).
        wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w2 = (wp.reshape(4, 2, 4, 2, 3, 64)
              .transpose(0, 2, 1, 3, 4, 5)
              .reshape(4, 4, 12, 64))
        z = (x.reshape(b, h // 2, 2, ww // 2, 2, c)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(b, h // 2, ww // 2, 4 * c))
        return jax.lax.conv_general_dilated(
            z.astype(self.dtype), w2.astype(self.dtype), (1, 1),
            ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _stem4_kernel(w):
    """Phase-split stem kernel: [7, 7, 3, 64] -> [3, 3, 48, 256].

    With x space-to-depth'd by 4 (z[..., ay*12+ax*3+c] = x[4u+ay,
    4v+ax, c]), the stride-2 7x7 conv row index for output row
    2u + py (py in {0,1}) and tap iy is X = 4u + 2*py + iy - 3 =
    4*(u-1) + i' with i' = 2*py + iy + 1 in [1, 9]; so tap iy lands at
    z-block u - 1 + i'//4 with phase ay = i' % 4 — a 3x3 conv over z
    with padding 1. Output channel = (py*2+px)*64 + o packs the four
    output phases, i.e. y4[u, v, (py*2+px)*64+o] = conv1(x)[2u+py,
    2v+px, o] exactly (same taps, reassociated summation only)."""
    def phase(py, px):
        wy = jnp.pad(w, ((2 * py + 1, 4 - 2 * py), (0, 0), (0, 0),
                         (0, 0)))                   # rows: i' in [0,12)
        wy = wy.reshape(3, 4, 7, 3, 64)             # [ky, ay, ix, c, o]
        wx = jnp.pad(wy, ((0, 0), (0, 0), (2 * px + 1, 4 - 2 * px),
                          (0, 0), (0, 0)))
        wx = wx.reshape(3, 4, 3, 4, 3, 64)          # [ky,ay,kx,ax,c,o]
        return (wx.transpose(0, 2, 1, 3, 4, 5)      # [ky,kx,ay,ax,c,o]
                .reshape(3, 3, 48, 64))
    return jnp.concatenate(
        [phase(py, px) for py in (0, 1) for px in (0, 1)], -1)


def _stem4(x, w, bn, dtype, eps=1e-5):
    """Full ResNet stem (conv1 7x7/s2 -> frozen-BN -> relu -> maxpool
    3x3/s2/p1) computed in 4x4 phase-split layout: [B, H, W, 3] ->
    [B, H/4, W/4, 64].

    Why: the direct (and 2x2-s2d) stem conv runs ~6% of MXU peak on
    v5e because the tiny input channel dim (3 / 12) lane-pads to 128 —
    a ~10x HBM read amplification (backbone_ablate --stem-detail:
    conv 3.26 ms bs16 640²). The 48-deep phase-split conv cuts the
    pad factor to 2.7x, and the stem maxpool over the virtual 2x-grid
    becomes channel slicing + two shifted max's (rows 2m-1, 2m, 2m+1
    are phase slices (m-1, py=1), (m, py=0), (m, py=1)). Exact modulo
    f32 summation order. Semantics parity: torchvision ResNet conv1/
    maxpool (utilities/resnet.py:146-151)."""
    b, h, ww, c = x.shape
    z = (x.reshape(b, h // 4, 4, ww // 4, 4, c)
         .transpose(0, 1, 3, 2, 4, 5)
         .reshape(b, h // 4, ww // 4, 16 * c))
    w4 = _stem4_kernel(w)
    y4 = jax.lax.conv_general_dilated(
        z.astype(dtype), w4.astype(dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    scale = bn["weight"] / jnp.sqrt(bn["running_var"] + eps)
    shift = bn["bias"] - bn["running_mean"] * scale
    y4 = y4 * jnp.tile(scale, 4).astype(dtype) + jnp.tile(
        shift, 4).astype(dtype)
    y4 = nn.relu(y4)
    # maxpool rows {2m-1, 2m, 2m+1} = phase slices; relu'd values are
    # >= 0 so a 0-pad at the m=0 / n=0 border never wins the max
    # (torch pads with -inf; the window always holds an in-bounds
    # element here).
    g0, g1 = y4[..., :128], y4[..., 128:]
    g1s = jnp.pad(g1[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    rowmax = jnp.maximum(jnp.maximum(g0, g1), g1s)
    c0, c1 = rowmax[..., :64], rowmax[..., 64:]
    c1s = jnp.pad(c1[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0)))
    return jnp.maximum(jnp.maximum(c0, c1), c1s)


class _ConvKernel(nn.Module):
    """Declares nn.Conv's kernel param (same name/shape/init) without
    executing the conv — lets the fused eval path read raw weights
    while keeping the parameter tree identical to the Flax path."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _FrozenBNVars(nn.Module):
    """Declares FrozenBatchNorm's 'frozen' variables without running."""

    features: int

    @nn.compact
    def __call__(self):
        get = lambda name, init: self.variable(  # noqa: E731
            "frozen", name, lambda: init(self.features, jnp.float32)
        ).value
        return {
            "weight": get("weight", jnp.ones),
            "bias": get("bias", jnp.zeros),
            "running_mean": get("running_mean", jnp.zeros),
            "running_var": get("running_var", jnp.ones),
        }


class Bottleneck(nn.Module):
    planes: int
    strides: int = 1
    downsample: bool = False
    norm: str = "frozen"
    dtype: Any = jnp.float32
    expansion: int = 4
    # "auto": fused Pallas block on TPU eval (stride-1, frozen-BN, bf16);
    # "off": always Flax; "interpret": fused via interpret (tests).
    # Default off until each deployment validates the Mosaic compile on
    # its chip (flip via ResNet(fused="auto")).
    fused: str = "off"

    def _fused_eval(self, x):
        from object_detectors_tpu.kernels.fused_block import (
            fold_bn, fused_bottleneck,
        )

        cin = x.shape[-1]
        cm = self.planes
        cout = self.planes * self.expansion
        w1 = _ConvKernel((1, 1, cin, cm), name="conv1")()
        bn1 = _FrozenBNVars(cm, name="bn1")()
        w2 = _ConvKernel((3, 3, cm, cm), name="conv2")()
        bn2 = _FrozenBNVars(cm, name="bn2")()
        w3 = _ConvKernel((1, 1, cm, cout), name="conv3")()
        bn3 = _FrozenBNVars(cout, name="bn3")()
        w1f, b1 = fold_bn(w1[0, 0], bn1, self.dtype)
        w2f, b2 = fold_bn(w2, bn2, self.dtype)
        w3f, b3 = fold_bn(w3[0, 0], bn3, self.dtype)
        wdf = bd = None
        if self.downsample:
            wd = _ConvKernel((1, 1, cin, cout), name="down_conv")()
            bnd = _FrozenBNVars(cout, name="down_bn")()
            wdf, bd = fold_bn(wd[0, 0], bnd, self.dtype)
        return fused_bottleneck(x.astype(self.dtype), w1f, b1, w2f, b2,
                                w3f, b3, wdf, bd, tr=8,
                                interpret=self.fused == "interpret")

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_fused = (
            self.fused != "off" and not train and self.strides == 1
            and self.norm == "frozen" and self.dtype == jnp.bfloat16
            and x.shape[1] % 2 == 0
            and (self.fused == "interpret"
                 or jax.devices()[0].platform == "tpu"))
        if use_fused:
            return self._fused_eval(x)
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv1")(x)
        out = _norm(self.planes, self.norm, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.strides,) * 2,
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv2")(out)
        out = _norm(self.planes, self.norm, self.dtype, "bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv3")(out)
        out = _norm(self.planes * self.expansion, self.norm, self.dtype,
                    "bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name="down_conv")(x)
            identity = _norm(self.planes * self.expansion, self.norm,
                             self.dtype, "down_bn")(identity)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    planes: int
    strides: int = 1
    downsample: bool = False
    norm: str = "frozen"
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.strides,) * 2,
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv1")(x)
        out = _norm(self.planes, self.norm, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv2")(out)
        out = _norm(self.planes, self.norm, self.dtype, "bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name="down_conv")(x)
            identity = _norm(self.planes, self.norm, self.dtype,
                             "down_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """layers e.g. (3,4,6,3)=resnet50 bottleneck; block='basic' for 18/34."""

    layers: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"
    norm: str = "frozen"
    dtype: Any = jnp.float32
    fused: str = "off"  # fused eval bottleneck kernel (see Bottleneck)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.block == "bottleneck":
            block_cls = partial(Bottleneck, fused=self.fused)
            expansion = 4
        else:
            block_cls = BasicBlock
            expansion = 1

        if (self.norm == "frozen" and x.shape[1] % 4 == 0
                and x.shape[2] % 4 == 0):
            # 4x4 phase-split stem (see _stem4): same params as the
            # conv1/bn1 modules below, whole stem incl. maxpool in
            # phase layout.
            w = _ConvKernel((7, 7, 3, 64), name="conv1")()
            bn = _FrozenBNVars(64, name="bn1")()
            x = _stem4(x, w, bn, self.dtype)
        else:
            x = SpaceToDepthStem(dtype=self.dtype, name="conv1")(x)
            x = _norm(64, self.norm, self.dtype, "bn1")(x)
            x = nn.relu(x)
            # plain reduce_window maxpool: the backbone_ablate stem
            # detail (v5e, bs16 640²) measured it at +0.84 ms vs
            # +2.63 ms for the phase-decomposed variant
            # (models/common.max_pool_3x3_s2).
            x = max_pool_same(x, 3, 2)

        feats = []
        planes = 64
        for stage, blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            x = block_cls(planes, stride, downsample=True, norm=self.norm,
                          dtype=self.dtype,
                          name=f"layer{stage+1}_block0")(x, train)
            for i in range(1, blocks):
                x = block_cls(planes, 1, norm=self.norm, dtype=self.dtype,
                              name=f"layer{stage+1}_block{i}")(x, train)
            feats.append(x)
            planes *= 2
        return tuple(feats)  # C2, C3, C4, C5

    @property
    def out_channels(self):
        e = 4 if self.block == "bottleneck" else 1
        return tuple(64 * e * (2**i) for i in range(len(self.layers)))


def resnet50(norm="frozen", dtype=jnp.float32) -> ResNet:
    return ResNet((3, 4, 6, 3), "bottleneck", norm, dtype)


def resnet18(norm="frozen", dtype=jnp.float32) -> ResNet:
    return ResNet((2, 2, 2, 2), "basic", norm, dtype)


class BackboneWithFPN(nn.Module):
    """ResNet -> FPN over returned_layers (backbone_utils.py:15-50).

    extra_blocks: "pool" (Faster/Mask R-CNN) or "p6p7" (RetinaNet, fed
    from C5 per retinanet.py:634-635). returned_layers defaults to all of
    C2..C5 ("pool") or C3..C5 ("p6p7")."""

    resnet: ResNet
    out_channels: int = 256
    extra_blocks: str = "pool"
    returned_layers: Sequence[int] | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self.resnet(x, train)
        returned = self.returned_layers or (
            (1, 2, 3, 4) if self.extra_blocks == "pool" else (2, 3, 4))
        selected = [feats[i - 1] for i in returned]
        return FeaturePyramidNetwork(
            self.out_channels, extra_blocks=self.extra_blocks,
            dtype=self.resnet.dtype, name="fpn",
        )(selected, c5=feats[-1])


def trainable_mask(params, trainable_layers: int = 3):
    """optax mask pytree: True where gradients flow. torchvision freezes
    the first (5 - trainable_layers) of [layer4, layer3, layer2, layer1,
    conv1] and appends bn1 at trainable_layers==5
    (backbone_utils.py:84-94)."""
    layers_to_train = ["layer4", "layer3", "layer2", "layer1",
                       "conv1"][:trainable_layers]
    if trainable_layers == 5:
        layers_to_train.append("bn1")
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_trainable(path):
        keys = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(str(k) for k in keys)
        if "backbone" not in joined and "resnet" not in joined:
            return True
        return any(l in joined for l in layers_to_train)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: is_trainable(path), params)
