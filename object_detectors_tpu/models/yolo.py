"""YOLOv3 detector graph in Flax (NHWC): Darknet backbone -> optional
SPP/FPN neck -> three detection branches.

Architecture parity with `yolo/nets/yolohead.py:14-88` (embedding branches:
five alternating 1x1/3x3 CBLs + 1x1 conv_out, lateral 1x1+upsample+concat
between scales), `yolo/nets/yoloneck.py:13-54` and the SPP/FPN wrappers in
`yolo/utilities/custom.py:267-328`.

Outputs: three raw maps, NHWC ``[B, H_s, W_s, A*(5+C)]`` for strides
(32, 16, 8) — the flattened (h, w, a) prior ordering matches the reference's
``view(bs, A, attrs, H, W).permute(0, 3, 4, 1, 2)`` layout
(yolo/nets/yolo_forw.py:103-105), so decode/criterion indexing is identical.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from object_detectors_tpu.models.common import ConvBN, max_pool_same, upsample_nearest_2x
from object_detectors_tpu.models.darknet import DarkNet
from object_detectors_tpu.models.fpn import FeaturePyramidNetwork


class SPP(nn.Module):
    """Spatial pyramid pooling over each scale: concat of maxpools with the
    configured kernel pyramid + the identity, then a 1x1 bottleneck back to
    the native width (custom.py:287-328; bottleneck=True path)."""

    pyramids: Sequence[Sequence[int]]  # per scale (coarse->fine), e.g. [[5,9,13]]*3
    bottleneck: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        # feats ordered coarse->fine: (x0=1024ch, x1=512ch, x2=256ch)
        outs = []
        for k, x in enumerate(feats):
            pools = [max_pool_same(x, w) for w in self.pyramids[k]]
            cat = jnp.concatenate([x] + pools, axis=-1)
            if self.bottleneck or k == 0:
                x = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"bottleneck{k}")(cat)
            else:
                x = cat
            outs.append(x)
        return tuple(outs)


class YoloNeck(nn.Module):
    """Optional SPP and/or FPN fusion, config-gated (yoloneck.py:13-54).

    The reference FPN path runs two FeaturePyramidNetworks and fuses by
    concatenation; we keep the simpler documented intent — a single FPN pass
    whose outputs replace the finer scales — which preserves channel widths
    expected by the head.
    """

    use_spp: bool = False
    use_fpn: bool = False
    pyramids: Sequence[Sequence[int]] = ((5, 9, 13),) * 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        x0, x1, x2 = feats  # coarse (1024) -> fine (256)
        if self.use_spp:
            x0, x1, x2 = SPP(self.pyramids, dtype=self.dtype,
                             name="spp")((x0, x1, x2))
        if self.use_fpn:
            # FPN over (fine->coarse); keep native widths per scale via
            # per-scale output convs so head channel plan is unchanged.
            fine_outs = FeaturePyramidNetwork(
                out_channels=256, dtype=self.dtype, name="fpn"
            )([x2, x1, x0])
            x2 = fine_outs[0]
            x1 = jnp.concatenate([x1, fine_outs[1]], axis=-1)
            x1 = nn.Conv(512, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="fpn_proj1")(x1)
        return x0, x1, x2


class DetectionBranch(nn.Module):
    """The 'embedding' stack: 5 alternating CBLs + final 1x1 conv_out.
    Returns (raw_out, branch_feature_after_5th_cbl)."""

    mid: int       # filters_list[0] (1x1 width)
    wide: int      # filters_list[1] (3x3 width)
    out_features: int
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        plan = [(self.mid, 1), (self.wide, 3), (self.mid, 1),
                (self.wide, 3), (self.mid, 1)]
        for i, (f, k) in enumerate(plan):
            x = ConvBN(f, k, dtype=self.dtype,
                       bn_axis_name=self.bn_axis_name, name=f"cbl{i}")(x, train)
        branch = x
        x = ConvBN(self.wide, 3, dtype=self.dtype,
                   bn_axis_name=self.bn_axis_name, name="cbl5")(x, train)
        out = nn.Conv(self.out_features, (1, 1), use_bias=True,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv_out")(x)
        return out, branch


class YoloHead(nn.Module):
    """Full YOLOv3 graph. ``anchors_per_scale`` is A (3 for COCO, 9 for the
    LVIS k-means config); output channels per scale = A * (5 + num_classes)."""

    num_classes: int = 80
    anchors_per_scale: int = 3
    backbone_layers: Sequence[int] = (1, 2, 8, 8, 4)  # darknet53
    use_spp: bool = False
    use_fpn: bool = False
    pyramids: Sequence[Sequence[int]] = ((5, 9, 13),) * 3
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.anchors_per_scale
        out_f = a * (5 + self.num_classes)

        c3, c4, c5 = DarkNet(self.backbone_layers, dtype=self.dtype,
                             bn_axis_name=self.bn_axis_name,
                             name="backbone")(x, train)
        x0, x1, x2 = YoloNeck(self.use_spp, self.use_fpn, self.pyramids,
                              dtype=self.dtype, name="neck")((c5, c4, c3))

        out0, branch0 = DetectionBranch(
            512, 1024, out_f, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name, name="embedding0")(x0, train)

        lat1 = ConvBN(256, 1, dtype=self.dtype,
                      bn_axis_name=self.bn_axis_name,
                      name="lateral1")(branch0, train)
        x1_in = jnp.concatenate([upsample_nearest_2x(lat1), x1], axis=-1)
        out1, branch1 = DetectionBranch(
            256, 512, out_f, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name, name="embedding1")(x1_in, train)

        lat2 = ConvBN(128, 1, dtype=self.dtype,
                      bn_axis_name=self.bn_axis_name,
                      name="lateral2")(branch1, train)
        x2_in = jnp.concatenate([upsample_nearest_2x(lat2), x2], axis=-1)
        out2, _ = DetectionBranch(
            128, 256, out_f, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name, name="embedding2")(x2_in, train)

        # (stride 32, stride 16, stride 8) raw maps
        return out0, out1, out2
