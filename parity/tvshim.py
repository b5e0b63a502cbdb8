"""Minimal pure-torch `torchvision` shim for running the REFERENCE's
model code on CPU (numerical-parity harness only — never used by the
framework's own compute path).

The image has no torchvision wheel; the reference depends on a small set
of its ops (`/root/reference/torchvision_models/tvision/*` imports:
nms/batched_nms/box_iou/clip/remove_small, roi_align/MultiScaleRoIAlign,
sigmoid_focal_loss, FeaturePyramidNetwork, FrozenBatchNorm2d). These are
reimplemented here from their public specifications in plain torch so
`import tvision.frcnn` works and the reference graphs execute eagerly.

Call :func:`install` BEFORE importing any reference module.
"""

from __future__ import annotations

import math
import sys
import types

import torch
from torch import nn
import torch.nn.functional as F


# --------------------------------------------------------------------- #
# box ops (torchvision.ops.boxes)
# --------------------------------------------------------------------- #

def box_area(boxes):
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])


def box_iou(boxes1, boxes2):
    a1 = box_area(boxes1)
    a2 = box_area(boxes2)
    lt = torch.max(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = torch.min(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (a1[:, None] + a2[None, :] - inter)


def nms(boxes, scores, iou_threshold):
    """Exact greedy NMS (CUDA kernel semantics: suppress iou > thr)."""
    if boxes.numel() == 0:
        return torch.empty(0, dtype=torch.int64)
    order = torch.argsort(scores, descending=True, stable=True)
    b = boxes[order]
    n = b.shape[0]
    alive = torch.ones(n, dtype=torch.bool)
    keep = []
    for i in range(n):
        if not alive[i]:
            continue
        keep.append(int(order[i]))
        if i + 1 < n:
            iou = box_iou(b[i:i + 1], b[i + 1:])[0]
            alive[i + 1:] &= iou <= iou_threshold
    return torch.as_tensor(keep, dtype=torch.int64)


def batched_nms(boxes, scores, idxs, iou_threshold):
    """Category-offset trick (torchvision batched_nms)."""
    if boxes.numel() == 0:
        return torch.empty(0, dtype=torch.int64)
    max_coord = boxes.max()
    offsets = idxs.to(boxes) * (max_coord + torch.tensor(1.0).to(boxes))
    return nms(boxes + offsets[:, None], scores, iou_threshold)


def clip_boxes_to_image(boxes, size):
    h, w = size
    boxes = boxes.clone()
    boxes[..., 0::2] = boxes[..., 0::2].clamp(min=0, max=w)
    boxes[..., 1::2] = boxes[..., 1::2].clamp(min=0, max=h)
    return boxes


def remove_small_boxes(boxes, min_size):
    ws = boxes[:, 2] - boxes[:, 0]
    hs = boxes[:, 3] - boxes[:, 1]
    keep = (ws >= min_size) & (hs >= min_size)
    return torch.where(keep)[0]


# --------------------------------------------------------------------- #
# roi_align (aligned=False legacy semantics, adaptive sampling_ratio)
# --------------------------------------------------------------------- #

def _bilinear(feat, y, x):
    """feat [C, H, W]; y/x [...]: torchvision bilinear_interpolate —
    zero outside [-1, H]x[-1, W], clamp negatives to 0."""
    c, h, w = feat.shape
    outside = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = y.clamp(0, h - 1)
    x = x.clamp(0, w - 1)
    y0 = y.floor().long()
    x0 = x.floor().long()
    y1 = (y0 + 1).clamp(max=h - 1)
    x1 = (x0 + 1).clamp(max=w - 1)
    ly = (y - y0).unsqueeze(0)
    lx = (x - x0).unsqueeze(0)
    v00 = feat[:, y0, x0]
    v01 = feat[:, y0, x1]
    v10 = feat[:, y1, x0]
    v11 = feat[:, y1, x1]
    out = ((1 - ly) * (1 - lx) * v00 + (1 - ly) * lx * v01
           + ly * (1 - lx) * v10 + ly * lx * v11)
    return out.masked_fill(outside.unsqueeze(0), 0.0)


def roi_align(input, boxes, output_size, spatial_scale=1.0,
              sampling_ratio=-1, aligned=False):
    """input [N, C, H, W]; boxes [K, 5] (batch_idx, x1, y1, x2, y2) or a
    list of per-image [Ki, 4]. Returns [K, C, oh, ow]."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    if isinstance(boxes, (list, tuple)):
        rois = torch.cat([
            torch.cat([torch.full((len(b), 1), i, dtype=b.dtype), b], 1)
            for i, b in enumerate(boxes)], 0)
    else:
        rois = boxes
    oh, ow = output_size
    k = rois.shape[0]
    c = input.shape[1]
    out = torch.zeros(k, c, oh, ow, dtype=input.dtype)
    offset = 0.5 if aligned else 0.0
    for r in range(k):
        bi = int(rois[r, 0])
        x1 = rois[r, 1] * spatial_scale - offset
        y1 = rois[r, 2] * spatial_scale - offset
        x2 = rois[r, 3] * spatial_scale - offset
        y2 = rois[r, 4] * spatial_scale - offset
        roi_w = x2 - x1
        roi_h = y2 - y1
        if not aligned:
            roi_w = roi_w.clamp(min=1.0)
            roi_h = roi_h.clamp(min=1.0)
        bin_h = roi_h / oh
        bin_w = roi_w / ow
        gh = sampling_ratio if sampling_ratio > 0 else \
            max(int(torch.ceil(roi_h / oh)), 1)
        gw = sampling_ratio if sampling_ratio > 0 else \
            max(int(torch.ceil(roi_w / ow)), 1)
        iy = torch.arange(oh, dtype=input.dtype)
        ix = torch.arange(ow, dtype=input.dtype)
        sy = (torch.arange(gh, dtype=input.dtype) + 0.5) / gh
        sx = (torch.arange(gw, dtype=input.dtype) + 0.5) / gw
        ys = y1 + (iy[:, None] + sy[None, :]) * bin_h   # [oh, gh]
        xs = x1 + (ix[:, None] + sx[None, :]) * bin_w   # [ow, gw]
        yg = ys[:, None, :, None].expand(oh, ow, gh, gw)
        xg = xs[None, :, None, :].expand(oh, ow, gh, gw)
        samples = _bilinear(input[bi], yg, xg)          # [C, oh, ow, gh, gw]
        out[r] = samples.mean(dim=(-1, -2))
    return out


class MultiScaleRoIAlign(nn.Module):
    """torchvision MultiScaleRoIAlign: infer 2^round(log2) scales, FPN
    LevelMapper k0=4/canonical 224, per-level roi_align."""

    def __init__(self, featmap_names, output_size, sampling_ratio):
        super().__init__()
        self.featmap_names = featmap_names
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        self.output_size = output_size
        self.sampling_ratio = sampling_ratio

    def forward(self, x, boxes, image_shapes):
        feats = [v for k, v in x.items() if k in self.featmap_names]
        rois = torch.cat([
            torch.cat([torch.full((len(b), 1), i, dtype=b.dtype), b], 1)
            for i, b in enumerate(boxes)], 0)
        orig_h = max(s[0] for s in image_shapes)
        orig_w = max(s[1] for s in image_shapes)
        scales = []
        for f in feats:
            sy = 2.0 ** float(torch.tensor(
                f.shape[-2] / orig_h).log2().round())
            sx = 2.0 ** float(torch.tensor(
                f.shape[-1] / orig_w).log2().round())
            assert sy == sx
            scales.append(sy)
        if len(feats) == 1:
            return roi_align(feats[0], rois, self.output_size,
                             scales[0], self.sampling_ratio)
        lvl_min = -int(math.log2(scales[0]))
        lvl_max = -int(math.log2(scales[-1]))
        area = box_area(rois[:, 1:])
        k = torch.floor(4 + torch.log2(torch.sqrt(area) / 224 + 1e-6))
        levels = (k.clamp(min=lvl_min, max=lvl_max) - lvl_min).long()
        c = feats[0].shape[1]
        out = torch.zeros(rois.shape[0], c, *self.output_size,
                          dtype=feats[0].dtype)
        for lvl, (f, sc) in enumerate(zip(feats, scales)):
            idx = torch.where(levels == lvl)[0]
            if idx.numel():
                out[idx] = roi_align(f, rois[idx], self.output_size, sc,
                                     self.sampling_ratio)
        return out


# --------------------------------------------------------------------- #
# losses / misc / FPN
# --------------------------------------------------------------------- #

def sigmoid_focal_loss(inputs, targets, alpha=0.25, gamma=2,
                       reduction="none"):
    p = torch.sigmoid(inputs)
    ce = F.binary_cross_entropy_with_logits(inputs, targets,
                                            reduction="none")
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


class FrozenBatchNorm2d(nn.Module):
    def __init__(self, num_features, eps=0.0):
        super().__init__()
        self.eps = eps
        self.register_buffer("weight", torch.ones(num_features))
        self.register_buffer("bias", torch.zeros(num_features))
        self.register_buffer("running_mean", torch.zeros(num_features))
        self.register_buffer("running_var", torch.ones(num_features))

    def _load_from_state_dict(self, state_dict, prefix, *args, **kw):
        state_dict.pop(prefix + "num_batches_tracked", None)
        super()._load_from_state_dict(state_dict, prefix, *args, **kw)

    def forward(self, x):
        w = self.weight.reshape(1, -1, 1, 1)
        b = self.bias.reshape(1, -1, 1, 1)
        rm = self.running_mean.reshape(1, -1, 1, 1)
        rv = self.running_var.reshape(1, -1, 1, 1)
        scale = w * (rv + self.eps).rsqrt()
        return x * scale + (b - rm * scale)


class LastLevelMaxPool(nn.Module):
    def forward(self, x, y, names):
        names.append("pool")
        x.append(F.max_pool2d(x[-1], 1, 2, 0))
        return x, names


class LastLevelP6P7(nn.Module):
    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.p6 = nn.Conv2d(in_channels, out_channels, 3, 2, 1)
        self.p7 = nn.Conv2d(out_channels, out_channels, 3, 2, 1)
        for m in (self.p6, self.p7):
            nn.init.kaiming_uniform_(m.weight, a=1)
            nn.init.constant_(m.bias, 0)
        self.use_P5 = in_channels == out_channels

    def forward(self, p, c, names):
        p5, c5 = p[-1], c[-1]
        x = p5 if self.use_P5 else c5
        p6 = self.p6(x)
        p7 = self.p7(F.relu(p6))
        p.extend([p6, p7])
        names.extend(["p6", "p7"])
        return p, names


class FeaturePyramidNetwork(nn.Module):
    """torchvision FPN: 1x1 inner convs + 3x3 layer convs, top-down
    nearest-neighbor upsample, optional extra blocks."""

    def __init__(self, in_channels_list, out_channels, extra_blocks=None):
        super().__init__()
        self.inner_blocks = nn.ModuleList()
        self.layer_blocks = nn.ModuleList()
        for in_channels in in_channels_list:
            self.inner_blocks.append(
                nn.Conv2d(in_channels, out_channels, 1))
            self.layer_blocks.append(
                nn.Conv2d(out_channels, out_channels, 3, padding=1))
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_uniform_(m.weight, a=1)
                nn.init.constant_(m.bias, 0)
        self.extra_blocks = extra_blocks

    def forward(self, x):
        names = list(x.keys())
        feats = list(x.values())
        last_inner = self.inner_blocks[-1](feats[-1])
        results = [self.layer_blocks[-1](last_inner)]
        for idx in range(len(feats) - 2, -1, -1):
            inner = self.inner_blocks[idx](feats[idx])
            top_down = F.interpolate(last_inner, size=inner.shape[-2:],
                                     mode="nearest")
            last_inner = inner + top_down
            results.insert(0, self.layer_blocks[idx](last_inner))
        if self.extra_blocks is not None:
            if isinstance(self.extra_blocks, LastLevelP6P7):
                results, names = self.extra_blocks(results, feats, names)
            else:
                results, names = self.extra_blocks(results, feats[-1:]
                                                   and results, names)
        from collections import OrderedDict

        return OrderedDict(zip(names, results))


# --------------------------------------------------------------------- #
# VGG16 (for ssd300_vgg16) — standard cfg-D features
# --------------------------------------------------------------------- #

_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]


class VGG(nn.Module):
    def __init__(self):
        super().__init__()
        layers = []
        c_in = 3
        for v in _VGG16_CFG:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(c_in, v, 3, padding=1))
                layers.append(nn.ReLU(inplace=True))
                c_in = v
        self.features = nn.Sequential(*layers)


def vgg16(pretrained=False, progress=True, **kwargs):
    assert not pretrained, "no pretrained weights in this image"
    return VGG()


# --------------------------------------------------------------------- #
# module assembly
# --------------------------------------------------------------------- #

def install(reference_root="/root/reference/torchvision_models"):
    """Register the fake `torchvision` package tree in sys.modules and
    put the reference's `tvision`/`utilities`/`detection` namespace
    packages on sys.path. Returns the torchvision module object."""
    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)

    tv = types.ModuleType("torchvision")
    tv._is_tracing = lambda: False

    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")
    for name in ("box_area", "box_iou", "nms", "batched_nms",
                 "clip_boxes_to_image", "remove_small_boxes"):
        setattr(boxes_mod, name, globals()[name])
        setattr(ops, name, globals()[name])
    ops.boxes = boxes_mod
    ops.roi_align = roi_align
    ops.MultiScaleRoIAlign = MultiScaleRoIAlign
    ops.sigmoid_focal_loss = sigmoid_focal_loss
    ops.FeaturePyramidNetwork = FeaturePyramidNetwork

    misc_mod = types.ModuleType("torchvision.ops.misc")
    misc_mod.FrozenBatchNorm2d = FrozenBatchNorm2d
    misc_mod.Conv2d = nn.Conv2d
    misc_mod.interpolate = F.interpolate
    ops.misc = misc_mod

    fpn_mod = types.ModuleType("torchvision.ops.feature_pyramid_network")
    fpn_mod.FeaturePyramidNetwork = FeaturePyramidNetwork
    fpn_mod.LastLevelMaxPool = LastLevelMaxPool
    fpn_mod.LastLevelP6P7 = LastLevelP6P7
    ops.feature_pyramid_network = fpn_mod

    models = types.ModuleType("torchvision.models")
    vgg_mod = types.ModuleType("torchvision.models.vgg")
    vgg_mod.vgg16 = vgg16
    vgg_mod.VGG = VGG
    models.vgg = vgg_mod
    detection = types.ModuleType("torchvision.models.detection")
    models.detection = detection

    tv.ops = ops
    tv.models = models

    mods = {
        "torchvision": tv,
        "torchvision.ops": ops,
        "torchvision.ops.boxes": boxes_mod,
        "torchvision.ops.misc": misc_mod,
        "torchvision.ops.feature_pyramid_network": fpn_mod,
        "torchvision.models": models,
        "torchvision.models.vgg": vgg_mod,
        "torchvision.models.detection": detection,
    }
    sys.modules.update(mods)

    # torchvision.models.detection._utils: alias the reference's own
    # vendored copy (tvision/_utils.py) — runs the reference's code, no
    # code is copied into this repo.
    import importlib

    det_utils = importlib.import_module("tvision._utils")
    detection._utils = det_utils
    sys.modules["torchvision.models.detection._utils"] = det_utils
    _stub_missing()
    return tv


def _stub_missing():
    """Import-time stubs for packages the reference's modules import at
    module scope but that this image lacks (pycocotools/lvis/sklearn/
    tqdm/imgaug). Only the names, never functionality — any actual call
    raises, which keeps the parity harness honest."""

    def stub(name, **attrs):
        try:
            __import__(name.split(".")[0])
            return
        except ImportError:
            pass
        parts = name.split(".")
        for i in range(1, len(parts) + 1):
            mod_name = ".".join(parts[:i])
            if mod_name not in sys.modules:
                sys.modules[mod_name] = types.ModuleType(mod_name)
            if i > 1:
                setattr(sys.modules[".".join(parts[:i - 1])],
                        parts[i - 1], sys.modules[mod_name])
        for k, v in attrs.items():
            setattr(sys.modules[name], k, v)

    class _Unavailable:
        def __init__(self, *a, **kw):
            raise RuntimeError("stubbed dependency called in parity run")

    stub("pycocotools.coco", COCO=_Unavailable)
    stub("lvis", LVIS=_Unavailable, LVISEval=_Unavailable)
    stub("sklearn.feature_extraction.text",
         TfidfTransformer=_Unavailable)
    stub("sklearn.cluster", KMeans=_Unavailable)
    stub("tqdm", tqdm=lambda x, *a, **kw: x)
    stub("imgaug.augmenters", OneOf=_Unavailable,
         Sequential=_Unavailable)
