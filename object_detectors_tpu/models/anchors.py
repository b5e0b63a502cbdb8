"""Anchor generation (host-side, numpy -> constants folded into jit).

Semantics of `torchvision_models/tvision/anchor_utils.py`:
* AnchorGenerator (:36-159): zero-centered cell anchors per level from
  sizes x aspect_ratios (aspect = h/w, rounded), shifted over the grid by
  integer strides (image_size // grid_size); concatenated per level.
* DefaultBoxGenerator (:160-278): SSD default boxes from per-level scale
  interpolation and wh pairs, normalized cx/cy grid then scaled to pixels.

TPU design: anchors depend only on (image_size, grid_sizes) which are
static under jit — so these are pure numpy functions whose outputs embed
as constants in the compiled program. No cache keying / device movement.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np


def cell_anchors(scales: Sequence[float],
                 aspect_ratios: Sequence[float]) -> np.ndarray:
    """Zero-centered [len(ar)*len(scales), 4] xyxy anchors, rounded
    (anchor_utils.py:60-72). aspect ratio = h/w."""
    scales = np.asarray(scales, np.float32)
    ar = np.asarray(aspect_ratios, np.float32)
    h_ratios = np.sqrt(ar)
    w_ratios = 1.0 / h_ratios
    ws = (w_ratios[:, None] * scales[None, :]).reshape(-1)
    hs = (h_ratios[:, None] * scales[None, :]).reshape(-1)
    return np.round(np.stack([-ws, -hs, ws, hs], axis=1) / 2.0)


def grid_anchors(
    image_size: tuple[int, int],
    grid_sizes: Sequence[tuple[int, int]],
    sizes: Sequence[Sequence[float]],
    aspect_ratios: Sequence[Sequence[float]],
) -> np.ndarray:
    """All anchors for one resolution, concatenated over levels:
    [sum_l H_l*W_l*A_l, 4] xyxy pixels (anchor_utils.py:98-159).

    Grid shift order is (y, x) row-major with per-cell anchors innermost —
    matching the reference's meshgrid + reshape.
    """
    out = []
    for (gh, gw), s, ar in zip(grid_sizes, sizes, aspect_ratios):
        base = cell_anchors(s, ar)  # [A, 4]
        stride_h = image_size[0] // gh
        stride_w = image_size[1] // gw
        shifts_x = np.arange(gw, dtype=np.float32) * stride_w
        shifts_y = np.arange(gh, dtype=np.float32) * stride_h
        sy, sx = np.meshgrid(shifts_y, shifts_x, indexing="ij")
        shifts = np.stack(
            [sx.reshape(-1), sy.reshape(-1), sx.reshape(-1), sy.reshape(-1)],
            axis=1)
        out.append(
            (shifts[:, None, :] + base[None, :, :]).reshape(-1, 4))
    return np.concatenate(out, axis=0).astype(np.float32)


def fpn_grid_sizes(image_size: tuple[int, int],
                   num_levels: int = 5) -> list[tuple[int, int]]:
    """Per-level feature (H_l, W_l) for the ResNet-FPN pyramid starting
    at stride 8 (RetinaNet P3..P7), as the conv chain ACTUALLY computes
    them: every stride-2 op in the backbone and the P6/P7 extra blocks
    is a pad-SAME halving, out = ceil(in / 2).

    NOT ``image_size // stride``: at e.g. 320 the P7 feature is 3x3
    (ceil chain 320->160->80->40->20->10->5->3) while 320 // 128 = 2 —
    a floor-grid anchor table is then 45 rows short of the head's
    level_sizes and every P7 anchor row is wrong. torchvision reads
    grid sizes off the actual feature maps (anchor_utils.py:125); this
    reproduces them arithmetically. grid_anchors' strides stay
    image_size // grid (torchvision's rule) on these grids."""
    h, w = image_size
    for _ in range(3):
        h, w = -(-h // 2), -(-w // 2)
    out = []
    for _ in range(num_levels):
        out.append((h, w))
        h, w = -(-h // 2), -(-w // 2)
    return out


# Standard level configs
def rpn_anchor_config():
    """Faster/Mask R-CNN FPN RPN: one size per level x 3 aspect ratios
    (frcnn.py:302-320)."""
    sizes = ((32,), (64,), (128,), (256,), (512,))
    aspect_ratios = ((0.5, 1.0, 2.0),) * 5
    return sizes, aspect_ratios


def retinanet_anchor_config():
    """RetinaNet: 3 octave scales per level x 3 ARs
    (retinanet.py:629-633)."""
    sizes = tuple(
        tuple(int(x * 2 ** (i / 3)) for i in range(3))
        for x in [32, 64, 128, 256, 512]
    )
    aspect_ratios = ((0.5, 1.0, 2.0),) * 5
    return sizes, aspect_ratios


def ssd_default_boxes(
    image_size: tuple[int, int],
    grid_sizes: Sequence[tuple[int, int]],
    aspect_ratios: Sequence[Sequence[int]] = ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,)),
    scales: Sequence[float] | None = (0.07, 0.15, 0.33, 0.51, 0.69,
                                      0.87, 1.05),
    steps: Sequence[int] | None = (8, 16, 32, 64, 100, 300),
    min_ratio: float = 0.15,
    max_ratio: float = 0.9,
    clip: bool = True,
) -> np.ndarray:
    """SSD default boxes in xyxy pixels [sum_l H*W*A_l, 4]
    (anchor_utils.py:160-278). Defaults are the ssd300_vgg16 config
    INCLUDING its explicit scales (ssd.py:601-603) — scales=None falls
    back to the generic min/max-ratio interpolation
    (anchor_utils.py:186-195)."""
    k_levels = len(aspect_ratios)
    if scales is None:
        if k_levels > 1:
            rr = max_ratio - min_ratio
            scales = [min_ratio + rr * k / (k_levels - 1.0)
                      for k in range(k_levels)] + [1.0]
        else:
            scales = [min_ratio, max_ratio]

    wh_pairs_per_level = []
    for k in range(k_levels):
        s_k = scales[k]
        s_prime = math.sqrt(scales[k] * scales[k + 1])
        pairs = [[s_k, s_k], [s_prime, s_prime]]
        for ar in aspect_ratios[k]:
            sq = math.sqrt(ar)
            pairs.extend([[s_k * sq, s_k / sq], [s_k / sq, s_k * sq]])
        wh_pairs_per_level.append(np.asarray(pairs, np.float32))

    boxes = []
    for k, (gh, gw) in enumerate(grid_sizes):
        if steps is not None:
            x_f = image_size[1] / steps[k]
            y_f = image_size[0] / steps[k]
        else:
            y_f, x_f = float(gh), float(gw)
        shifts_x = (np.arange(gw, dtype=np.float32) + 0.5) / x_f
        shifts_y = (np.arange(gh, dtype=np.float32) + 0.5) / y_f
        sy, sx = np.meshgrid(shifts_y, shifts_x, indexing="ij")
        centers = np.stack([sx.reshape(-1), sy.reshape(-1)], 1)  # [HW, 2]
        wh = wh_pairs_per_level[k]
        if clip:
            wh = np.clip(wh, 0, 1)
        a = wh.shape[0]
        cxy = np.repeat(centers, a, axis=0)          # [HW*A, 2]
        whr = np.tile(wh, (gh * gw, 1))              # [HW*A, 2]
        cxywh = np.concatenate([cxy, whr], axis=1)
        xyxy = np.concatenate(
            [cxywh[:, :2] - 0.5 * cxywh[:, 2:],
             cxywh[:, :2] + 0.5 * cxywh[:, 2:]], axis=1)
        xyxy[:, 0::2] *= image_size[1]
        xyxy[:, 1::2] *= image_size[0]
        boxes.append(xyxy)
    return np.concatenate(boxes, axis=0).astype(np.float32)
