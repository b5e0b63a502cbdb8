"""Box geometry ops: coordinate conversions, IoU family, BoxCoder, filters.

Numerical semantics follow the reference implementation
(`yolo/utilities/helper.py:221-277` for the IoU family with its 1e-16
stabilizers and stop-gradient CIoU alpha; `torchvision_models/tvision/
_utils.py:79-223` for BoxCoder encode/decode with weights and exp-clip;
`torchvision_models/tvision/boxes` usage for clip/small-box filters), but the
implementation is fully vectorized JAX with arbitrary leading batch dims —
no Python loops, no dynamic shapes.

Conventions:
* ``xyxy``: [x1, y1, x2, y2] absolute corners.
* ``cxcywh``: [cx, cy, w, h] center format (the YOLO native format).
* All functions broadcast over leading dimensions.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

EPS = 1e-16

# IoU variant selector, matching the reference's integer iou_type codes
# (yolo/utilities/helper.py:224-232): 0=IoU, 1=GIoU, 2=DIoU, 3=CIoU.
IOU, GIOU, DIOU, CIOU = 0, 1, 2, 3


def cxcywh_to_xyxy(box: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] center format -> corner format."""
    cx, cy, w, h = jnp.split(box, 4, axis=-1)
    half_w, half_h = w * 0.5, h * 0.5
    return jnp.concatenate(
        [cx - half_w, cy - half_h, cx + half_w, cy + half_h], axis=-1
    )


def xyxy_to_cxcywh(box: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] corner format -> center format."""
    x1, y1, x2, y2 = jnp.split(box, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )


def xywh_to_xyxy(box: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] COCO [x, y, w, h] (top-left + size) -> corners."""
    x, y, w, h = jnp.split(box, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def xyxy_to_xywh(box: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(box, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def area(box_xyxy: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] -> [...] area (no clamping; degenerate boxes give <=0)."""
    return (box_xyxy[..., 2] - box_xyxy[..., 0]) * (
        box_xyxy[..., 3] - box_xyxy[..., 1]
    )


@partial(jax.jit, static_argnames=("iou_type", "fmt"))
def box_iou(
    box1: jnp.ndarray,
    box2: jnp.ndarray,
    iou_type: int = IOU,
    fmt: str = "cxcywh",
) -> jnp.ndarray:
    """Broadcasting IoU / GIoU / DIoU / CIoU between box arrays.

    Mirrors reference `helper.bbox_iou` (yolo/utilities/helper.py:221-277):
    union gets a +1e-16 on the first area, GIoU/DIoU/CIoU follow the
    published formulas, and the CIoU aspect-ratio tradeoff ``alpha`` is
    computed under stop_gradient.

    Args:
      box1, box2: [..., 4] arrays broadcastable against each other.
      iou_type: one of IOU/GIOU/DIOU/CIOU.
      fmt: "cxcywh" (reference default xcycwh=True) or "xyxy".

    Returns:
      [...] broadcast IoU values.
    """
    if fmt == "cxcywh":
        b1 = cxcywh_to_xyxy(box1)
        b2 = cxcywh_to_xyxy(box2)
    else:
        b1, b2 = box1, box2

    b1_x1, b1_y1, b1_x2, b1_y2 = (b1[..., i] for i in range(4))
    b2_x1, b2_y1, b2_x2, b2_y2 = (b2[..., i] for i in range(4))

    inter_w = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0)
    inter_h = jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0)
    inter = inter_w * inter_h

    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1
    union = (w1 * h1 + EPS) + w2 * h2 - inter
    iou = inter / union

    if iou_type == IOU:
        return iou

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    if iou_type == GIOU:
        c_area = cw * ch + EPS
        return iou - (c_area - union) / c_area

    c2 = cw**2 + ch**2 + EPS
    rho2 = ((b2_x1 + b2_x2) - (b1_x1 + b1_x2)) ** 2 / 4.0 + (
        (b2_y1 + b2_y2) - (b1_y1 + b1_y2)
    ) ** 2 / 4.0
    if iou_type == DIOU:
        return iou - rho2 / c2

    # CIoU: aspect-ratio consistency term with stop-gradient alpha.
    v = (4.0 / math.pi**2) * (
        jnp.arctan(w2 / (h2 + EPS)) - jnp.arctan(w1 / (h1 + EPS))
    ) ** 2
    alpha = jax.lax.stop_gradient(v / (1.0 - iou + v + EPS))
    return iou - (rho2 / c2 + v * alpha)


@jax.jit
def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """torchvision-style pairwise IoU matrix.

    Args:
      boxes1: [M, 4] xyxy.  boxes2: [N, 4] xyxy.
    Returns:
      [M, N] IoU matrix (torchvision box_iou semantics: exact union, no eps
      on areas — degenerate 0-area pairs produce nan/0 like the original;
      callers mask invalid rows).
    """
    a1 = area(boxes1)  # [M]
    a2 = area(boxes2)  # [N]
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])  # [M,N,2]
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])  # [M,N,2]
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (a1[:, None] + a2[None, :] - inter + EPS)


def clip_boxes_to_image(boxes: jnp.ndarray, size_hw) -> jnp.ndarray:
    """Clamp xyxy boxes to [0, W] x [0, H] (torchvision clip semantics)."""
    h, w = size_hw
    x = jnp.clip(boxes[..., 0::2], 0, w)
    y = jnp.clip(boxes[..., 1::2], 0, h)
    return jnp.stack(
        [x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1
    )


def small_box_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """True for boxes with both sides >= min_size (torchvision
    remove_small_boxes as a mask — static shapes mean we mask, not gather)."""
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= min_size) & (hs >= min_size)


# ---------------------------------------------------------------------------
# BoxCoder: (dx, dy, dw, dh) deltas between proposals and reference boxes.
# Semantics of torchvision_models/tvision/_utils.py:79-223.
# ---------------------------------------------------------------------------

BBOX_XFORM_CLIP = math.log(1000.0 / 16)


def encode_boxes(
    reference_boxes: jnp.ndarray,
    proposals: jnp.ndarray,
    weights=(1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Encode reference (gt) boxes w.r.t. proposals as weighted deltas.

    Both inputs [..., 4] xyxy; returns [..., 4] (dx, dy, dw, dh).
    """
    wx, wy, ww, wh = weights
    ex_w = proposals[..., 2] - proposals[..., 0]
    ex_h = proposals[..., 3] - proposals[..., 1]
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h

    gt_w = reference_boxes[..., 2] - reference_boxes[..., 0]
    gt_h = reference_boxes[..., 3] - reference_boxes[..., 1]
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

    dx = wx * (gt_cx - ex_cx) / ex_w
    dy = wy * (gt_cy - ex_cy) / ex_h
    dw = ww * jnp.log(gt_w / ex_w)
    dh = wh * jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(
    rel_codes: jnp.ndarray,
    boxes: jnp.ndarray,
    weights=(1.0, 1.0, 1.0, 1.0),
    bbox_xform_clip: float = BBOX_XFORM_CLIP,
) -> jnp.ndarray:
    """Decode weighted deltas against anchor/proposal boxes -> xyxy.

    rel_codes [..., 4], boxes [..., 4] xyxy; exp inputs are clipped at
    log(1000/16) like the reference to avoid overflow.
    """
    wx, wy, ww, wh = weights
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    dx = rel_codes[..., 0] / wx
    dy = rel_codes[..., 1] / wy
    dw = jnp.minimum(rel_codes[..., 2] / ww, bbox_xform_clip)
    dh = jnp.minimum(rel_codes[..., 3] / wh, bbox_xform_clip)

    pred_cx = dx * widths + ctr_x
    pred_cy = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights

    return jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ],
        axis=-1,
    )


class BoxCoder:
    """Stateless functional twin of the reference BoxCoder."""

    def __init__(self, weights=(1.0, 1.0, 1.0, 1.0),
                 bbox_xform_clip: float = BBOX_XFORM_CLIP):
        self.weights = tuple(float(w) for w in weights)
        self.bbox_xform_clip = bbox_xform_clip

    def encode(self, reference_boxes, proposals):
        return encode_boxes(reference_boxes, proposals, self.weights)

    def decode(self, rel_codes, boxes):
        return decode_boxes(rel_codes, boxes, self.weights,
                            self.bbox_xform_clip)
