"""Legacy per-scale YOLO loss/decoder — the `yolo/nets/yolo_loss.py`
twin (used by the reference's benchmark.py path).

Differences from the production criterion (yolo_criterion.py):
* operates on ONE scale at a time with grid-tensor targets
  [B, H, W, A] built by scatter (the reference loops images and scatters
  into [B, 3, H, W] tensors, yolo_loss.py:110-161);
* anchor matching is shape-only IoU of (0, 0, gw, gh) against the
  anchor boxes at the origin (yolo_loss.py:140-146), each GT claiming
  its best anchor at its center cell;
* losses are mean-reduced BCE (xy, conf, cls) and MSE (wh) over the
  positive / no-object cells (yolo_loss.py:60-73);
* the eval decode returns [B, A*H*W, 5+C] in (a, h, w) order with
  absolute pixel boxes (yolo_loss.py:76-108).

TPU rebuild: scatters are `.at[...]` updates with padded-GT indices
routed out-of-bounds (mode="drop"); the whole target build vmaps over
the batch.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from object_detectors_tpu.ops import losses as L


@dataclasses.dataclass(frozen=True)
class YoloLegacyConfig:
    num_classes: int = 80
    img_size: int = 416
    anchors: tuple = ((116, 90), (156, 198), (373, 326))  # this scale's
    ignore_threshold: float = 0.5
    lambda_xy: float = 2.5
    lambda_wh: float = 2.5
    lambda_conf: float = 1.0
    lambda_no_conf: float = 0.1
    lambda_cls: float = 1.0


def _shape_iou(gt_wh, anchor_wh):
    """IoU of origin-anchored boxes: [M, 2] x [A, 2] -> [M, A]."""
    inter = jnp.minimum(gt_wh[:, None, 0], anchor_wh[None, :, 0]) * \
        jnp.minimum(gt_wh[:, None, 1], anchor_wh[None, :, 1])
    area_g = gt_wh[:, 0] * gt_wh[:, 1]
    area_a = anchor_wh[:, 0] * anchor_wh[:, 1]
    return inter / (area_g[:, None] + area_a[None, :] - inter + 1e-16)


def _targets_one(gt_boxes, gt_valid, gt_labels, in_hw, scaled_anchors,
                 num_classes, ignore_threshold=0.5):
    """Per-image grid targets. gt_boxes [M, 4] rel cxcywh ->
    dict of [H, W, A(, C)] target tensors."""
    h, w = in_hw
    a = scaled_anchors.shape[0]
    gx = jnp.clip(gt_boxes[:, 0] * w, 0, w - 1e-4)
    gy = jnp.clip(gt_boxes[:, 1] * h, 0, h - 1e-4)
    gw = gt_boxes[:, 2] * w
    gh = gt_boxes[:, 3] * h
    gi = gx.astype(jnp.int32)
    gj = gy.astype(jnp.int32)
    # padded GT rows scatter out of bounds -> dropped
    gj_s = jnp.where(gt_valid, gj, h)
    gi_s = jnp.where(gt_valid, gi, w)

    iou = _shape_iou(jnp.stack([gw, gh], 1), scaled_anchors)  # [M, A]
    best = jnp.argmax(iou, axis=1)

    # ignore: anchors whose shape-IoU with a GT exceeds the threshold at
    # that GT's cell leave the no-object set (yolo_loss.py:148-150)
    noobj = jnp.ones((h, w, a), bool).at[gj_s, gi_s, :].min(
        ~(iou > ignore_threshold), mode="drop")
    mask = jnp.zeros((h, w, a), bool).at[gj_s, gi_s, best].set(
        True, mode="drop")
    noobj = noobj & (~mask)

    tx = jnp.zeros((h, w, a)).at[gj_s, gi_s, best].set(gx - gi,
                                                       mode="drop")
    ty = jnp.zeros((h, w, a)).at[gj_s, gi_s, best].set(gy - gj,
                                                       mode="drop")
    anchor_w = scaled_anchors[best, 0]
    anchor_h = scaled_anchors[best, 1]
    tw = jnp.zeros((h, w, a)).at[gj_s, gi_s, best].set(
        jnp.log(gw / anchor_w + 1e-16), mode="drop")
    th = jnp.zeros((h, w, a)).at[gj_s, gi_s, best].set(
        jnp.log(gh / anchor_h + 1e-16), mode="drop")
    tcls = jnp.zeros((h, w, a, num_classes)).at[
        gj_s, gi_s, best, jnp.clip(gt_labels, 0, num_classes - 1)
    ].set(1.0, mode="drop")
    return mask, noobj, tx, ty, tw, th, tcls


@partial(jax.jit, static_argnames=("cfg",))
def yolo_legacy_loss(raw, gt_boxes, gt_labels, gt_valid,
                     cfg: YoloLegacyConfig):
    """raw: one scale's NHWC output [B, H, W, A*(5+C)].

    Returns (loss, (loss_x, loss_y, loss_w, loss_h, loss_conf,
    loss_cls)) — the 7-tuple of yolo_loss.py:74-75.
    """
    b, h, w, _ = raw.shape
    a = len(cfg.anchors)
    attrs = 5 + cfg.num_classes
    pred = raw.reshape(b, h, w, a, attrs)
    stride = cfg.img_size / w
    scaled = jnp.asarray(cfg.anchors, jnp.float32) / stride

    mask, noobj, tx, ty, tw, th, tcls = jax.vmap(
        _targets_one, in_axes=(0, 0, 0, None, None, None, None)
    )(gt_boxes, gt_valid, gt_labels, (h, w), scaled, cfg.num_classes,
      cfg.ignore_threshold)

    m = mask.astype(raw.dtype)
    nm = noobj.astype(raw.dtype)
    n_pos = jnp.maximum(jnp.sum(m), 1.0)
    n_neg = jnp.maximum(jnp.sum(nm), 1.0)

    def masked_mean(el, msk, count):
        return jnp.sum(el * msk) / count

    loss_x = masked_mean(
        L.sigmoid_binary_cross_entropy(pred[..., 0], tx), m, n_pos)
    loss_y = masked_mean(
        L.sigmoid_binary_cross_entropy(pred[..., 1], ty), m, n_pos)
    loss_w = masked_mean((pred[..., 2] - tw) ** 2, m, n_pos)
    loss_h = masked_mean((pred[..., 3] - th) ** 2, m, n_pos)
    loss_conf = cfg.lambda_conf * masked_mean(
        L.sigmoid_binary_cross_entropy(pred[..., 4],
                                       jnp.ones_like(pred[..., 4])),
        m, n_pos) + cfg.lambda_no_conf * masked_mean(
        L.sigmoid_binary_cross_entropy(pred[..., 4],
                                       jnp.zeros_like(pred[..., 4])),
        nm, n_neg)
    cls_el = L.sigmoid_binary_cross_entropy(pred[..., 5:], tcls)
    loss_cls = jnp.sum(cls_el * m[..., None]) / (n_pos * cfg.num_classes)

    loss = (loss_x + loss_y) * cfg.lambda_xy + \
        (loss_w + loss_h) * cfg.lambda_wh + loss_conf + \
        loss_cls * cfg.lambda_cls
    return loss, (loss_x, loss_y, loss_w, loss_h, loss_conf, loss_cls)


@partial(jax.jit, static_argnames=("cfg",))
def yolo_legacy_decode(raw, cfg: YoloLegacyConfig):
    """One scale NHWC [B, H, W, A*(5+C)] -> [B, A*H*W, 5+C] absolute
    pixel boxes in the legacy (a, h, w) order (yolo_loss.py:76-108)."""
    b, h, w, _ = raw.shape
    a = len(cfg.anchors)
    attrs = 5 + cfg.num_classes
    stride = cfg.img_size / w
    pred = raw.reshape(b, h, w, a, attrs).transpose(0, 3, 1, 2, 4)
    gx = jnp.arange(w, dtype=raw.dtype)[None, None, None, :]
    gy = jnp.arange(h, dtype=raw.dtype)[None, None, :, None]
    anchors = jnp.asarray(cfg.anchors, raw.dtype) / stride
    aw = anchors[:, 0][None, :, None, None]
    ah = anchors[:, 1][None, :, None, None]
    x = (jax.nn.sigmoid(pred[..., 0]) + gx) * stride
    y = (jax.nn.sigmoid(pred[..., 1]) + gy) * stride
    bw = jnp.exp(pred[..., 2]) * aw * stride
    bh = jnp.exp(pred[..., 3]) * ah * stride
    conf = jax.nn.sigmoid(pred[..., 4])
    cls = jax.nn.sigmoid(pred[..., 5:])
    out = jnp.concatenate(
        [jnp.stack([x, y, bw, bh, conf], -1), cls], -1)
    return out.reshape(b, a * h * w, attrs)
