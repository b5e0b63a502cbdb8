"""YOLOv3 criterion + decoder — the `YOLOForw` equivalent, fully vectorized.

Numerical semantics of `yolo/nets/yolo_forw.py:12-251`:
* Per-scale raw maps flatten to one ``[B, P, 5+C]`` tensor over priors
  ordered (h, w, a) per scale, scales concatenated coarse->fine.
* Grid priors ``cxypwh`` are *relative*: ((gx+0.5)/W, (gy+0.5)/H,
  anchor_w/img, anchor_h/img); ``inw_inh`` carries each prior's grid width.
* Training: each GT claims its best-IoU prior (duplicates allowed — the
  loss is per-GT, not per-prior); priors whose IoU with every GT is below
  ``ignore_threshold`` and that were not claimed form the no-object mask.
* Losses: MSE on sigmoid-xy vs cell offsets clamped to [1e-4, 0.9999];
  MSE on raw wh vs log(gt/anchor + 1e-16); (1 - IoU-variant) box loss on
  decoded boxes; focal-BCE objectness (positives vs 1, no-obj vs 0);
  CE/BCE/EQ class loss with optional tf-idf logit scaling. Sum reduction is
  normalized by the number of GTs.
* Five stats: avg IoU, pos conf, no-obj conf, prob at GT class, mean prob
  at non-GT classes.
* Inference decode to absolute pixel boxes ``[B, P, 5+C]``.

TPU design: GT is padded ``[B, M, ...]`` with a validity mask; the whole
criterion is one jit region with no per-image Python loops (the reference
loops images in `get_target`, yolo_forw.py:183-203).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from object_detectors_tpu.ops import boxes as box_ops
from object_detectors_tpu.ops import losses as L

# class_loss selector codes (hydra/yolo/head.yaml:14)
CLASS_LOSS_BCE, CLASS_LOSS_CE, CLASS_LOSS_EQ = 0, 1, 2


@dataclasses.dataclass(frozen=True)
class YoloLossConfig:
    """Mirror of hydra/yolo/head.yaml + dataset anchors."""

    num_classes: int = 80
    img_size: int = 416
    anchors: tuple = (
        ((116, 90), (156, 198), (373, 326)),
        ((30, 61), (62, 45), (59, 119)),
        ((10, 13), (16, 30), (33, 23)),
    )
    ignore_threshold: float = 0.5
    iou_type: int = box_ops.GIOU  # head.yaml default iou_type: 1
    lambda_iou: float = 1.0
    lambda_xy: float = 2.5
    lambda_wh: float = 2.5
    lambda_conf: float = 1.0
    lambda_no_conf: float = 0.1
    lambda_cls: float = 1.0
    alpha: float = 0.5
    gamma: float = 1.0
    class_loss: int = CLASS_LOSS_CE
    reduction: str = "sum"
    # tfidf_batch (head.yaml:21 / yolo_forw.py:87-91): recompute the idf
    # logit scale from the minibatch instead of the dataset table.
    tfidf_batch: bool = False
    tfidf_norm: int = 0


def make_priors(cfg: YoloLossConfig, grid_sizes: Sequence[int]):
    """Build (cxypwh [P,4], grid_w [P]) matching yolo_forw.py:96-123.

    grid_sizes: per-scale feature width (=height), e.g. (13, 26, 52).
    """
    priors, inw = [], []
    for k, gs in enumerate(grid_sizes):
        a = jnp.asarray(cfg.anchors[k], jnp.float32)  # [A, 2] pixel wh
        num_a = a.shape[0]
        gy, gx = jnp.meshgrid(
            jnp.arange(gs, dtype=jnp.float32),
            jnp.arange(gs, dtype=jnp.float32),
            indexing="ij",
        )
        # order (h, w, a)
        cx = jnp.broadcast_to(((gx + 0.5) / gs)[..., None], (gs, gs, num_a))
        cy = jnp.broadcast_to(((gy + 0.5) / gs)[..., None], (gs, gs, num_a))
        pw = jnp.broadcast_to(
            (a[:, 0] / cfg.img_size)[None, None, :], (gs, gs, num_a))
        ph = jnp.broadcast_to(
            (a[:, 1] / cfg.img_size)[None, None, :], (gs, gs, num_a))
        priors.append(
            jnp.stack([cx, cy, pw, ph], axis=-1).reshape(-1, 4))
        inw.append(jnp.full((gs * gs * num_a,), gs, jnp.float32))
    return jnp.concatenate(priors, 0), jnp.concatenate(inw, 0)


def flatten_raw_outputs(outputs, num_classes: int, anchors_per_scale: int):
    """NHWC raw maps [(B,H,W,A*(5+C)), ...] -> [B, P, 5+C] in (h,w,a)
    prior order, scales concatenated (yolo_forw.py:103-124)."""
    attrs = 5 + num_classes
    flat = []
    for out in outputs:
        b, h, w, _ = out.shape
        flat.append(out.reshape(b, h * w * anchors_per_scale, attrs))
    return jnp.concatenate(flat, axis=1)


def _decode(raw, priors, grid_w, img_size):
    """Raw regressions -> absolute pixel cxcywh (yolo_forw.py:163-176)."""
    strides = (img_size / grid_w)[..., None]
    gw = grid_w[..., None]
    xy = (jax.nn.sigmoid(raw[..., 0:2]) + priors[..., 0:2] * gw - 0.5) * strides
    wh = jnp.exp(raw[..., 2:4]) * priors[..., 2:4] * gw * strides
    return xy, wh


@partial(jax.jit, static_argnames=("cfg",))
def yolo_decode(
    raw_pred: jnp.ndarray,
    priors: jnp.ndarray,
    grid_w: jnp.ndarray,
    cfg: YoloLossConfig,
    idf_logits: jnp.ndarray | float = 1.0,
):
    """Inference decode: [B, P, 5+C] raw -> [B, P, 5+C] with absolute pixel
    cxcywh, sigmoid conf, and class probabilities (softmax for CE-trained
    heads, sigmoid otherwise), incl. tf-idf logit scaling."""
    xy, wh = _decode(raw_pred, priors[None], grid_w[None], cfg.img_size)
    conf = jax.nn.sigmoid(raw_pred[..., 4:5])
    logits = raw_pred[..., 5:] * idf_logits
    if cfg.class_loss == CLASS_LOSS_CE:
        cls = jax.nn.softmax(logits, axis=-1)
    else:
        cls = jax.nn.sigmoid(logits)
    return jnp.concatenate([xy, wh, conf, cls], axis=-1)


def _per_image_targets(gt_boxes, gt_valid, priors, grid_w, cfg: YoloLossConfig):
    """vmap body for get_target (yolo_forw.py:178-208).

    gt_boxes: [M, 4] relative cxcywh. Returns:
      best_prior [M], tgt [M, 4] (gx, gy, gw, gh), noobj_mask [P] bool.
    """
    iou = box_ops.box_iou(
        gt_boxes[:, None, :], priors[None, :, :], iou_type=cfg.iou_type
    )  # [M, P]
    iou = jnp.where(gt_valid[:, None], iou, 0.0)
    best = jnp.argmax(iou, axis=1).astype(jnp.int32)  # [M]

    matched_prior = priors[best]      # [M, 4]
    in_wh = grid_w[best]              # [M]

    gxy_abs = gt_boxes[:, 0:2] * in_wh[:, None]
    gxy = jnp.clip(gxy_abs - jnp.floor(gxy_abs), 0.0001, 0.9999)
    gwh = jnp.log(gt_boxes[:, 2:4] / matched_prior[:, 2:4] + 1e-16)
    tgt = jnp.concatenate([gxy, gwh], axis=-1)

    # no-obj: all (valid) GT IoUs below threshold, and not claimed.
    below = jnp.where(gt_valid[:, None], iou < cfg.ignore_threshold, True)
    noobj = jnp.all(below, axis=0)
    claimed = jnp.zeros(priors.shape[0], bool).at[best].set(
        gt_valid, mode="drop")
    noobj = noobj & (~claimed)
    return best, tgt, noobj


@partial(jax.jit, static_argnames=("cfg",))
def yolo_loss(
    raw_pred: jnp.ndarray,
    priors: jnp.ndarray,
    grid_w: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: YoloLossConfig,
    class_weights: jnp.ndarray | None = None,
    idf_logits: jnp.ndarray | float = 1.0,
    eq_rare_mask: jnp.ndarray | None = None,
):
    """Training criterion.

    Args:
      raw_pred: [B, P, 5+C] flattened raw head outputs (float32).
      priors / grid_w: from :func:`make_priors`.
      gt_boxes: [B, M, 4] relative cxcywh, padded.
      gt_labels: [B, M] int class ids.
      gt_valid: [B, M] bool.
      class_weights: [C] CE weight / BCE pos_weight vector (tf-idf cost
        path, yolo_forw.py:50-61).
      idf_logits: scalar or [C] logit scaling (tfidf[1]==1 path).
      eq_rare_mask: [C] 1.0-where-rare mask enabling the EQ loss variant.

    Returns:
      (loss, sub_losses[6], stats[5]) — sub_losses order (xy, wh, iou,
      pos_conf, neg_conf, cls); stats order (avg_iou, pos_conf,
      no_obj_conf, pos_class, neg_class).
    """
    b, p, _ = raw_pred.shape
    m = gt_boxes.shape[1]
    num_gt = jnp.maximum(jnp.sum(gt_valid), 1).astype(raw_pred.dtype)
    vmask = gt_valid.astype(raw_pred.dtype)  # [B, M]

    best, tgt, noobj = jax.vmap(
        _per_image_targets, in_axes=(0, 0, None, None, None)
    )(gt_boxes, gt_valid, priors, grid_w, cfg)

    # Gather matched raw predictions per GT: [B, M, 5+C]
    final = jnp.take_along_axis(raw_pred, best[..., None], axis=1)

    matched_prior = priors[best]          # [B, M, 4]
    matched_gw = grid_w[best]             # [B, M]

    # Decoded prediction and GT boxes in absolute pixels (transform_pred).
    pxy, pwh = _decode(final, matched_prior, matched_gw, cfg.img_size)
    gxy = (tgt[..., 0:2] + matched_prior[..., 0:2] * matched_gw[..., None]
           - 0.5) * (cfg.img_size / matched_gw)[..., None]
    gwh = jnp.exp(tgt[..., 2:4]) * matched_prior[..., 2:4] * \
        matched_gw[..., None] * (cfg.img_size / matched_gw)[..., None]
    pred_box = jnp.concatenate([pxy, pwh], axis=-1)
    gt_box = jnp.concatenate([gxy, gwh], axis=-1)

    iou = box_ops.box_iou(pred_box, gt_box, iou_type=cfg.iou_type)  # [B, M]

    # --- sub-losses (masked sums over valid GTs) ---
    loss_xy = cfg.lambda_xy * jnp.sum(
        (jax.nn.sigmoid(final[..., 0:2]) - tgt[..., 0:2]) ** 2
        * vmask[..., None])
    loss_wh = cfg.lambda_wh * jnp.sum(
        (final[..., 2:4] - tgt[..., 2:4]) ** 2 * vmask[..., None])
    loss_iou = cfg.lambda_iou * jnp.sum((1.0 - iou) * vmask)

    pos_conf_loss = cfg.lambda_conf * jnp.sum(
        L.focal_loss(final[..., 4], jnp.ones_like(final[..., 4]),
                     cfg.gamma, cfg.alpha) * vmask)
    nmask = noobj.astype(raw_pred.dtype)  # [B, P]
    neg_conf_loss = cfg.lambda_no_conf * jnp.sum(
        L.focal_loss(raw_pred[..., 4], jnp.zeros_like(raw_pred[..., 4]),
                     cfg.gamma, cfg.alpha) * nmask)

    # --- class loss ---
    if cfg.tfidf_batch:
        # yolo_forw.py:87-91: self.idf_logits = self.idf(targets) each
        # batch, optionally Lp-normalized
        from object_detectors_tpu.data.idf import minibatch_idf

        idf_logits = minibatch_idf(gt_labels, gt_valid, cfg.num_classes)
        if cfg.tfidf_norm:
            idf_logits = idf_logits / jnp.linalg.norm(
                idf_logits, ord=cfg.tfidf_norm)
    cls_logits = final[..., 5:] * idf_logits  # [B, M, C]
    labels_oh = jax.nn.one_hot(gt_labels, cfg.num_classes,
                               dtype=raw_pred.dtype)
    if cfg.class_loss == CLASS_LOSS_CE:
        nll = L.softmax_cross_entropy(cls_logits, gt_labels, class_weights)
        class_loss = cfg.lambda_cls * jnp.sum(nll * vmask)
    elif cfg.class_loss == CLASS_LOSS_EQ:
        rare = eq_rare_mask if eq_rare_mask is not None else jnp.zeros(
            cfg.num_classes, raw_pred.dtype)
        per_el = L.eq_loss(
            cls_logits.reshape(-1, cfg.num_classes),
            labels_oh.reshape(-1, cfg.num_classes),
            rare, cfg.gamma, cfg.alpha, class_weights,
        ).reshape(b, m, cfg.num_classes)
        class_loss = cfg.lambda_cls * jnp.sum(per_el * vmask[..., None])
    else:  # BCE with pos_weight
        per_el = L.sigmoid_binary_cross_entropy(
            cls_logits, labels_oh, class_weights)
        class_loss = cfg.lambda_cls * jnp.sum(per_el * vmask[..., None])

    loss = (loss_xy + loss_wh + loss_iou + pos_conf_loss + neg_conf_loss
            + class_loss)
    sub = jnp.stack([loss_xy, loss_wh, loss_iou, pos_conf_loss,
                     neg_conf_loss, class_loss])
    if cfg.reduction == "sum":
        loss = loss / num_gt
        sub = sub / num_gt

    # --- stats (yolo_forw.py:233-248) ---
    pred_conf = jax.nn.sigmoid(final[..., 4])
    if cfg.class_loss == CLASS_LOSS_CE:
        pred_cls = jax.nn.softmax(final[..., 5:], axis=-1)
    else:
        pred_cls = jax.nn.sigmoid(final[..., 5:])
    nm_total = jnp.maximum(jnp.sum(nmask), 1.0)
    avg_iou = jnp.sum(iou * vmask) / num_gt
    pos_conf = jnp.sum(pred_conf * vmask) / num_gt
    no_obj_conf = jnp.sum(jax.nn.sigmoid(raw_pred[..., 4]) * nmask) / nm_total
    pos_class = jnp.sum(
        jnp.sum(pred_cls * labels_oh, -1) * vmask) / num_gt
    neg_count = jnp.maximum(num_gt * (cfg.num_classes - 1), 1.0)
    neg_class = jnp.sum(
        pred_cls * (1.0 - labels_oh) * vmask[..., None]) / neg_count
    stats = jnp.stack([avg_iou, pos_conf, no_obj_conf, pos_class, neg_class])

    return loss, sub, jax.lax.stop_gradient(stats)
