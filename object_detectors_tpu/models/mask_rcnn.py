"""Mask R-CNN — Faster R-CNN + mask branch, static-shape TPU style.

Parity with `torchvision_models/tvision/mask_rcnn.py:21-338` and the mask
pieces of `roi_heads.py`:
* MaskRCNNHeads (:226-251): 4x (3x3 conv 256 + ReLU) on 14x14 RoIAligned
  features; MaskRCNNPredictor (:254-270): 2x2/s2 deconv + ReLU + 1x1 conv
  to per-class mask logits (28x28).
* maskrcnn_loss (roi_heads.py:136-183): targets are the GT masks
  RoIAligned onto the positive proposals at 28x28
  (project_masks_on_boxes, :136-150); BCE-with-logits at the GT class's
  channel, mean over all positive (proposal, pixel) pairs.
* maskrcnn_inference (:99-133): sigmoid, gather the predicted class's
  channel.
* paste_masks_in_image (:440-536): expand by 1px padding and scale,
  bilinear-resample each 28x28 mask into its box on the image canvas —
  vectorized here as a static-shape inverse-warp gather (no per-mask
  Python loop, no dynamic slicing).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from object_detectors_tpu.models import faster_rcnn as FR
from object_detectors_tpu.models import roi_heads as RH
from object_detectors_tpu.models import rpn as RPN
from object_detectors_tpu.models import anchors as anchor_lib
from object_detectors_tpu.models.resnet import BackboneWithFPN, ResNet
from object_detectors_tpu.ops import boxes as box_ops
from object_detectors_tpu.ops.roi_align import pool_multiscale, roi_align


class MaskRCNNHeads(nn.Module):
    layers: int = 4
    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_init=nn.initializers.kaiming_normal(),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"mask_fcn{i+1}")(x)
            x = nn.relu(x)
        return x


class MaskRCNNPredictor(nn.Module):
    num_classes: int
    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                             kernel_init=nn.initializers.kaiming_normal(),
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="conv5_mask")(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1),
                       kernel_init=nn.initializers.kaiming_normal(),
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="mask_fcn_logits")(x)


def project_masks_on_boxes(gt_masks, boxes, matched_idxs, m):
    """[G, H, W] masks + [S, 4] boxes + [S] matched gt -> [S, m, m]
    targets (roi_heads.py:136-150: roi_align on the matched mask).

    Documented approximation: uses a fixed sampling_ratio=2 where the
    reference's roi_align default is adaptive (ceil(roi/bin)); mask
    targets for very large boxes average 4 samples per bin instead of
    more. The deviation is sub-pixel at 28x28 target resolution."""
    sel = gt_masks[matched_idxs]  # [S, H, W]

    def one(mask, box):
        return roi_align(mask[..., None], box[None], (m, m), 1.0, 2)[0, ..., 0]

    return jax.vmap(one)(sel, boxes)


@partial(jax.jit, static_argnames=())
def maskrcnn_loss(mask_logits, proposals, gt_masks, gt_labels,
                  matched_idxs, pos_mask):
    """Batched mask loss.

    mask_logits: [B, S, m, m, C]; proposals [B, S, 4];
    gt_masks [B, M, H, W] float {0,1}; gt_labels [B, M];
    matched_idxs [B, S] (gt index per sample); pos_mask [B, S].
    """
    b, s, m, _, c = mask_logits.shape

    def per_image(logits, props, masks, labels, midx, pos):
        targets = project_masks_on_boxes(masks, props, midx, m)  # [S,m,m]
        lab = jnp.clip(labels[midx], 0)
        at_label = jnp.take_along_axis(
            logits, lab[:, None, None, None].astype(jnp.int32), axis=-1
        )[..., 0]  # [S, m, m]
        el = jnp.maximum(at_label, 0) - at_label * targets + \
            jnp.log1p(jnp.exp(-jnp.abs(at_label)))
        return jnp.sum(el * pos[:, None, None]), jnp.sum(pos) * m * m

    loss_sum, count = jax.vmap(per_image)(
        mask_logits, proposals, gt_masks, gt_labels, matched_idxs,
        pos_mask.astype(mask_logits.dtype))
    return jnp.sum(loss_sum) / jnp.maximum(jnp.sum(count), 1.0)


def maskrcnn_inference(mask_logits, labels):
    """[B, D, m, m, C] logits + [B, D] labels -> [B, D, m, m] probs."""
    sel = jnp.take_along_axis(
        mask_logits, jnp.clip(labels, 0)[..., None, None, None]
        .astype(jnp.int32), axis=-1)[..., 0]
    return jax.nn.sigmoid(sel)


@partial(jax.jit, static_argnames=("image_size", "padding"))
def paste_masks_in_image(masks, boxes, image_size, padding: int = 1):
    """[D, m, m] masks + [D, 4] xyxy -> [D, H, W] pasted probabilities.

    Vectorized inverse warp: for each image pixel, sample the mask at the
    corresponding normalized box coordinate (bilinear, zero outside),
    reproducing the expand-by-padding + resize + paste pipeline
    (roi_heads.py:415-536) without data-dependent shapes.
    """
    d, m, _ = masks.shape
    im_h, im_w = image_size
    scale = (m + 2 * padding) / m
    # expand masks by `padding` zeros on each side -> size mp
    mp = m + 2 * padding
    padded = jnp.zeros((d, mp, mp), masks.dtype)
    padded = padded.at[:, padding:padding + m, padding:padding + m].set(masks)
    # expand boxes about center by the same scale (expand_boxes), then
    # TRUNCATE to integers: the reference casts the expanded boxes to
    # int64 before computing w/h, the resize grid, and the paste crop
    # (roi_heads.py:521 `.to(dtype=torch.int64)`, :443-447, :456-459).
    # Sampling at the float box instead is a sub-pixel shift of the
    # whole pasted mask — invisible on smooth random-weight masks
    # (0.016 mean-abs) but a full boundary band on sharp trained
    # sigmoids (the r4 "0.164 worst mean-abs" parity divergence; fixed
    # r5, see PARITY.md).
    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    half_w = (boxes[:, 2] - boxes[:, 0]) * 0.5 * scale
    half_h = (boxes[:, 3] - boxes[:, 1]) * 0.5 * scale
    x0 = jnp.trunc(cx - half_w)
    x1 = jnp.trunc(cx + half_w)
    y0 = jnp.trunc(cy - half_h)
    y1 = jnp.trunc(cy + half_h)
    w = jnp.maximum(x1 - x0 + 1, 1.0)
    h = jnp.maximum(y1 - y0 + 1, 1.0)

    ys = jnp.arange(im_h, dtype=masks.dtype)
    xs = jnp.arange(im_w, dtype=masks.dtype)
    # normalized mask coords for every (det, pixel): align_corners=False
    my = ((ys[None, :] - y0[:, None] + 0.5) / h[:, None]) * mp - 0.5
    mx = ((xs[None, :] - x0[:, None] + 0.5) / w[:, None]) * mp - 0.5
    # the reference pastes exactly rows y0..y1 / cols x0..x1 (clamped
    # to the image): outside that crop the bilinear tail of the resized
    # mask must not leak
    vy = (ys[None, :] >= y0[:, None]) & (ys[None, :] < y1[:, None] + 1)
    vx = (xs[None, :] >= x0[:, None]) & (xs[None, :] < x1[:, None] + 1)

    def sample(mask, yy, xx):
        y0i = jnp.floor(yy).astype(jnp.int32)
        x0i = jnp.floor(xx).astype(jnp.int32)
        ly = yy - y0i
        lx = xx - x0i

        def at(yi, xi):
            in_y = (yi >= 0) & (yi < mp)
            in_x = (xi >= 0) & (xi < mp)
            v = mask[jnp.clip(yi, 0, mp - 1)[:, None],
                     jnp.clip(xi, 0, mp - 1)[None, :]]
            return jnp.where(in_y[:, None] & in_x[None, :], v, 0.0)

        v00 = at(y0i, x0i)
        v01 = at(y0i, x0i + 1)
        v10 = at(y0i + 1, x0i)
        v11 = at(y0i + 1, x0i + 1)
        return ((1 - ly)[:, None] * ((1 - lx)[None, :] * v00 + lx[None, :] * v01)
                + ly[:, None] * ((1 - lx)[None, :] * v10 + lx[None, :] * v11))

    out = jax.vmap(sample)(padded, my, mx)
    return out * (vy[:, :, None] & vx[:, None, :])


@dataclasses.dataclass(frozen=True)
class MaskRCNNConfig:
    num_classes: int = 91
    rpn: RPN.RPNConfig = RPN.RPNConfig()
    # the reference's MaskRCNN keeps 300 detections (mask_rcnn.py:169),
    # not FasterRCNN's 100
    roi: RH.RoIHeadsConfig = RH.RoIHeadsConfig(detections_per_img=300)
    resnet_layers: tuple = (3, 4, 6, 3)
    mask_pool_size: tuple = (14, 14)
    backbone_fused: str = "off"  # fused eval bottlenecks (resnet.py)


class MaskRCNN(nn.Module):
    """Faster R-CNN graph + mask branch in one jit region."""

    cfg: MaskRCNNConfig = MaskRCNNConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = BackboneWithFPN(
            ResNet(self.cfg.resnet_layers, "bottleneck", "frozen",
                   self.dtype, fused=self.cfg.backbone_fused),
            out_channels=256, extra_blocks="pool",
            returned_layers=(1, 2, 3, 4), name="backbone")
        self.rpn_head = RPN.RPNHead(num_anchors=3, dtype=self.dtype,
                                    name="rpn_head")
        self.box_head = RH.TwoMLPHead(1024, dtype=self.dtype,
                                      name="box_head")
        self.box_predictor = RH.FastRCNNPredictor(
            self.cfg.num_classes, dtype=self.dtype, name="box_predictor")
        self.mask_head = MaskRCNNHeads(dtype=self.dtype, name="mask_head")
        self.mask_predictor = MaskRCNNPredictor(
            self.cfg.num_classes, dtype=self.dtype, name="mask_predictor")

    def __call__(self, images, gt_boxes=None, gt_labels=None,
                 gt_valid=None, gt_masks=None, train: bool = False,
                 tfidf=None, class_weights=None):
        cfg = self.cfg
        b, img_h, img_w, _ = images.shape
        feats = self.backbone(images, train)
        objectness, pred_deltas, level_sizes = self.rpn_head(feats)
        objectness = objectness.astype(jnp.float32)
        pred_deltas = pred_deltas.astype(jnp.float32)

        grid_sizes = tuple((f.shape[1], f.shape[2]) for f in feats)
        sizes, ars = anchor_lib.rpn_anchor_config()
        anchors = jnp.asarray(anchor_lib.grid_anchors(
            (img_h, img_w), grid_sizes, sizes[:len(grid_sizes)],
            ars[:len(grid_sizes)]))
        proposals_all = jax.lax.stop_gradient(box_ops.decode_boxes(
            pred_deltas, anchors[None], cfg.rpn.box_weights))
        prop_boxes, prop_scores, prop_valid = RPN.filter_proposals(
            proposals_all, objectness, level_sizes, (img_h, img_w),
            cfg.rpn, training=train)

        if train:
            key = self.make_rng("sampler")
            k_rpn, k_roi = jax.random.split(key)
            rpn_losses = RPN.rpn_loss(
                objectness, pred_deltas, anchors, gt_boxes, gt_valid,
                k_rpn, cfg.rpn)
            s_boxes, s_labels, reg_targets, s_pos, s_sampled, s_matched = (
                RH.select_training_samples(
                    prop_boxes, prop_valid, gt_boxes, gt_labels, gt_valid,
                    k_roi, cfg.roi))
            roi_boxes = s_boxes
        else:
            roi_boxes = prop_boxes

        pooled = pool_multiscale(
            tuple(feats[:4]), roi_boxes, (img_h, img_w), cfg.roi.pool_size,
            method=cfg.roi.pooler_method)
        x = self.box_head(pooled)
        class_logits, box_regression = self.box_predictor(x)
        class_logits = class_logits.astype(jnp.float32)
        box_regression = box_regression.astype(jnp.float32)

        if train:
            scale = RH.training_tfidf_scale(gt_labels, gt_valid, cfg.roi,
                                            tfidf)
            det_losses = RH.fastrcnn_loss(
                class_logits * scale, box_regression, s_labels,
                reg_targets, s_sampled, cfg.roi,
                class_weights=class_weights)
            # mask branch on the positive samples (we keep the full
            # fixed-size sample set and mask the loss by positivity)
            mask_pooled = pool_multiscale(
            tuple(feats[:4]), roi_boxes, (img_h, img_w), cfg.mask_pool_size,
            method=cfg.roi.pooler_method)
            ml = self.mask_predictor(self.mask_head(
                mask_pooled.reshape((-1,) + mask_pooled.shape[2:])))
            m_out = ml.shape[1]
            mask_logits = ml.reshape(
                b, -1, m_out, m_out, cfg.num_classes).astype(jnp.float32)
            # reuse the sampler's matched GT index (roi_heads.py:841-849)
            # rather than a fresh argmax that can disagree on ties
            loss_mask = maskrcnn_loss(
                mask_logits, roi_boxes, gt_masks, gt_labels, s_matched,
                s_pos)
            return {**det_losses, **rpn_losses, "loss_mask": loss_mask}

        boxes, scores, labels, valid = RH.postprocess_detections(
            class_logits, box_regression, roi_boxes, prop_valid,
            (img_h, img_w), cfg.roi,
            tfidf_post=1.0 if tfidf is None else tfidf)
        mask_pooled = pool_multiscale(
            tuple(feats[:4]), boxes, (img_h, img_w), cfg.mask_pool_size,
            method=cfg.roi.pooler_method)
        ml = self.mask_predictor(self.mask_head(
            mask_pooled.reshape((-1,) + mask_pooled.shape[2:])))
        m_out = ml.shape[1]
        mask_logits = ml.reshape(
            b, -1, m_out, m_out, cfg.num_classes).astype(jnp.float32)
        masks = maskrcnn_inference(mask_logits, labels)
        return boxes, scores, labels, valid, masks
