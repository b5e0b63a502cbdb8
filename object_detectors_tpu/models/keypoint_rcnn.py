"""Keypoint R-CNN — the assembled model plus the branch pieces, parity
with `torchvision_models/tvision/roi_heads.py:186-379` and torchvision's
KeypointRCNN assembly (FasterRCNN graph + keypoint branch, num_classes=2).

* KeypointRCNNHeads: 8 x (3x3 conv 512 + ReLU) on 14x14 RoIAligned
  features; KeypointRCNNPredictor: 4x4/s2 deconv + 2x bilinear upscale
  -> K heatmap logits at 56x56.
* keypoints_to_heatmap (:186-230): keypoints map to box-relative heatmap
  cells; valid iff visible and inside the box.
* keypointrcnn_loss (:295-322): softmax cross-entropy over the flattened
  heatmap at each valid keypoint's target cell, mean over valid.
* heatmaps_to_keypoints (:233-292): per keypoint argmax -> image
  coordinates + score. TPU variant: one fixed 4x bicubic refinement +
  argmax (the reference resizes each heatmap to its RoI's exact pixel
  size — data-dependent shapes; parity/run_parity.py keypoint_parity
  measures the sub-cell difference: worst 0.52 heatmap cells).
* KeypointRCNN: one jit region like our FasterRCNN/MaskRCNN — RPN,
  sampling, box branch and keypoint branch with static shapes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from object_detectors_tpu.models import anchors as anchor_lib
from object_detectors_tpu.models import roi_heads as RH
from object_detectors_tpu.models import rpn as RPN
from object_detectors_tpu.models.resnet import BackboneWithFPN, ResNet
from object_detectors_tpu.ops import boxes as box_ops
from object_detectors_tpu.ops.roi_align import pool_multiscale


class KeypointRCNNHeads(nn.Module):
    layers: int = 8
    features: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_init=nn.initializers.kaiming_normal(),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"kps_fcn{i+1}")(x)
            x = nn.relu(x)
        return x


class KeypointRCNNPredictor(nn.Module):
    num_keypoints: int = 17
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             padding="SAME", dtype=self.dtype,
                             param_dtype=jnp.float32,
                             name="kps_score_lowres")(x)
        b, h, w, k = x.shape
        return jax.image.resize(x, (b, h * 2, w * 2, k), "bilinear")


def keypoints_to_heatmap(keypoints, boxes, heatmap_size: int):
    """[S, K, 3] keypoints (x, y, vis) + [S, 4] boxes ->
    (target_cell [S, K] int, valid [S, K] bool)."""
    x1, y1 = boxes[:, 0:1], boxes[:, 1:2]
    w = jnp.clip(boxes[:, 2:3] - boxes[:, 0:1], 1e-6)
    h = jnp.clip(boxes[:, 3:4] - boxes[:, 1:2], 1e-6)
    sx = heatmap_size / w
    sy = heatmap_size / h
    x = (keypoints[..., 0] - x1) * sx
    y = (keypoints[..., 1] - y1) * sy
    x_int = jnp.floor(x).astype(jnp.int32)
    y_int = jnp.floor(y).astype(jnp.int32)
    # boundary inclusion like the reference: points exactly on the far
    # edge map to the last cell
    x_int = jnp.where(x_int == heatmap_size, heatmap_size - 1, x_int)
    y_int = jnp.where(y_int == heatmap_size, heatmap_size - 1, y_int)
    valid = ((keypoints[..., 2] > 0) & (x_int >= 0) & (y_int >= 0)
             & (x_int < heatmap_size) & (y_int < heatmap_size))
    cell = jnp.clip(y_int, 0, heatmap_size - 1) * heatmap_size + \
        jnp.clip(x_int, 0, heatmap_size - 1)
    # invalid targets carry cell 0, matching the reference contract
    # (roi_heads.py:218 `heatmaps = lin_ind * valid`)
    return cell * valid, valid


@jax.jit
def keypointrcnn_loss(kp_logits, proposals, gt_keypoints, matched_idxs,
                      pos_mask):
    """kp_logits [B, S, H, H, K]; proposals [B, S, 4];
    gt_keypoints [B, M, K, 3]; matched_idxs [B, S]; pos_mask [B, S]."""
    b, s, hm, _, k = kp_logits.shape

    def per_image(logits, props, kps, midx, pos):
        sel = kps[midx]  # [S, K, 3]
        cell, valid = keypoints_to_heatmap(sel, props, hm)
        valid = valid & pos[:, None]
        flat = logits.reshape(s, hm * hm, k).transpose(0, 2, 1)  # [S,K,HH]
        logp = jax.nn.log_softmax(flat, axis=-1)
        nll = -jnp.take_along_axis(logp, cell[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * valid), jnp.sum(valid)

    loss_sum, count = jax.vmap(per_image)(
        kp_logits, proposals, gt_keypoints, matched_idxs,
        pos_mask)
    # reference: missing valid keypoints -> zero loss contribution
    return jnp.sum(loss_sum) / jnp.maximum(jnp.sum(count), 1.0)


@partial(jax.jit, static_argnames=("upsample",))
def heatmaps_to_keypoints(kp_logits, boxes, upsample: int = 4):
    """[B, D, H, H, K] logits + [B, D, 4] boxes ->
    (keypoints [B, D, K, 3] (x, y, vis=1), scores [B, D, K]).

    The reference (roi_heads.py:275-328) bicubic-resizes each heatmap to
    the RoI's OWN ceil(w) x ceil(h) pixel size before the argmax —
    data-dependent shapes XLA cannot compile. Static-shape equivalent:
    one bicubic upsample to a fixed ``upsample``x finer grid, argmax
    there, and map (i + 0.5)/grid into the box — sub-cell localization
    within heatmap_cell/upsample of the reference (documented
    approximation; upsample=1 reproduces the coarse grid argmax)."""
    b, d, hm, _, k = kp_logits.shape
    if upsample > 1:
        up = jax.image.resize(
            kp_logits.astype(jnp.float32),
            (b, d, hm * upsample, hm * upsample, k), method="bicubic")
    else:
        up = kp_logits.astype(jnp.float32)
    g = hm * upsample
    flat = up.reshape(b, d, g * g, k)
    idx = jnp.argmax(flat, axis=2)  # [B, D, K] refined grid cell
    # score = softmax prob on the COARSE grid at the refined peak's cell
    # (the fine-grid softmax spreads one peak over upsample^2 cells)
    coarse_flat = kp_logits.astype(jnp.float32).reshape(b, d, hm * hm, k)
    probs = jax.nn.softmax(coarse_flat, axis=2)
    cidx = ((idx // g) // upsample) * hm + (idx % g) // upsample
    scores = jnp.take_along_axis(probs, cidx[:, :, None, :], axis=2)[
        :, :, 0, :]
    yy = (idx // g).astype(jnp.float32) + 0.5
    xx = (idx % g).astype(jnp.float32) + 0.5
    w = jnp.clip(boxes[..., 2] - boxes[..., 0], 1e-6)[..., None]
    h = jnp.clip(boxes[..., 3] - boxes[..., 1], 1e-6)[..., None]
    x = boxes[..., 0][..., None] + xx / g * w
    y = boxes[..., 1][..., None] + yy / g * h
    kps = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return kps, scores


def _bicubic_rows(out_size, n_in: int, n_out_max: int):
    """[n_out_max, n_in] sampling matrix of PyTorch bicubic interpolate
    (align_corners=False, border-clamped taps, a=-0.75 — the kernel
    F.interpolate uses at roi_heads.py:311) for a *traced* output size;
    rows >= out_size are don't-care (masked by the caller). Shared
    machinery with the device ingest resize (kernels/preprocess.py)."""
    from object_detectors_tpu.kernels.preprocess import bicubic_rows

    return bicubic_rows(n_in / out_size, n_in, n_in, n_out_max)


@partial(jax.jit, static_argnames=("max_roi_size",))
def heatmaps_to_keypoints_exact(kp_logits, boxes,
                                max_roi_size: int = 512):
    """EXACT static-shape equivalent of the reference decode
    (roi_heads.py:303-328): bicubic-resize each heatmap to its RoI's own
    ceil(w) x ceil(h) pixel grid, row-major argmax, coords
    (idx + 0.5) * (w / ceil(w)) + x1, score = the interpolated logit at
    the peak.

    The data-dependent resize becomes two matmuls against per-RoI
    sampling matrices with a static ``max_roi_size`` row budget: the
    bicubic kernel is separable, so the RoI size only changes the sample
    positions (the matrix values), never the shapes. Exact for RoIs up to
    ``max_roi_size`` px per side (larger RoIs decode on the capped grid
    — sub-cell-accurate but not bit-exact; raise the cap for parity runs
    on larger images).

    kp_logits [B, D, H, H, K] + boxes [B, D, 4] ->
    (keypoints [B, D, K, 3] (x, y, 1), scores [B, D, K] raw logits)."""
    b, d, hm, _, k = kp_logits.shape
    n = max_roi_size

    def per_det(args):
        logits, box = args                     # [H, H, K], [4]
        x1, y1 = box[0], box[1]
        w = jnp.clip(box[2] - box[0], 1.0)
        h = jnp.clip(box[3] - box[1], 1.0)
        wc = jnp.minimum(jnp.ceil(w), n)
        hc = jnp.minimum(jnp.ceil(h), n)
        ky = _bicubic_rows(hc, hm, n)          # [n, hm]
        kx = _bicubic_rows(wc, hm, n)          # [n, hm]
        maps = logits.astype(jnp.float32).transpose(2, 0, 1)  # [K, H, H]
        tmp = jnp.einsum("yh,khw->kyw", ky, maps)
        s = jnp.einsum("kyw,xw->kyx", tmp, kx)               # [K, n, n]
        i = jnp.arange(n, dtype=jnp.float32)
        valid = (i[:, None] < hc) & (i[None, :] < wc)
        masked = jnp.where(valid[None], s, -jnp.inf)
        pos = jnp.argmax(masked.reshape(k, -1), axis=1)
        x_int = (pos % n).astype(jnp.float32)
        y_int = (pos // n).astype(jnp.float32)
        x = (x_int + 0.5) * (w / wc) + x1
        y = (y_int + 0.5) * (h / hc) + y1
        score = jnp.take_along_axis(
            s.reshape(k, -1), pos[:, None], axis=1)[:, 0]
        kps = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        return kps, score

    flat_logits = kp_logits.reshape(b * d, hm, hm, k)
    flat_boxes = boxes.reshape(b * d, 4)
    kps, scores = jax.lax.map(per_det, (flat_logits, flat_boxes))
    return (kps.reshape(b, d, k, 3), scores.reshape(b, d, k))


@dataclasses.dataclass(frozen=True)
class KeypointRCNNConfig:
    num_classes: int = 2           # person vs background (coco_kp)
    num_keypoints: int = 17
    rpn: RPN.RPNConfig = RPN.RPNConfig()
    roi: RH.RoIHeadsConfig = RH.RoIHeadsConfig(num_classes=2)
    resnet_layers: tuple = (3, 4, 6, 3)
    keypoint_pool_size: tuple = (14, 14)
    kp_head_layers: int = 8
    kp_head_features: int = 512
    backbone_fused: str = "off"  # fused eval bottlenecks (resnet.py)


class KeypointRCNN(nn.Module):
    """Faster R-CNN graph + keypoint branch in one jit region
    (torchvision keypoint_rcnn.py assembly; branch semantics
    roi_heads.py:186-379)."""

    cfg: KeypointRCNNConfig = KeypointRCNNConfig()
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
        self.kp_head = KeypointRCNNHeads(
            layers=self.cfg.kp_head_layers,
            features=self.cfg.kp_head_features, dtype=self.dtype,
            name="kp_head")
        self.kp_predictor = KeypointRCNNPredictor(
            self.cfg.num_keypoints, dtype=self.dtype, name="kp_predictor")

    def _kp_branch(self, feats, boxes, img_h, img_w, b):
        pooled = pool_multiscale(
            tuple(feats[:4]), boxes, (img_h, img_w),
            self.cfg.keypoint_pool_size,
            method=self.cfg.roi.pooler_method)
        kl = self.kp_predictor(self.kp_head(
            pooled.reshape((-1,) + pooled.shape[2:])))
        hm = kl.shape[1]
        return kl.reshape(b, -1, hm, hm,
                          self.cfg.num_keypoints).astype(jnp.float32)

    def __call__(self, images, gt_boxes=None, gt_labels=None,
                 gt_valid=None, gt_keypoints=None, train: bool = False,
                 tfidf=None, class_weights=None):
        """gt_keypoints: [B, M, K, 3] absolute (x, y, vis) per GT box.

        Train -> loss dict (+loss_keypoint); eval -> (boxes, scores,
        labels, valid, keypoints [B, D, K, 3], kp_scores [B, D, K]).
        """
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
            kp_logits = self._kp_branch(feats, roi_boxes, img_h, img_w, b)
            loss_keypoint = keypointrcnn_loss(
                kp_logits, roi_boxes, gt_keypoints, s_matched, s_pos)
            return {**det_losses, **rpn_losses,
                    "loss_keypoint": loss_keypoint}

        boxes, scores, labels, valid = RH.postprocess_detections(
            class_logits, box_regression, roi_boxes, prop_valid,
            (img_h, img_w), cfg.roi,
            tfidf_post=1.0 if tfidf is None else tfidf)
        kp_logits = self._kp_branch(feats, boxes, img_h, img_w, b)
        keypoints, kp_scores = heatmaps_to_keypoints_exact(
            kp_logits, boxes)
        return boxes, scores, labels, valid, keypoints, kp_scores
