"""Faster R-CNN (ResNet-50-FPN) — the two-stage orchestrator.

Parity with `torchvision_models/tvision/generalized_rcnn.py:13-111` +
`frcnn.py:28-376`: backbone -> RPN -> RoIAlign -> TwoMLPHead ->
FastRCNNPredictor, training returns the 4-loss dict
{loss_classifier, loss_box_reg, loss_objectness, loss_rpn_box_reg},
eval returns fixed-size detections.

TPU design: the entire graph (both stages, including proposal NMS and
sampling) is ONE jit region with static shapes: proposals are padded to
post_nms_top_n, the training subset to batch_size_per_image. Sampling
randomness comes from a flax 'sampler' RNG.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from object_detectors_tpu.models import anchors as anchor_lib
from object_detectors_tpu.models import roi_heads as RH
from object_detectors_tpu.models import rpn as RPN
from object_detectors_tpu.models.resnet import BackboneWithFPN, ResNet
from object_detectors_tpu.ops import boxes as box_ops
from object_detectors_tpu.ops.roi_align import pool_multiscale


@dataclasses.dataclass(frozen=True)
class FasterRCNNConfig:
    num_classes: int = 91
    rpn: RPN.RPNConfig = RPN.RPNConfig()
    roi: RH.RoIHeadsConfig = RH.RoIHeadsConfig()
    resnet_layers: tuple = (3, 4, 6, 3)
    backbone_fused: str = "off"  # fused eval bottlenecks (resnet.py)


class FasterRCNN(nn.Module):
    cfg: FasterRCNNConfig = FasterRCNNConfig()
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

    def __call__(self, images, gt_boxes=None, gt_labels=None, gt_valid=None,
                 train: bool = False, tfidf=None, class_weights=None):
        """images [B, H, W, 3]. Train mode needs gt_* and a 'sampler' rng.

        tfidf: optional [num_classes] logit-scale vector (the reference's
        tfidf['values'], roi_heads.py:571-572) — scales the class logits
        in the training loss and in eval postprocess (tfidf_post).
        class_weights: optional [num_classes] CE weights (CSL,
        train.py:121-135 / roi_heads.py:827).

        Returns train: loss dict; eval: (boxes, scores, labels, valid).
        """
        cfg = self.cfg
        b, img_h, img_w, _ = images.shape
        feats = self.backbone(images, train)
        # RPN consumes all levels incl. the pooled P6 (rpn.py:344)
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
            s_boxes, s_labels, reg_targets, s_pos, s_sampled, _ = (
                RH.select_training_samples(
                    prop_boxes, prop_valid, gt_boxes, gt_labels, gt_valid,
                    k_roi, cfg.roi))
            roi_boxes = s_boxes
        else:
            roi_boxes = prop_boxes

        # RoIAlign over FPN levels P2..P5 (not the pooled P6, frcnn.py:208)
        # — Pallas window kernel on TPU, XLA canvas gather elsewhere
        pooled = pool_multiscale(
            tuple(feats[:4]), roi_boxes, (img_h, img_w),
            cfg.roi.pool_size,
            method=cfg.roi.pooler_method).astype(self.dtype)

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
            return {**det_losses, **rpn_losses}

        # tfidf_post is the dataset vector even under minibatch training
        # (roi_heads.py:571 clones tfidf['values'] before any recompute)
        return RH.postprocess_detections(
            class_logits, box_regression, roi_boxes, prop_valid,
            (img_h, img_w), cfg.roi,
            tfidf_post=1.0 if tfidf is None else tfidf)
