"""SSD300-VGG16 in Flax + functional loss/postprocess.

Parity with `torchvision_models/tvision/ssd.py:111-617`:
* VGG16 extractor (:434-541): conv layers through conv4_3 (maxpool3 with
  ceil_mode) -> L2-normalized, x20-scaled 38x38 map; conv5 block +
  dilated conv6 (1024, d=6) + conv7 1x1 -> 19x19; extra blocks conv8_2
  (s2, 512) / conv9_2 (s2, 256) / conv10_2 / conv11_2 (valid 3x3, 256).
* SSDHead (:41-110): per-level 3x3 classification (A*(C)) and regression
  (A*4) convs; flattened (h, w, a) like the reference's permutes.
* SSDMatcher(0.5) with per-GT forced best match (`_utils.py:347-361` —
  see ops.matcher.ssd_match).
* compute_loss (:232-304): smooth-L1 sum over foreground / N; CE over
  tf-idf-scaled logits with hard-negative mining at 3:1 via the
  double-argsort rank trick; both normalized by total foreground count.
* postprocess (:386-431): softmax scores, per-class threshold 0.01 ->
  top-400/class -> class-aware NMS 0.45 -> top 200.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from object_detectors_tpu.ops import boxes as box_ops
from object_detectors_tpu.ops import losses as L
from object_detectors_tpu.ops import matcher as M
from object_detectors_tpu.ops import nms as N


@dataclasses.dataclass(frozen=True)
class SSDConfig:
    num_classes: int = 91
    iou_thresh: float = 0.5
    score_thresh: float = 0.01
    nms_thresh: float = 0.45
    detections_per_img: int = 200
    topk_candidates: int = 400
    neg_to_pos_ratio: int = 3
    box_weights: tuple = (10.0, 10.0, 5.0, 5.0)
    # per-minibatch tf-idf recompute (ssd.py:269-278), like RetinaNet's
    tfidf_mini_batch: bool = False
    tfidf_norm: int = 0
    # NMS input cap (0 = auto: 4*detections_per_img + topk_candidates).
    # Exact as long as >= detections_per_img greedy-NMS survivors fall in
    # the top-scored prefix; raise for pathologically overlapping scenes.
    nms_candidates_cap: int = 0


def _conv(f, k, name, strides=1, padding="SAME", dilation=1, dtype=jnp.float32):
    pad = padding if isinstance(padding, str) else ((padding, padding),) * 2
    return nn.Conv(f, (k, k), strides=(strides, strides), padding=pad,
                   kernel_dilation=(dilation, dilation), dtype=dtype,
                   param_dtype=jnp.float32, name=name)


class VGGFeatureExtractor(nn.Module):
    """VGG16 trunk producing the 6 SSD300 feature maps."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg_blocks = [(64, 2), (128, 2), (256, 3), (512, 3)]
        for bi, (f, reps) in enumerate(cfg_blocks):
            for r in range(reps):
                x = nn.relu(_conv(f, 3, f"conv{bi+1}_{r+1}",
                                  dtype=self.dtype)(x))
            if bi < 2:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif bi == 2:
                # maxpool3 ceil_mode=True: pad to even before pooling
                h, w = x.shape[1], x.shape[2]
                ph, pw = h % 2, w % 2
                if ph or pw:
                    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                mode="edge")
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # conv4_3 output with L2 norm + learned scale (init 20)
        scale = self.param("scale_weight",
                           lambda k, s: jnp.full(s, 20.0, jnp.float32),
                           (512,))
        norm = jnp.sqrt(jnp.sum(
            x.astype(jnp.float32) ** 2, -1, keepdims=True)) + 1e-12
        f38 = (x / norm.astype(x.dtype)) * scale.astype(x.dtype)

        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for r in range(3):
            x = nn.relu(_conv(512, 3, f"conv5_{r}", dtype=self.dtype)(x))
        x = nn.max_pool(x, (3, 3), strides=(1, 1),
                        padding=((1, 1), (1, 1)))
        x = nn.relu(_conv(1024, 3, "conv6", dilation=6,
                          dtype=self.dtype)(x))
        f19 = nn.relu(_conv(1024, 1, "conv7", dtype=self.dtype)(x))

        x = nn.relu(_conv(256, 1, "conv8_1", dtype=self.dtype)(f19))
        f10 = nn.relu(_conv(512, 3, "conv8_2", strides=2,
                            dtype=self.dtype)(x))
        x = nn.relu(_conv(128, 1, "conv9_1", dtype=self.dtype)(f10))
        f5 = nn.relu(_conv(256, 3, "conv9_2", strides=2,
                           dtype=self.dtype)(x))
        x = nn.relu(_conv(128, 1, "conv10_1", dtype=self.dtype)(f5))
        f3 = nn.relu(_conv(256, 3, "conv10_2", padding="VALID",
                           dtype=self.dtype)(x))
        x = nn.relu(_conv(128, 1, "conv11_1", dtype=self.dtype)(f3))
        f1 = nn.relu(_conv(256, 3, "conv11_2", padding="VALID",
                           dtype=self.dtype)(x))
        return [f38, f19, f10, f5, f3, f1]


class SSDHead(nn.Module):
    num_classes: int
    anchors_per_loc: Sequence[int] = (4, 6, 6, 6, 4, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features):
        cls_out, reg_out = [], []
        for i, (f, a) in enumerate(zip(features, self.anchors_per_loc)):
            b = f.shape[0]
            c = _conv(a * self.num_classes, 3, f"cls{i}",
                      dtype=self.dtype)(f)
            cls_out.append(c.reshape(b, -1, self.num_classes))
            r = _conv(a * 4, 3, f"reg{i}", dtype=self.dtype)(f)
            reg_out.append(r.reshape(b, -1, 4))
        level_sizes = tuple(c.shape[1] for c in cls_out)
        return (jnp.concatenate(cls_out, 1), jnp.concatenate(reg_out, 1),
                level_sizes)


class SSD300(nn.Module):
    cfg: SSDConfig = SSDConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        feats = VGGFeatureExtractor(dtype=self.dtype,
                                    name="backbone")(images, train)
        return SSDHead(self.cfg.num_classes, dtype=self.dtype,
                       name="head")(feats)


@partial(jax.jit, static_argnames=("cfg",))
def ssd_loss(
    cls_logits: jnp.ndarray,   # [B, A, C] f32
    bbox_reg: jnp.ndarray,     # [B, A, 4]
    anchors: jnp.ndarray,      # [A, 4] xyxy
    gt_boxes: jnp.ndarray,     # [B, M, 4] xyxy
    gt_labels: jnp.ndarray,    # [B, M] 1-based (0 = background)
    gt_valid: jnp.ndarray,
    cfg: SSDConfig,
    tfidf: jnp.ndarray | float = 1.0,
):
    b, a, c = cls_logits.shape
    if cfg.tfidf_mini_batch:
        from object_detectors_tpu.data.idf import minibatch_idf

        tfidf = minibatch_idf(gt_labels, gt_valid, c)
        if cfg.tfidf_norm:
            tfidf = tfidf / jnp.linalg.norm(tfidf, ord=cfg.tfidf_norm)

    def match_img(gb, gv):
        q = box_ops.pairwise_iou(gb, anchors)
        return M.ssd_match(q, gv, cfg.iou_thresh)

    matched = jax.vmap(match_img)(gt_boxes, gt_valid)  # [B, A]
    fg = matched >= 0
    num_fg = jnp.maximum(jnp.sum(fg), 1).astype(cls_logits.dtype)

    midx = jnp.clip(matched, 0)
    mboxes = jnp.take_along_axis(gt_boxes, midx[..., None], 1)
    reg_t = box_ops.encode_boxes(mboxes, anchors[None], cfg.box_weights)
    reg_t = jnp.where(fg[..., None], jnp.nan_to_num(reg_t), 0.0)
    box_l = L.smooth_l1_loss(bbox_reg, reg_t).sum(-1)
    bbox_loss = jnp.sum(box_l * fg) / num_fg

    cls_t = jnp.where(fg, jnp.take_along_axis(gt_labels, midx, 1), 0)
    ce = L.softmax_cross_entropy(cls_logits * tfidf, cls_t)  # [B, A]

    # hard negative mining (double argsort rank), per image
    neg_inf = jnp.asarray(-jnp.inf, ce.dtype)
    neg_loss = jnp.where(fg, neg_inf, ce)
    order = jnp.argsort(-neg_loss, axis=1)
    rank = jnp.argsort(order, axis=1)
    num_neg = cfg.neg_to_pos_ratio * jnp.sum(fg, axis=1, keepdims=True)
    bg = rank < num_neg
    cls_loss = (jnp.sum(ce * fg) + jnp.sum(jnp.where(bg & ~fg, ce, 0.0))) \
        / num_fg
    return {"bbox_regression": bbox_loss, "classification": cls_loss}


@partial(jax.jit, static_argnames=("cfg", "image_size"))
def ssd_postprocess(
    cls_logits: jnp.ndarray,
    bbox_reg: jnp.ndarray,
    anchors: jnp.ndarray,
    image_size: tuple,
    cfg: SSDConfig,
    tfidf_post: jnp.ndarray | float = 1.0,
):
    """-> (boxes [B,D,4], scores [B,D], labels [B,D], valid [B,D])."""
    bsz, a, c = cls_logits.shape
    k = min(cfg.topk_candidates, a)
    return jax.vmap(
        lambda lg, rg: _post_one(lg, rg, anchors, image_size, cfg,
                                 tfidf_post, k))(cls_logits, bbox_reg)


def _post_one(logits, reg, anchors, image_size, cfg, tfidf_post, k):
    c = logits.shape[-1]
    scores = jax.nn.softmax(logits * tfidf_post, -1)
    boxes = box_ops.decode_boxes(reg, anchors, cfg.box_weights)
    boxes = box_ops.clip_boxes_to_image(boxes, image_size)
    sc = scores[:, 1:]
    masked = jnp.where(sc > cfg.score_thresh, sc, -jnp.inf)
    topv, topi = jax.lax.top_k(masked.T, k)
    flat_scores = topv.reshape(-1)
    flat_boxes = boxes[topi.reshape(-1)]
    flat_labels = jnp.repeat(jnp.arange(1, c, dtype=jnp.int32), k)
    valid = jnp.isfinite(flat_scores)
    # cap the NMS input to a global top-k prefix — exact for greedy NMS
    # as long as >= detections_per_img survivors are inside it; without
    # it the (C-1)*topk candidate set (481k on LVIS) makes the O(N^2)
    # IoU matrix intractable.
    cap = min(cfg.nms_candidates_cap
              or 4 * cfg.detections_per_img + cfg.topk_candidates,
              flat_scores.shape[0])
    gv, gi = jax.lax.top_k(jnp.where(valid, flat_scores, -jnp.inf), cap)
    ob, osc, olab, _, ovalid = N.batched_nms(
        flat_boxes[gi], jnp.where(jnp.isfinite(gv), gv, 0.0),
        flat_labels[gi], cfg.nms_thresh,
        cfg.detections_per_img, jnp.isfinite(gv))
    return ob, osc, olab, ovalid
