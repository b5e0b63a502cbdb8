"""RoI heads (box branch) for Faster/Mask R-CNN — Flax + functional.

Parity with `torchvision_models/tvision/roi_heads.py`:
* TwoMLPHead / FastRCNNPredictor (`tvision/frcnn.py:243-289`): flatten
  7x7x256 -> fc1024 -> fc1024 -> (C+1 class logits, 4(C+1) box deltas).
* select_training_samples (:688-713): append GT to proposals, match with
  Matcher(0.5, 0.5, no low-quality), labels = gt class / 0 bg / -1
  ignored, balanced-sample 512 @ 0.25, encode regression targets with
  weights (10, 10, 5, 5).
* fastrcnn_loss (:24-96): selectable ce / bce / focal_loss / gombit /
  gombit_fl classification (bce-family zeroes the background column and
  sum-normalizes by sample count; gombit clamps logits-1.96 to [-3, 5] and
  uses the Gompertz link exp(-exp(-x))), plus smooth-L1 (sum / num
  samples) on the matched class's box deltas.
* postprocess_detections (:715-781): per-class decode, score via
  softmax/sigmoid/gombit on tfidf_post-scaled logits, drop background,
  score threshold, drop boxes smaller than 1e-2, class-aware NMS, top-k.

TPU design: proposals stay padded [B, P(+M)] with masks; the sampled
training subset is a fixed-size gather of ``batch_size_per_image`` slots.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from object_detectors_tpu.ops import boxes as box_ops
from object_detectors_tpu.ops import losses as L
from object_detectors_tpu.ops import matcher as M
from object_detectors_tpu.ops import nms as N
from object_detectors_tpu.ops import selection as SEL
from object_detectors_tpu.ops import sampler as S


@dataclasses.dataclass(frozen=True)
class RoIHeadsConfig:
    num_classes: int = 91          # including background at index 0
    fg_iou_thresh: float = 0.5
    bg_iou_thresh: float = 0.5
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    box_weights: tuple = (10.0, 10.0, 5.0, 5.0)
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_img: int = 100
    # candidates entering NMS after the (proposal, class) flatten —
    # greedy NMS only ever consults higher-scored boxes, so keeping the
    # top-k prefix is exact as long as >= detections_per_img survivors
    # live inside it; under prefix starvation the degradation is
    # one-sided truncation of the lowest-ranked detections, never
    # wrong/reordered boxes (tests/test_pre_nms_cap.py). Without the
    # cap the O(N^2) IoU matrix explodes (1000 proposals x 1202 LVIS
    # classes = 1.2M pairs).
    pre_nms_candidates: int = 1000
    loss_type: str = "ce"          # ce|bce|focal_loss|gombit|gombit_fl
    pool_size: tuple = (7, 7)
    # pool_multiscale dispatch: auto | pallas | pallas_tiled | canvas
    pooler_method: str = "auto"
    # tf-idf minibatch recompute (roi_heads.py:801-809 / train.py:115):
    # when True the training logit scale is log((B+1)/(df_batch+1))+1
    # from the batch's per-image class presence, replacing the dataset
    # tfidf vector; tfidf_norm (0 = off, else the p of an Lp norm)
    # normalizes the recomputed vector like the reference.
    tfidf_mini_batch: bool = False
    tfidf_norm: int = 0


class TwoMLPHead(nn.Module):
    representation_size: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], x.shape[1], -1)  # [B, P, 7*7*C]
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                             param_dtype=jnp.float32, name="fc6")(x))
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                             param_dtype=jnp.float32, name="fc7")(x))
        return x


class FastRCNNPredictor(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(self.num_classes,
                          kernel_init=nn.initializers.normal(0.01),
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4,
                          kernel_init=nn.initializers.normal(0.001),
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="bbox_pred")(x)
        return scores, deltas


def _select_per_image(proposals, prop_valid, gt_boxes, gt_labels, gt_valid,
                      key, cfg: RoIHeadsConfig):
    """roi_heads.select_training_samples for one image, static shapes.

    Returns fixed-size [S] sampled (boxes, labels, reg_targets, pos_mask,
    sampled_mask) with S = batch_size_per_image.
    """
    # append GT to proposals (roi_heads.py:666-671)
    all_boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
    all_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)

    quality = box_ops.pairwise_iou(gt_boxes, all_boxes)
    # invalid proposals must never match fg: kill their quality
    quality = jnp.where(all_valid[None, :], quality, -1.0)
    matched = M.match(quality, gt_valid, cfg.fg_iou_thresh,
                      cfg.bg_iou_thresh, allow_low_quality_matches=False)
    midx = jnp.clip(matched, 0)
    labels = gt_labels[midx]
    labels = jnp.where(matched == M.BELOW_LOW_THRESHOLD, 0, labels)
    labels = jnp.where(matched == M.BETWEEN_THRESHOLDS, -1, labels)
    labels = jnp.where(all_valid, labels, -1)  # padding: ignore

    pos_mask, neg_mask = S.balanced_sample(
        labels, key, cfg.batch_size_per_image, cfg.positive_fraction)
    sampled = pos_mask | neg_mask

    # fixed-size gather: order sampled entries first (pos then neg)
    k1, _ = jax.random.split(key)
    tie = jax.random.uniform(k1, labels.shape) * 0.5
    rank_key = pos_mask * 2.0 + neg_mask * 1.0 + tie
    order = jnp.argsort(-rank_key)[: cfg.batch_size_per_image]

    s_boxes = all_boxes[order]
    s_labels = labels[order]
    s_matched = midx[order]
    s_pos = pos_mask[order]
    s_sampled = sampled[order]

    matched_gt = gt_boxes[s_matched]
    reg_targets = box_ops.encode_boxes(matched_gt, s_boxes, cfg.box_weights)
    # Non-positive samples may have degenerate matched boxes (background
    # images match the zero-padding GT) -> +/-inf encodings. The box loss
    # only reads positive rows, but inf * 0 = NaN, so zero them here.
    reg_targets = jnp.where(s_pos[:, None], jnp.nan_to_num(reg_targets), 0.0)
    s_labels = jnp.where(s_sampled, s_labels, 0)
    # s_matched is the matcher's GT index per sample — mask/keypoint
    # branches reuse it (roi_heads.py:841-849 reuses matched_idxs) instead
    # of re-deriving by a fresh argmax that can disagree on ties.
    return s_boxes, s_labels, reg_targets, s_pos, s_sampled, s_matched


@partial(jax.jit, static_argnames=("cfg",))
def select_training_samples(
    proposals: jnp.ndarray,   # [B, P, 4]
    prop_valid: jnp.ndarray,  # [B, P]
    gt_boxes: jnp.ndarray,    # [B, M, 4]
    gt_labels: jnp.ndarray,   # [B, M] (1-based classes; 0 = background)
    gt_valid: jnp.ndarray,    # [B, M]
    key: jax.Array,
    cfg: RoIHeadsConfig,
):
    keys = jax.random.split(key, proposals.shape[0])
    return jax.vmap(_select_per_image,
                    (0, 0, 0, 0, 0, 0, None))(
        proposals, prop_valid, gt_boxes, gt_labels, gt_valid, keys, cfg)


def training_tfidf_scale(gt_labels, gt_valid, cfg: RoIHeadsConfig,
                         tfidf=None):
    """The logit scale applied inside the training classification loss:
    the dataset tfidf vector (roi_heads.py:826 `self.tfidf*class_logits`),
    or — when cfg.tfidf_mini_batch — the per-batch recompute
    log((B+1)/(df+1))+1 with optional Lp normalization
    (roi_heads.py:801-809)."""
    if cfg.tfidf_mini_batch:
        from object_detectors_tpu.data.idf import minibatch_idf

        scale = minibatch_idf(gt_labels, gt_valid, cfg.num_classes)
        if cfg.tfidf_norm:
            scale = scale / jnp.linalg.norm(scale, ord=cfg.tfidf_norm)
        return scale
    return 1.0 if tfidf is None else tfidf


def _gombit_prob(logits):
    """Gompertz-link probability (roi_heads.py:61-64): clamp(x-1.96) to
    [-3, 5], p = exp(-exp(-x))."""
    x = jnp.clip(logits - 1.96, -3.0, 5.0)
    return jnp.exp(-jnp.exp(-x))


@partial(jax.jit, static_argnames=("cfg",))
def fastrcnn_loss(
    class_logits: jnp.ndarray,    # [B, S, C] (tf-idf scaling by caller)
    box_regression: jnp.ndarray,  # [B, S, C*4]
    labels: jnp.ndarray,          # [B, S] int (0 = background)
    reg_targets: jnp.ndarray,     # [B, S, 4]
    sampled_mask: jnp.ndarray,    # [B, S]
    cfg: RoIHeadsConfig,
    class_weights: jnp.ndarray | None = None,
):
    """-> dict(loss_classifier, loss_box_reg). Normalizations follow the
    reference: everything divides by the total sample count."""
    bsz, s, c = class_logits.shape
    num_sampled = jnp.maximum(jnp.sum(sampled_mask), 1).astype(
        class_logits.dtype)
    smask = sampled_mask.astype(class_logits.dtype)

    if cfg.loss_type == "ce":
        cls_loss = L.weighted_ce_mean(
            class_logits.reshape(-1, c), labels.reshape(-1),
            class_weights if class_weights is not None
            else jnp.ones((c,), class_logits.dtype),
            sample_mask=smask.reshape(-1))
    else:
        onehot = jax.nn.one_hot(labels, c, dtype=class_logits.dtype)
        onehot = onehot.at[..., 0].set(0.0)  # background column zeroed
        if cfg.loss_type == "bce":
            el = L.sigmoid_binary_cross_entropy(class_logits, onehot)
        elif cfg.loss_type == "focal_loss":
            el = L.sigmoid_focal_loss(class_logits, onehot)
        else:  # gombit family
            p = jnp.clip(_gombit_prob(class_logits), 1e-7, 1 - 1e-7)
            el = -(onehot * jnp.log(p) + (1 - onehot) * jnp.log1p(-p))
            if cfg.loss_type.endswith("fl"):
                p_t = p * onehot + (1 - p) * (1 - onehot)
                alpha_t = 0.25 * onehot + 0.75 * (1 - onehot)
                el = alpha_t * el * (1 - p_t) ** 2
        cls_loss = jnp.sum(el * smask[..., None]) / num_sampled

    # box loss over positive samples at the GT class's delta slot
    reg = box_regression.reshape(bsz, s, c, 4)
    lab_c = jnp.clip(labels, 0)
    reg_at_label = jnp.take_along_axis(
        reg, lab_c[..., None, None].astype(jnp.int32), axis=2)[:, :, 0]
    pos = (labels > 0).astype(class_logits.dtype) * smask
    box_l = L.smooth_l1_loss(reg_at_label, reg_targets).sum(-1)
    box_loss = jnp.sum(box_l * pos) / num_sampled
    return {"loss_classifier": cls_loss, "loss_box_reg": box_loss}


@partial(jax.jit, static_argnames=("cfg", "image_size"))
def postprocess_detections(
    class_logits: jnp.ndarray,    # [B, P, C]
    box_regression: jnp.ndarray,  # [B, P, C*4]
    proposals: jnp.ndarray,       # [B, P, 4]
    prop_valid: jnp.ndarray,      # [B, P]
    image_size: tuple,
    cfg: RoIHeadsConfig,
    tfidf_post: jnp.ndarray | float = 1.0,
):
    """-> (boxes [B,D,4], scores [B,D], labels [B,D] 1-based, valid)."""
    bsz, p, c = class_logits.shape

    def per_image(logits, reg, props, pvalid):
        scaled = logits * tfidf_post
        if cfg.loss_type == "ce":
            scores = jax.nn.softmax(scaled, -1)
        elif cfg.loss_type.startswith("gombit"):
            scores = _gombit_prob(scaled)
        else:
            scores = jax.nn.sigmoid(scaled)
        # drop background column, flatten (proposal, class) pairs;
        # select the NMS candidates FIRST, decode boxes only for them
        # (exact: box validity (small-box) can only drop candidates, and
        # greedy NMS never consults anything below the kept prefix)
        fscores = scores[:, 1:].reshape(-1)
        fvalid = jnp.broadcast_to(pvalid[:, None], (p, c - 1)).reshape(-1)
        fvalid &= fscores > cfg.score_thresh
        cap = min(cfg.pre_nms_candidates, fscores.shape[0])
        # exact radix top-k (1000-of-90k on COCO, -of-1.2M on LVIS);
        # set selection — batched_nms below re-sorts by score
        topv, topi = SEL.radix_topk(
            jnp.where(fvalid, fscores, -jnp.inf), cap)
        prop_idx = topi // (c - 1)
        cls_idx = topi % (c - 1) + 1  # skip background column
        sel_reg = jnp.take_along_axis(
            reg.reshape(p, c, 4)[prop_idx], cls_idx[:, None, None], axis=1
        )[:, 0]
        sel_boxes = box_ops.decode_boxes(
            sel_reg, props[prop_idx], cfg.box_weights)
        sel_boxes = box_ops.clip_boxes_to_image(sel_boxes, image_size)
        valid = jnp.isfinite(topv) & box_ops.small_box_mask(
            sel_boxes, 1e-2)
        ob, osc, olab, _, ovalid = N.batched_nms(
            sel_boxes, jnp.where(valid, topv, 0.0),
            cls_idx.astype(jnp.int32), cfg.nms_thresh,
            cfg.detections_per_img, valid)
        return ob, osc, olab, ovalid

    return jax.vmap(per_image)(class_logits, box_regression, proposals,
                               prop_valid)
