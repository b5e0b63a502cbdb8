"""Region Proposal Network — Flax head + functional proposal filtering and
loss, all static shapes.

Parity with `torchvision_models/tvision/rpn.py:104-370`:
* RPNHead (:30-61): shared 3x3 conv -> 1x1 objectness (A) and 1x1 deltas
  (4A) per level; flattened in (h, w, a) order like
  concat_box_prediction_layers (:64-101).
* filter_proposals (:230-280): decode (no grad), per-level top-k pre-NMS,
  clip to image, drop boxes with a side < 1e-3, score threshold, NMS done
  independently per level (batched_nms over level ids), post-NMS top-n.
* assign_targets_to_anchors (:179-213): Matcher(0.7, 0.3,
  allow_low_quality=True); labels 1 fg / 0 bg / -1 discard.
* compute_loss (:282-318): balanced 256@0.5 sample per image; smooth-L1
  (beta=1/9, sum) over positives / total sampled count across the batch;
  BCE mean over all sampled.

TPU design: proposals are a fixed ``post_nms_top_n`` per image with a
validity mask; the per-image Python loops become vmap; sampling uses
jax PRNG keys.
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
from object_detectors_tpu.ops import selection as SEL
from object_detectors_tpu.ops import nms as N
from object_detectors_tpu.ops import sampler as S


@dataclasses.dataclass(frozen=True)
class RPNConfig:
    fg_iou_thresh: float = 0.7
    bg_iou_thresh: float = 0.3
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    pre_nms_top_n_train: int = 2000
    pre_nms_top_n_test: int = 1000
    post_nms_top_n_train: int = 2000
    post_nms_top_n_test: int = 1000
    nms_thresh: float = 0.7
    score_thresh: float = 0.0
    min_size: float = 1e-3
    box_weights: tuple = (1.0, 1.0, 1.0, 1.0)


class RPNHead(nn.Module):
    """Shared conv tower across levels (rpn.py:30-61).

    ``packed=True`` runs the tower ONCE over all levels packed into a
    gap-separated canvas (models/retinanet._pack_layout): one 3x3 conv
    whose level-edge outputs read only the zero gap (exactly the
    per-level zero-padding), then 1x1 heads which cannot leak."""

    num_anchors: int = 3
    in_channels: int = 256
    dtype: Any = jnp.float32
    packed: bool = True

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        conv = nn.Conv(self.in_channels, (3, 3), padding=((1, 1), (1, 1)),
                       kernel_init=nn.initializers.normal(0.01),
                       dtype=self.dtype, param_dtype=jnp.float32, name="conv")
        cls_logits = nn.Conv(self.num_anchors, (1, 1),
                             kernel_init=nn.initializers.normal(0.01),
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="cls_logits")
        bbox_pred = nn.Conv(self.num_anchors * 4, (1, 1),
                            kernel_init=nn.initializers.normal(0.01),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="bbox_pred")
        if self.packed:
            from object_detectors_tpu.models.retinanet import _pack_layout

            b = features[0].shape[0]
            shapes = [(f.shape[1], f.shape[2]) for f in features]
            ch, cw, places = _pack_layout(shapes)
            canvas = jnp.zeros((b, ch, cw, features[0].shape[-1]),
                               features[0].dtype)
            for f, (r, c, h, w) in zip(features, places):
                canvas = jax.lax.dynamic_update_slice(
                    canvas, f, (0, r, c, 0))
            t = nn.relu(conv(canvas))
            oc = cls_logits(t)
            rc = bbox_pred(t)
            obj, reg = [], []
            for (r, c, h, w) in places:
                o = jax.lax.slice(oc, (0, r, c, 0),
                                  (b, r + h, c + w, oc.shape[-1]))
                g = jax.lax.slice(rc, (0, r, c, 0),
                                  (b, r + h, c + w, rc.shape[-1]))
                obj.append(o.reshape(b, -1))
                reg.append(g.reshape(b, -1, 4))
            level_sizes = tuple(o.shape[1] for o in obj)
            return (jnp.concatenate(obj, 1), jnp.concatenate(reg, 1),
                    level_sizes)
        obj, reg = [], []
        for f in features:
            b = f.shape[0]
            t = nn.relu(conv(f))
            obj.append(cls_logits(t).reshape(b, -1))
            reg.append(bbox_pred(t).reshape(b, -1, 4))
        level_sizes = tuple(o.shape[1] for o in obj)
        return jnp.concatenate(obj, 1), jnp.concatenate(reg, 1), level_sizes


@partial(jax.jit, static_argnames=("cfg", "level_sizes", "image_size",
                                   "training", "debug", "fp_chunk",
                                   "fp_unroll", "topk_mode"))
def filter_proposals(
    proposals: jnp.ndarray,    # [B, A, 4] decoded xyxy
    objectness: jnp.ndarray,   # [B, A]
    level_sizes: tuple,
    image_size: tuple,
    cfg: RPNConfig,
    training: bool = False,
    debug: str = "full",
    fp_chunk: int = 256,
    fp_unroll: int = 2,
    topk_mode: str = "fused",
):
    """-> (boxes [B, P, 4], scores [B, P], valid [B, P]) with
    P = post_nms_top_n.

    ``debug`` truncates the pipeline for stage attribution in
    analysis/frcnn_ablate.py: "topk" stops after the per-level radix
    top-k + gathers, "nms" after the level-parallel fixed-point NMS,
    "full" (default) runs the post-NMS top-n merge. Truncated outputs
    keep the [P] shapes but are NOT valid proposals."""
    pre_n = cfg.pre_nms_top_n_train if training else cfg.pre_nms_top_n_test
    post_n = (cfg.post_nms_top_n_train if training
              else cfg.post_nms_top_n_test)
    objectness = jax.lax.stop_gradient(objectness)
    proposals = jax.lax.stop_gradient(proposals)

    def per_image(props, obj):
        # Per-level top-k, stacked [L, pre_n] with -inf padding where a
        # level has fewer anchors. NMS is independent per level
        # (torchvision batched_nms over level ids), so running the
        # fixed-point NMS level-parallel is exact AND shrinks the IoU
        # problem from [sum_l k_l]^2 to L x [pre_n]^2.
        #
        # topk_mode="batched" stacks all levels into one -inf-padded
        # [L, n_max] array and vmaps both radix stages (one 16-trip
        # kth-code chain instead of L). Exact either way, but MEASURED
        # LOSER here (queue_r5d: filter_topk 30.6 vs perlevel 28.6 ms
        # cumulative at bs16 640²): the RPN objectness rows are huge
        # (P2 alone is 76.8k), so the 3.7x padded reduce bytes cost
        # more than the saved trip latency. (RetinaNet's batched
        # select lost its serve-pipeline A/B too: 339.3 vs 382.3
        # img/s, queue_r5e.) The "fused" default below keeps the
        # per-level unpadded structure and fuses ONLY the kth-code
        # chains.
        n_max = max(level_sizes)
        starts = [0]
        for ls in level_sizes[:-1]:
            starts.append(starts[-1] + ls)
        if topk_mode == "batched":
            rows = [
                jnp.pad(jax.lax.dynamic_slice_in_dim(obj, s0, ls, 0),
                        (0, n_max - ls), constant_values=-jnp.inf)
                for s0, ls in zip(starts, level_sizes)
            ]
            stacked = jnp.stack(rows)                   # [L, n_max]
            k = min(pre_n, n_max)
            topv, topi = jax.vmap(partial(SEL.radix_topk, k=k))(stacked)
            if k < pre_n:
                nl = len(level_sizes)
                topv = jnp.concatenate(
                    [topv,
                     jnp.full((nl, pre_n - k), -jnp.inf, topv.dtype)],
                    axis=1)
                topi = jnp.concatenate(
                    [topi, jnp.zeros((nl, pre_n - k), topi.dtype)],
                    axis=1)
            # level-local -> flat anchor ids; -inf slots may index past
            # their level (clipped) — their gathered box is masked by
            # the isfinite keep below.
            flat_idx = jnp.clip(
                jnp.asarray(starts, jnp.int32)[:, None] + topi,
                0, props.shape[0] - 1)
            boxes = props[flat_idx.reshape(-1)].reshape(
                len(level_sizes), pre_n, 4)             # [L, pre_n, 4]
            logits = topv                               # [L, pre_n]
        else:
            # "fused" (default): per-level UNPADDED selects but ONE
            # kth-code trip chain for all levels (radix_topk_multi) —
            # the search is latency-bound on L sequential chains (80
            # trips at 5 levels/f32), while the pack stage stays
            # per-level so no padded-row sort bytes (the "batched"
            # loser above). "perlevel" = the r4 path, kept for A/Bs.
            obs, prs, kss = [], [], []
            for s0, ls in zip(starts, level_sizes):
                obs.append(jax.lax.dynamic_slice_in_dim(obj, s0, ls, 0))
                prs.append(jax.lax.dynamic_slice_in_dim(props, s0, ls,
                                                        0))
                kss.append(min(pre_n, ls))
            if topk_mode == "fused":
                tops = SEL.radix_topk_multi(tuple(obs), tuple(kss))
            else:
                tops = [SEL.radix_topk(ob, k)
                        for ob, k in zip(obs, kss)]
            sel_boxes, sel_scores = [], []
            for (topv, topi), pr, k in zip(tops, prs, kss):
                if k < pre_n:
                    topv = jnp.concatenate(
                        [topv, jnp.full((pre_n - k,), -jnp.inf,
                                        topv.dtype)])
                    topi = jnp.concatenate(
                        [topi, jnp.zeros((pre_n - k,), topi.dtype)])
                sel_boxes.append(pr[topi])
                sel_scores.append(topv)
            boxes = jnp.stack(sel_boxes)                # [L, pre_n, 4]
            logits = jnp.stack(sel_scores)              # [L, pre_n]
        scores = jax.nn.sigmoid(logits)

        boxes = box_ops.clip_boxes_to_image(boxes, image_size)
        keep = box_ops.small_box_mask(boxes, cfg.min_size)
        keep &= (scores >= cfg.score_thresh) & jnp.isfinite(logits)

        masked = jnp.where(keep, scores, -jnp.inf)
        if debug == "topk":
            fb = boxes.reshape(-1, 4)[:post_n]
            fs = masked.reshape(-1)[:post_n]
            return fb, fs, jnp.isfinite(fs)
        kept, _ = jax.vmap(
            lambda bx, sc: N._fixedpoint_keep(
                bx, sc, cfg.nms_thresh, chunk=fp_chunk,
                unroll=fp_unroll))(boxes, masked)       # [L, pre_n]
        # merge: post_nms_top_n over all levels' survivors by score
        # (rpn.py:276-280 keeps batched_nms order then slices top-n).
        # radix set-select: every downstream consumer (pooler tile sort,
        # per-proposal heads, score-based caps) is proposal-order
        # independent, so the score-DESC order of the old top_k is not
        # needed — only the exact survivor set.
        flat_scores = jnp.where(kept, masked, -jnp.inf).reshape(-1)
        if debug == "nms":
            fb = boxes.reshape(-1, 4)[:post_n]
            fs = flat_scores[:post_n]
            return fb, fs, jnp.isfinite(fs)
        topv, topi = SEL.radix_topk(flat_scores, post_n)
        ovalid = jnp.isfinite(topv)
        ob2 = jnp.where(ovalid[:, None],
                        boxes.reshape(-1, 4)[topi], 0.0)
        osc = jnp.where(ovalid, topv, 0.0)
        return ob2, osc, ovalid

    return jax.vmap(per_image)(proposals, objectness)


def _assign_per_image(gt_boxes, gt_valid, anchors, cfg: RPNConfig):
    quality = box_ops.pairwise_iou(gt_boxes, anchors)
    matched = M.match(quality, gt_valid, cfg.fg_iou_thresh,
                      cfg.bg_iou_thresh, allow_low_quality_matches=True)
    labels = jnp.where(matched >= 0, 1.0, 0.0)
    labels = jnp.where(matched == M.BETWEEN_THRESHOLDS, -1.0, labels)
    # background image (all gt invalid): torchvision labels everything 0
    no_gt = ~jnp.any(gt_valid)
    labels = jnp.where(no_gt, 0.0, labels)
    midx = jnp.clip(matched, 0)
    matched_boxes = gt_boxes[midx]
    matched_boxes = jnp.where(no_gt, 0.0, matched_boxes)
    return labels, matched_boxes


@partial(jax.jit, static_argnames=("cfg",))
def rpn_loss(
    objectness: jnp.ndarray,     # [B, A] float32
    pred_deltas: jnp.ndarray,    # [B, A, 4]
    anchors: jnp.ndarray,        # [A, 4]
    gt_boxes: jnp.ndarray,       # [B, M, 4] xyxy
    gt_valid: jnp.ndarray,       # [B, M]
    key: jax.Array,
    cfg: RPNConfig,
):
    """-> dict(loss_objectness, loss_rpn_box_reg)."""
    b = objectness.shape[0]
    labels, matched_boxes = jax.vmap(
        _assign_per_image, (0, 0, None, None))(gt_boxes, gt_valid, anchors,
                                               cfg)
    reg_targets = box_ops.encode_boxes(
        matched_boxes, anchors[None], cfg.box_weights)
    # Degenerate matched boxes (background images match zero-padding GT)
    # produce +/-inf/nan targets; those rows are never positives, but
    # inf * 0 = NaN in the masked sum, so zero them outright.
    reg_targets = jnp.where((labels >= 1.0)[..., None],
                            jnp.nan_to_num(reg_targets), 0.0)

    keys = jax.random.split(key, b)
    pos_mask, neg_mask = jax.vmap(
        lambda l, k: S.balanced_sample(
            l.astype(jnp.int32), k, cfg.batch_size_per_image,
            cfg.positive_fraction)
    )(labels, keys)

    sampled = pos_mask | neg_mask
    num_sampled = jnp.maximum(jnp.sum(sampled), 1).astype(objectness.dtype)

    box_l = L.smooth_l1_loss(pred_deltas, reg_targets, beta=1.0 / 9).sum(-1)
    loss_box = jnp.sum(box_l * pos_mask) / num_sampled

    obj_l = L.sigmoid_binary_cross_entropy(objectness, labels)
    loss_obj = jnp.sum(obj_l * sampled) / num_sampled
    return {"loss_objectness": loss_obj, "loss_rpn_box_reg": loss_box}
