"""RetinaNet (ResNet-50-FPN one-stage detector) in Flax + functional loss
and static-shape postprocessing.

Parity with `torchvision_models/tvision/retinanet.py`:
* Head (:36-241): shared 4x(3x3 conv + ReLU) towers per FPN level;
  classification conv bias initialized to -log((1-p)/p) with p=0.01;
  outputs flattened to [B, sum HWA, K] / [B, sum HWA, 4] in (h, w, a)
  order — our NHWC reshape produces the same ordering as the reference's
  (N, A*K, H, W) view+permute.
* Matching (:369-375, 403-412): per-image IoU vs anchors, Matcher(0.5,
  0.4, allow_low_quality=True); images with no GT get all-background.
* Losses (:107-143, :196-223): sigmoid focal on tf-idf-scaled logits over
  non-BETWEEN anchors / max(1, num_fg), mean over batch; L1 on encoded
  regression targets of foreground anchors / max(1, num_fg).
* Postprocess (:414-472): per level score threshold 0.05 -> top-1000 over
  flattened (anchor, class) pairs -> decode + clip; levels concatenated ->
  class-aware NMS 0.5 -> top 300.

TPU design: GT padded [B, M] + mask, all per-image loops vmapped; the
candidate selection uses static top-k with -inf masking instead of boolean
gathers.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from object_detectors_tpu.models.resnet import BackboneWithFPN, ResNet
from object_detectors_tpu.ops import boxes as box_ops
from object_detectors_tpu.ops import losses as L
from object_detectors_tpu.ops import matcher as M
from object_detectors_tpu.ops import nms as N
from object_detectors_tpu.ops import selection as SEL


@dataclasses.dataclass(frozen=True)
class RetinaNetConfig:
    num_classes: int = 91
    fg_iou_thresh: float = 0.5
    bg_iou_thresh: float = 0.4
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_img: int = 300
    topk_candidates: int = 1000
    # global pre-NMS candidate cap across the concatenated levels (the
    # per-level top-1000s sum to ~4700 at 640^2). Greedy NMS only ever
    # consults higher-scored boxes, so the top-K prefix is exact as long
    # as >= detections_per_img survivors land inside it (same argument
    # as RoIHeadsConfig.pre_nms_candidates); under prefix starvation the
    # degradation is one-sided truncation of the lowest-ranked
    # detections, never wrong/reordered boxes (tests/test_pre_nms_cap.py
    # constructs both regimes). 0 disables.
    pre_nms_candidates: int = 2000
    box_weights: tuple = (1.0, 1.0, 1.0, 1.0)
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    # per-minibatch tf-idf recompute (retinanet.py:125-134): replaces the
    # dataset tfidf vector with log((B+1)/(df_batch+1))+1, optionally
    # Lp-normalized by tfidf_norm.
    tfidf_mini_batch: bool = False
    tfidf_norm: int = 0


def _pack_layout(shapes):
    """Static 2D bin layout for FPN levels: the largest level occupies
    the left band; the rest stack vertically in a second band, every
    placement separated by a 1-px gap. Returns (canvas_h, canvas_w,
    [(r, c, h, w)]). One px of separation + re-zeroing the mask after
    every conv makes packed 3x3 convs EXACTLY per-level zero-padded
    convs (a 3x3 output reads one px across the gap, which the mask
    keeps at zero)."""
    (h0, w0) = shapes[0]
    places = [(0, 0, h0, w0)]
    col = w0 + 1
    row = 0
    wmax = 0
    for (h, w) in shapes[1:]:
        places.append((row, col, h, w))
        row += h + 1
        wmax = max(wmax, w)
    canvas_h = max(h0, row - 1)
    canvas_w = col + wmax
    return canvas_h, canvas_w, places


class _ConvP(nn.Module):
    """Parameter holder replicating nn.Conv's exact (kernel, bias) tree
    so the fused-tower head keeps checkpoint/state-dict compatibility
    while accessing raw kernels for concatenation."""

    features: int
    in_features: int
    kernel_init: Any
    bias_init: Any

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init,
                       (3, 3, self.in_features, self.features),
                       jnp.float32)
        b = self.param("bias", self.bias_init, (self.features,),
                       jnp.float32)
        return k, b


class RetinaNetHead(nn.Module):
    """Classification/regression towers with parameters SHARED across FPN
    levels (the torchvision heads are single modules applied per level).

    ``packed=True`` runs each tower ONCE over all levels packed into a
    single gap-separated masked canvas instead of 5 per-level convs —
    numerically identical (gaps re-zeroed between convs), but one big
    MXU-friendly conv per layer instead of five small ones.

    ``fused_towers=True`` (requires packed) additionally runs the cls
    and reg towers JOINTLY: layer 1 is one dense 512-out conv (both
    towers read the same canvas), layers 2-4 are feature_group_count=2
    grouped convs (block-diagonal — exactly the two independent
    towers). Same FLOPs, half the conv dispatches, N=512 MXU shapes.
    MEASURED LOSER (r5 chip A/B, kept for the ablation record): head
    +0.8 ms at bs16 640² (15.7 -> 16.5), full graph 94.1 vs 92.4 ms at
    bs32 — XLA already overlaps the two tower chains, and the grouped
    convs lower less efficiently than two dense N=256 convs
    (BASELINE.md r5 appendix). Default stays False."""

    num_classes: int
    num_anchors: int = 9
    in_channels: int = 256
    prior_probability: float = 0.01
    dtype: Any = jnp.float32
    packed: bool = True
    fused_towers: bool = False

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        bias_value = -math.log(
            (1 - self.prior_probability) / self.prior_probability)

        def conv(feats, name, bias_init=nn.initializers.zeros):
            return nn.Conv(feats, (3, 3), padding=((1, 1), (1, 1)),
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init, dtype=self.dtype,
                           param_dtype=jnp.float32, name=name)

        cls_logits_conv = conv(self.num_anchors * self.num_classes,
                               "cls_logits",
                               nn.initializers.constant(bias_value))
        bbox_reg_conv = conv(self.num_anchors * 4, "bbox_reg")

        if self.packed and self.fused_towers:
            cin = self.in_channels
            kb = [(_ConvP(cin, cin, nn.initializers.normal(0.01),
                          nn.initializers.zeros, name=f"cls_conv{i}")(),
                   _ConvP(cin, cin, nn.initializers.normal(0.01),
                          nn.initializers.zeros, name=f"reg_conv{i}")())
                  for i in range(4)]
            b = features[0].shape[0]
            shapes = [(f.shape[1], f.shape[2]) for f in features]
            ch, cw, places = _pack_layout(shapes)
            canvas = jnp.zeros((b, ch, cw, cin), features[0].dtype)
            mask = np.zeros((1, ch, cw, 1), np.float32)
            for f, (r, c, h, w) in zip(features, places):
                canvas = jax.lax.dynamic_update_slice(
                    canvas, f, (0, r, c, 0))
                mask[0, r:r + h, c:c + w, 0] = 1.0
            maskj = jnp.asarray(mask, self.dtype)
            dn = jax.lax.conv_dimension_numbers(
                canvas.shape, (3, 3, cin, 2 * cin),
                ("NHWC", "HWIO", "NHWC"))
            x = canvas.astype(self.dtype)
            for i, ((kc, bc), (kr, br)) in enumerate(kb):
                kcat = jnp.concatenate([kc, kr], 3).astype(self.dtype)
                bcat = jnp.concatenate([bc, br], 0).astype(self.dtype)
                x = jax.lax.conv_general_dilated(
                    x, kcat, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=dn,
                    # layer 1 reads the shared canvas densely; layers
                    # 2-4 are block-diagonal (tower-independent)
                    feature_group_count=1 if i == 0 else 2)
                x = nn.relu(x + bcat) * maskj
            cls_c = cls_logits_conv(x[..., :cin])
            reg_c = bbox_reg_conv(x[..., cin:])
            cls_out, reg_out = [], []
            for (r, c, h, w) in places:
                cc = jax.lax.slice(cls_c, (0, r, c, 0),
                                   (b, r + h, c + w, cls_c.shape[-1]))
                rr = jax.lax.slice(reg_c, (0, r, c, 0),
                                   (b, r + h, c + w, reg_c.shape[-1]))
                cls_out.append(cc.reshape(b, -1, self.num_classes))
                reg_out.append(rr.reshape(b, -1, 4))
            level_sizes = tuple(c.shape[1] for c in cls_out)
            return (jnp.concatenate(cls_out, 1),
                    jnp.concatenate(reg_out, 1), level_sizes)

        cls_tower = [conv(self.in_channels, f"cls_conv{i}") for i in range(4)]
        reg_tower = [conv(self.in_channels, f"reg_conv{i}") for i in range(4)]

        if self.packed:
            b = features[0].shape[0]
            shapes = [(f.shape[1], f.shape[2]) for f in features]
            ch, cw, places = _pack_layout(shapes)
            canvas = jnp.zeros((b, ch, cw, features[0].shape[-1]),
                               features[0].dtype)
            mask = np.zeros((1, ch, cw, 1), np.float32)
            for f, (r, c, h, w) in zip(features, places):
                canvas = jax.lax.dynamic_update_slice(
                    canvas, f, (0, r, c, 0))
                mask[0, r:r + h, c:c + w, 0] = 1.0
            maskj = jnp.asarray(mask, self.dtype)

            def tower(layers, out_conv, x):
                for layer in layers:
                    # re-zero the gaps: bias+ReLU would otherwise leak
                    # nonzero values across level boundaries
                    x = nn.relu(layer(x)) * maskj
                return out_conv(x)

            cls_c = tower(cls_tower, cls_logits_conv, canvas)
            reg_c = tower(reg_tower, bbox_reg_conv, canvas)
            cls_out, reg_out = [], []
            for (r, c, h, w) in places:
                cc = jax.lax.slice(cls_c, (0, r, c, 0),
                                   (b, r + h, c + w, cls_c.shape[-1]))
                rr = jax.lax.slice(reg_c, (0, r, c, 0),
                                   (b, r + h, c + w, reg_c.shape[-1]))
                cls_out.append(cc.reshape(b, -1, self.num_classes))
                reg_out.append(rr.reshape(b, -1, 4))
            level_sizes = tuple(c.shape[1] for c in cls_out)
            return (jnp.concatenate(cls_out, 1),
                    jnp.concatenate(reg_out, 1), level_sizes)

        cls_out, reg_out = [], []
        for f in features:
            b = f.shape[0]
            c = f
            for layer in cls_tower:
                c = nn.relu(layer(c))
            c = cls_logits_conv(c)
            cls_out.append(c.reshape(b, -1, self.num_classes))

            r = f
            for layer in reg_tower:
                r = nn.relu(layer(r))
            r = bbox_reg_conv(r)
            reg_out.append(r.reshape(b, -1, 4))
        # also return per-level anchor counts for postprocess splitting
        level_sizes = tuple(c.shape[1] for c in cls_out)
        return (jnp.concatenate(cls_out, 1),
                jnp.concatenate(reg_out, 1), level_sizes)


class RetinaNet(nn.Module):
    """Backbone(P3..P7) + head. Returns (cls_logits, bbox_reg, level_sizes).

    setup()-structured so the param tree is backbone/{resnet,fpn} + head
    (matching FasterRCNN and the torch state-dict converters)."""

    num_classes: int = 91
    resnet_layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32
    backbone_fused: str = "off"  # fused eval bottlenecks (resnet.py)
    fused_towers: bool = False   # joint towers: measured r5 loser, off

    def setup(self):
        self.backbone = BackboneWithFPN(
            ResNet(self.resnet_layers, "bottleneck", "frozen", self.dtype,
                   fused=self.backbone_fused),
            out_channels=256, extra_blocks="p6p7",
            returned_layers=(2, 3, 4), name="backbone")
        self.head = RetinaNetHead(self.num_classes, dtype=self.dtype,
                                  fused_towers=self.fused_towers,
                                  name="head")

    def __call__(self, images, train: bool = False):
        feats = self.backbone(images, train)
        return self.head(feats)


def _match_per_image(gt_boxes, gt_valid, anchors, cfg: RetinaNetConfig):
    quality = box_ops.pairwise_iou(gt_boxes, anchors)  # [M, A]
    return M.match(quality, gt_valid, cfg.fg_iou_thresh, cfg.bg_iou_thresh,
                   allow_low_quality_matches=True)


@partial(jax.jit, static_argnames=("cfg",))
def retinanet_loss(
    cls_logits: jnp.ndarray,   # [B, A, K] float32
    bbox_reg: jnp.ndarray,     # [B, A, 4]
    anchors: jnp.ndarray,      # [A, 4] xyxy
    gt_boxes: jnp.ndarray,     # [B, M, 4] xyxy (abs)
    gt_labels: jnp.ndarray,    # [B, M]
    gt_valid: jnp.ndarray,     # [B, M] bool
    cfg: RetinaNetConfig,
    tfidf: jnp.ndarray | float = 1.0,
):
    """Returns dict(classification=..., bbox_regression=...)."""
    if cfg.tfidf_mini_batch:
        from object_detectors_tpu.data.idf import minibatch_idf

        tfidf = minibatch_idf(gt_labels, gt_valid, cls_logits.shape[-1])
        if cfg.tfidf_norm:
            tfidf = tfidf / jnp.linalg.norm(tfidf, ord=cfg.tfidf_norm)
    matched = jax.vmap(_match_per_image, (0, 0, None, None))(
        gt_boxes, gt_valid, anchors, cfg)  # [B, A]

    fg = matched >= 0
    valid = matched != M.BETWEEN_THRESHOLDS
    num_fg = jnp.maximum(jnp.sum(fg, axis=1), 1).astype(cls_logits.dtype)

    midx = jnp.clip(matched, 0)
    labels_at_anchor = jnp.take_along_axis(gt_labels, midx, axis=1)  # [B, A]
    gt_target = jax.nn.one_hot(
        labels_at_anchor, cls_logits.shape[-1], dtype=cls_logits.dtype)
    gt_target = gt_target * fg[..., None]

    cls_el = L.sigmoid_focal_loss(
        cls_logits * tfidf, gt_target, cfg.focal_alpha, cfg.focal_gamma)
    cls_per_img = jnp.sum(
        cls_el * valid[..., None], axis=(1, 2)) / num_fg
    classification = jnp.mean(cls_per_img)

    boxes_at_anchor = jnp.take_along_axis(
        gt_boxes, midx[..., None], axis=1)  # [B, A, 4]
    reg_target = box_ops.encode_boxes(
        boxes_at_anchor, anchors[None], cfg.box_weights)
    reg_el = jnp.abs(bbox_reg - reg_target).sum(-1)  # L1 over 4 coords
    reg_per_img = jnp.sum(reg_el * fg, axis=1) / num_fg
    bbox_regression = jnp.mean(reg_per_img)
    return {"classification": classification,
            "bbox_regression": bbox_regression}


def retinanet_postprocess(
    cls_logits: jnp.ndarray,   # [B, A, K] f32 OR bf16 (see below)
    bbox_reg: jnp.ndarray,     # [B, A, 4] f32 or bf16
    anchors: jnp.ndarray,      # [A, 4]
    level_sizes: tuple,
    image_size: tuple,         # (H, W)
    cfg: RetinaNetConfig,
    tfidf_post: jnp.ndarray | float = 1.0,
    grids: tuple | None = None,
    select_mode: str = "fused",
):
    """[B] static-shape detections: (boxes [B,D,4], scores [B,D],
    labels [B,D], valid [B,D]) with D = detections_per_img.

    Accepts the head's native bf16 logits directly: selection compares
    are exact on bf16 (the f32 cast is injective+monotone, so selecting
    on bf16 == selecting on the f32 casts — tests/test_selection.py),
    and only the <= topk survivors are cast to f32 for sigmoid/decode.
    This avoids materializing the [B, A, K] f32 tensor (28 MB/img at
    640²) the round-2 callers paid for.

    Dispatches OUTSIDE jit on whether tfidf_post is a statically
    positive python scalar (the default 1.0): a positive scalar
    rescales logits monotonically, so selection runs on the unscaled
    native-dtype logits with the score threshold moved into logit
    space; a traced scalar/vector takes the f32 scaled path.
    """
    if isinstance(tfidf_post, (int, float)) and tfidf_post > 0:
        return _retinanet_postprocess(
            cls_logits, bbox_reg, anchors, level_sizes, image_size,
            cfg, 1.0, float(tfidf_post), grids=grids,
            select_mode=select_mode)
    return _retinanet_postprocess(
        cls_logits, bbox_reg, anchors, level_sizes, image_size, cfg,
        tfidf_post, None, grids=grids, select_mode=select_mode)


def _anchors_from_index(aidx, anchors, level_sizes, grids, image_size):
    """Rebuild grid_anchors rows (anchors.py:37-62) for global anchor
    ids: shift = (col*stride_w, row*stride_h) + the level's rounded
    base table (= the table's first-cell rows, sliced at static
    offsets). Integer products < 2^24 are exact in f32, so rows are
    BITWISE equal to anchors[aidx] (analysis/decode_bench.py)."""
    aidx = aidx.astype(jnp.int32)
    nl = len(level_sizes)
    a_per = level_sizes[0] // (grids[0][0] * grids[0][1])
    starts, s = [], 0
    for ls, (gh, gww) in zip(level_sizes, grids):
        assert ls == gh * gww * a_per, (level_sizes, grids)
        starts.append(s)
        s += ls
    bases = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(anchors, s0, a_per, 0)
         for s0 in starts], 0).astype(jnp.float32)   # [nl*a_per, 4]
    lvl = jnp.zeros_like(aidx)
    start = jnp.zeros_like(aidx)
    gw = jnp.zeros_like(aidx)
    st_w = jnp.zeros_like(aidx)
    st_h = jnp.zeros_like(aidx)
    for li, (s0, (gh, gww)) in enumerate(zip(starts, grids)):
        sel = aidx >= s0
        lvl = jnp.where(sel, li, lvl)
        start = jnp.where(sel, s0, start)
        gw = jnp.where(sel, gww, gw)
        st_w = jnp.where(sel, image_size[1] // gww, st_w)
        st_h = jnp.where(sel, image_size[0] // gh, st_h)
    local = aidx - start
    cell = local // a_per
    a = local % a_per
    sx = (cell % gw).astype(jnp.float32) * st_w.astype(jnp.float32)
    sy = (cell // gw).astype(jnp.float32) * st_h.astype(jnp.float32)
    key = lvl * a_per + a
    onehot = (key[:, None]
              == jnp.arange(nl * a_per)[None, :]).astype(jnp.float32)
    return jnp.stack([sx, sy, sx, sy], -1) + onehot @ bases


@partial(jax.jit, static_argnames=("cfg", "level_sizes", "image_size",
                                   "static_tfidf", "debug", "grids",
                                   "select_mode"))
def _retinanet_postprocess(
    cls_logits, bbox_reg, anchors, level_sizes, image_size,
    cfg: RetinaNetConfig, tfidf_post, static_tfidf: float | None,
    debug: str = "full", grids: tuple | None = None,
    select_mode: str = "fused",
):
    """``debug`` truncates the pipeline for stage attribution in
    analysis/retinanet_ablate.py: "select" stops after the per-level
    top-k (no gathers/decode), "decode" after box decode+clip, "cap"
    after the pre-NMS candidate cap, "full" (default) runs NMS.

    ``grids``: optional static ((gh, gw), ...) per level. When given,
    survivors' anchor rows are reconstructed arithmetically from their
    indices (bitwise-equal to the table — see the decode block below)
    instead of gathered, halving the decode gather traffic."""
    k = cls_logits.shape[-1]

    # With a scalar tfidf the sigmoid is monotonic per element, so the
    # per-level top-k can run in LOGIT space and sigmoid only touches
    # the k survivors (saves a full [A, K] transcendental pass — at 640²
    # that's ~70M sigmoids skipped).
    scalar_tfidf = jnp.ndim(tfidf_post) == 0
    static_pos = static_tfidf is not None
    logit_thr = math.log(cfg.score_thresh / (1.0 - cfg.score_thresh))
    ninf = -jnp.inf

    def select_batched(logits):
        """All levels in ONE two-stage radix select (r5) — MEASURED
        LOSER, kept for the A/B record (select_mode defaults
        "perlevel").

        Stacks the per-level anchor-max rows into a [-inf]-padded
        [L, n_max] array and vmaps both radix stages, trading the L
        serialized kth-code trip chains of the per-level loop for a
        single chain over 3.6× padded bytes. Exact either way (-inf
        pads sit at each row's tail, ties stay lowest-index-first, the
        per-level top-k SET is unchanged) — but on the full serve
        pipeline at bs16 640² it measured 339.3 img/s vs 382.3 for
        the per-level loop (queue_r5e, BASELINE.md r5 appendix): the
        padded rows are reduce-bandwidth-bound, the same shape of loss
        as the RPN filter's batched topk (queue_r5d).
        """
        if static_pos:
            raw = jnp.where(
                logits.astype(jnp.float32) * static_tfidf > logit_thr,
                logits, jnp.asarray(ninf, logits.dtype))
            scale = static_tfidf
        else:
            raw = logits.astype(jnp.float32) * tfidf_post
            raw = jnp.where(raw > logit_thr, raw, ninf)
            scale = 1.0
        anchor_best = jnp.max(raw, axis=1)              # [A]
        nl = len(level_sizes)
        n_max = max(level_sizes)
        starts_l = [0]
        for ls in level_sizes[:-1]:
            starts_l.append(starts_l[-1] + ls)
        ka = min(cfg.topk_candidates, n_max)
        rows = [
            jnp.pad(jax.lax.dynamic_slice_in_dim(anchor_best, s0, ls),
                    (0, n_max - ls), constant_values=-jnp.inf)
            for s0, ls in zip(starts_l, level_sizes)
        ]
        stacked = jnp.stack(rows)                       # [L, n_max]
        a_val, a_idx = jax.vmap(partial(SEL.radix_topk, k=ka))(stacked)
        g_idx = jnp.clip(
            jnp.asarray(starts_l, jnp.int32)[:, None] + a_idx,
            0, raw.shape[0] - 1)                        # [L, ka]
        sub = raw[g_idx.reshape(-1)].reshape(nl, ka, k)
        fin_a = jnp.isfinite(a_val.astype(jnp.float32))
        sub = jnp.where(fin_a[:, :, None], sub,
                        jnp.asarray(ninf, sub.dtype))
        kt = min(cfg.topk_candidates, ka * k)
        topv_l, sub_i = jax.vmap(partial(SEL.radix_topk, k=kt))(
            sub.reshape(nl, ka * k))                    # [L, kt]
        arow = jnp.take_along_axis(g_idx, sub_i // k, axis=1)
        fin = jnp.isfinite(topv_l.astype(jnp.float32))
        topv = jnp.where(
            fin, jax.nn.sigmoid(topv_l.astype(jnp.float32) * scale),
            ninf)
        scores = jnp.where(fin, topv, 0.0).reshape(-1)
        labels = (sub_i % k).astype(jnp.int32).reshape(-1)
        aidx = arow.astype(jnp.int32).reshape(-1)
        valid = fin.reshape(-1)
        return scores, labels, aidx, valid

    def select_fused(logits):
        """Per-level two-stage selects with the kth-code trip chains
        FUSED across levels (ops/selection.radix_topk_multi): the
        per-level loop serialized 2L sequential nbits/2-trip searches
        (latency-bound); this runs 2 — one per stage — while keeping
        every select unpadded (the padded "batched" variant measured
        reduce-bandwidth-bound, queue_r5e). Identical outputs to the
        perlevel loop."""
        lvls, start = [], 0
        for ls in level_sizes:
            lg = jax.lax.dynamic_slice_in_dim(logits, start, ls, 0)
            topk = min(cfg.topk_candidates, ls * k)
            if static_pos:
                raw = jnp.where(
                    lg.astype(jnp.float32) * static_tfidf > logit_thr,
                    lg, jnp.asarray(ninf, lg.dtype))
                scale = static_tfidf
            else:
                raw = lg.astype(jnp.float32) * tfidf_post
                raw = jnp.where(raw > logit_thr, raw, ninf)
                scale = 1.0
            lvls.append((raw, topk, scale, ls, start))
            start += ls
        # stage 1: top anchors by per-anchor max class score
        stage1 = SEL.radix_topk_multi(
            tuple(jnp.max(raw, axis=1) for raw, *_ in lvls),
            tuple(min(topk, ls) for _, topk, _, ls, _ in lvls))
        subs = [raw[a_idx].reshape(-1)
                for (raw, *_), (_, a_idx) in zip(lvls, stage1)]
        # stage 2: top (anchor, class) pairs within the superset
        stage2 = SEL.radix_topk_multi(
            tuple(subs), tuple(topk for _, topk, *_ in lvls))
        lvl_aidx, lvl_scores, lvl_labels, lvl_valid = [], [], [], []
        for (raw, topk, scale, ls, s0), (_, a_idx), (topv_l, sub_i) \
                in zip(lvls, stage1, stage2):
            topi = (a_idx[sub_i // k] * k + sub_i % k)
            fin = jnp.isfinite(topv_l.astype(jnp.float32))
            topv = jnp.where(
                fin, jax.nn.sigmoid(topv_l.astype(jnp.float32)
                                    * scale), ninf)
            lvl_aidx.append((topi // k + s0).astype(jnp.int32))
            lvl_scores.append(jnp.where(fin, topv, 0.0))
            lvl_labels.append((topi % k).astype(jnp.int32))
            lvl_valid.append(fin)
        return (jnp.concatenate(lvl_scores, 0),
                jnp.concatenate(lvl_labels, 0),
                jnp.concatenate(lvl_aidx, 0),
                jnp.concatenate(lvl_valid, 0))

    def per_image(logits, reg):
        if scalar_tfidf and select_mode == "batched":
            scores, labels, aidx, valid = select_batched(logits)
            if debug == "select":
                return (scores, scores, valid.astype(jnp.int32), valid)
            return _post_select(scores, labels, aidx, valid, reg)
        if scalar_tfidf and select_mode == "fused":
            scores, labels, aidx, valid = select_fused(logits)
            if debug == "select":
                return (scores, scores, valid.astype(jnp.int32), valid)
            return _post_select(scores, labels, aidx, valid, reg)
        lvl_aidx, lvl_scores, lvl_labels, lvl_valid = [], [], [], []
        start = 0
        for ls in level_sizes:
            lg = jax.lax.dynamic_slice_in_dim(logits, start, ls, 0)
            topk = min(cfg.topk_candidates, ls * k)
            if scalar_tfidf:
                if static_pos:
                    # threshold compare in f32 (exact reference compare;
                    # XLA fuses the convert into it), data stays bf16.
                    # Multiply (not divide-the-threshold): the reference
                    # compares sigmoid(lg * tfidf) > s, and the f32
                    # multiply rounds identically to its logit-space
                    # equivalent lg * tfidf > logit(s) — ADVICE r3.
                    raw = jnp.where(
                        lg.astype(jnp.float32) * static_tfidf > logit_thr,
                        lg, jnp.asarray(ninf, lg.dtype))
                    scale = static_tfidf
                else:
                    raw = lg.astype(jnp.float32) * tfidf_post
                    raw = jnp.where(raw > logit_thr, raw, ninf)
                    scale = 1.0
                # Exact two-stage top-k: the global top-k (anchor, class)
                # pairs touch at most k distinct anchors, and each such
                # anchor's per-anchor max is >= its pair's score — so the
                # top-k anchors by max-class score are a superset. This
                # turns one top-k over ls*K (~5M at P3/640²) into a max
                # reduce + two radix selects (ops/selection.py — the
                # lax.top_k sorts here cost ~2.5 ms each at bs16).
                n_anchor = min(topk, ls)
                anchor_best = jnp.max(raw, axis=1)  # [ls]
                _, a_idx = SEL.radix_topk(anchor_best, n_anchor)
                sub = raw[a_idx]  # [n_anchor, K]
                topv_l, sub_i = SEL.radix_topk(sub.reshape(-1), topk)
                topi = (a_idx[sub_i // k] * k + sub_i % k)
                fin = jnp.isfinite(topv_l)
                topv = jnp.where(
                    fin, jax.nn.sigmoid(topv_l.astype(jnp.float32)
                                        * scale), ninf)
            else:
                scores = jax.nn.sigmoid(
                    lg.astype(jnp.float32) * tfidf_post).reshape(-1)
                keep = scores > cfg.score_thresh
                masked = jnp.where(keep, scores, ninf)
                topv, topi = SEL.radix_topk(masked, topk)
            if debug == "select":
                lvl_scores.append(jnp.where(jnp.isfinite(topv), topv,
                                            0.0))
                lvl_valid.append(jnp.isfinite(topv))
                start += ls
                continue
            # Defer decode to AFTER the global cap: the XLA gather
            # engine issues ~30 ns/index row, so the old per-level
            # rg[anchor_idx] + an[anchor_idx] gathers (2 x ~4.1k rows
            # per image) plus the 4 separate post-cap gathers were the
            # bulk of the measured 7.3 ms cap stage at bs16. Here each
            # level emits only (score, label, global anchor id); the
            # cap gathers ONE packed [*, 4] array and the survivors'
            # reg+anchor rows are fetched by ONE fused gather.
            lvl_aidx.append((topi // k + start).astype(jnp.int32))
            lvl_scores.append(jnp.where(jnp.isfinite(topv), topv, 0.0))
            lvl_labels.append((topi % k).astype(jnp.int32))
            lvl_valid.append(jnp.isfinite(topv))
            start += ls
        if debug == "select":
            return (jnp.concatenate(lvl_scores, 0),
                    jnp.concatenate(lvl_scores, 0),
                    jnp.concatenate(lvl_valid, 0).astype(jnp.int32),
                    jnp.concatenate(lvl_valid, 0))
        scores = jnp.concatenate(lvl_scores, 0)
        labels = jnp.concatenate(lvl_labels, 0)
        aidx = jnp.concatenate(lvl_aidx, 0)
        valid = jnp.concatenate(lvl_valid, 0)
        return _post_select(scores, labels, aidx, valid, reg)

    def _post_select(scores, labels, aidx, valid, reg):
        if cfg.pre_nms_candidates and \
                cfg.pre_nms_candidates < scores.shape[0]:
            # one packed gather instead of four (scores/labels/aidx/
            # valid); ints < 2^24 are exact in f32.
            pack = jnp.stack([
                scores.astype(jnp.float32),
                labels.astype(jnp.float32),
                aidx.astype(jnp.float32),
                valid.astype(jnp.float32)], axis=-1)
            _, keep = SEL.radix_topk(
                jnp.where(valid, scores.astype(jnp.float32), ninf),
                cfg.pre_nms_candidates)
            sel = pack[keep]
            scores = sel[:, 0]
            labels = sel[:, 1].astype(jnp.int32)
            aidx = sel[:, 2].astype(jnp.int32)
            valid = sel[:, 3] > 0.5
        if debug == "cap":
            return (jnp.zeros(scores.shape + (4,), scores.dtype),
                    scores, labels, valid)
        if grids is not None:
            # Arithmetic anchor reconstruction: grid_anchors rows are
            # col*stride + base[level, a] (anchors.py:37-62) — integer
            # products < 2^24 are exact in f32 and the rounded base
            # table is the first cell's anchor rows, so the rebuilt
            # rows are BITWISE equal to the table
            # (analysis/decode_bench.py asserts 0 mismatches). This
            # halves the decode's gather work: only the [Ncap, 4] bf16
            # reg rows are fetched (~30 ns/index row on the TPU gather
            # engine); the r4f stage isolation put the fused [Ncap, 8]
            # f32 gather decode at +5.0 ms bs16.
            an = _anchors_from_index(aidx, anchors, level_sizes,
                                     grids, image_size)
            rg = reg[aidx].astype(jnp.float32)        # [Ncap, 4]
            boxes = box_ops.decode_boxes(rg, an, cfg.box_weights)
        else:
            # fused reg+anchor gather of only the capped survivors
            regan = jnp.concatenate(
                [reg.astype(jnp.float32),
                 anchors.astype(jnp.float32)], -1)
            ra = regan[aidx]                          # [Ncap, 8]
            boxes = box_ops.decode_boxes(ra[:, :4], ra[:, 4:],
                                         cfg.box_weights)
        boxes = box_ops.clip_boxes_to_image(boxes, image_size)
        if debug == "decode":
            return boxes, scores, labels, valid
        ob, osc, olab, _, ovalid = N.batched_nms(
            boxes, scores, labels, cfg.nms_thresh,
            cfg.detections_per_img, valid)
        return ob, osc, olab, ovalid

    return jax.vmap(per_image)(cls_logits, bbox_reg)
