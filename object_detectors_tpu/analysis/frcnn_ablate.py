"""Faster R-CNN stage ablation timing on the real chip.

Times cumulative pipeline prefixes (backbone -> +rpn -> +filter ->
+roi_align -> +heads -> +postprocess) with a host-read checksum sync
(block_until_ready phantom-syncs through the dev relay — see
BASELINE.md methodology). Identifies the stage to optimize for
VERDICT r1 item 2 (41 -> >=300 img/s/chip).

Usage: python -m object_detectors_tpu.analysis.frcnn_ablate [--bs 8]
"""

from __future__ import annotations

import argparse
import os
import time
from functools import partial

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from object_detectors_tpu.models import anchors as anchor_lib  # noqa: E402
from object_detectors_tpu.models import faster_rcnn as FR  # noqa: E402
from object_detectors_tpu.models import roi_heads as RH  # noqa: E402
from object_detectors_tpu.models import rpn as RPN  # noqa: E402
from object_detectors_tpu.models.resnet import (  # noqa: E402
    BackboneWithFPN, ResNet,
)
from object_detectors_tpu.ops import boxes as box_ops  # noqa: E402
from object_detectors_tpu.ops.roi_align import pool_multiscale  # noqa: E402


def build_stages(size, dtype, pooler="auto"):
    cfg = FR.FasterRCNNConfig(
        num_classes=91,
        roi=RH.RoIHeadsConfig(pooler_method=pooler))
    model = FR.FasterRCNN(cfg, dtype=dtype)
    x0 = jnp.zeros((1, size, size, 3), dtype)
    variables = model.init({"params": jax.random.key(0)}, x0, train=False)

    bb = BackboneWithFPN(ResNet((3, 4, 6, 3), "bottleneck", "frozen",
                                dtype),
                         out_channels=256, extra_blocks="pool",
                         returned_layers=(1, 2, 3, 4))
    bbv = {"params": variables["params"]["backbone"],
           "frozen": variables["frozen"]["backbone"]}
    rpnv = {"params": variables["params"]["rpn_head"]}
    headv = {"params": variables["params"]["box_head"]}
    predv = {"params": variables["params"]["box_predictor"]}

    def backbone_only(images):
        feats = bb.apply(bbv, images, False)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    def plus_rpn(images):
        feats = bb.apply(bbv, images, False)
        obj, deltas, level_sizes = RPN.RPNHead(3, dtype=dtype).apply(
            rpnv, feats)
        return jnp.sum(obj.astype(jnp.float32))

    def _through_filter(images, debug="full", **kw):
        feats = bb.apply(bbv, images, False)
        obj, deltas, level_sizes = RPN.RPNHead(3, dtype=dtype).apply(
            rpnv, feats)
        obj = obj.astype(jnp.float32)
        deltas = deltas.astype(jnp.float32)
        grid_sizes = tuple((f.shape[1], f.shape[2]) for f in feats)
        sizes, ars = anchor_lib.rpn_anchor_config()
        anchors = jnp.asarray(anchor_lib.grid_anchors(
            (images.shape[1], images.shape[2]), grid_sizes,
            sizes[:len(grid_sizes)], ars[:len(grid_sizes)]))
        props = box_ops.decode_boxes(deltas, anchors[None],
                                     cfg.rpn.box_weights)
        pb, ps, pv = RPN.filter_proposals(
            props, obj, level_sizes, images.shape[1:3], cfg.rpn,
            training=False, debug=debug, **kw)
        return feats, pb, pv

    def plus_filter(images):
        feats, pb, pv = _through_filter(images)
        return jnp.sum(pb) + jnp.sum(pv)

    def filter_stage(debug, **kw):
        def f(images):
            feats, pb, pv = _through_filter(images, debug=debug, **kw)
            return jnp.sum(pb) + jnp.sum(pv)
        return f

    def plus_roialign(images):
        feats, pb, pv = _through_filter(images)
        pooled = pool_multiscale(tuple(feats[:4]), pb, images.shape[1:3],
                                 (7, 7), method=pooler)
        return jnp.sum(pooled.astype(jnp.float32))

    def plus_heads(images):
        feats, pb, pv = _through_filter(images)
        pooled = pool_multiscale(tuple(feats[:4]), pb, images.shape[1:3],
                                 (7, 7), method=pooler)
        h = RH.TwoMLPHead(1024, dtype=dtype).apply(headv, pooled)
        lg, rg = RH.FastRCNNPredictor(91, dtype=dtype).apply(predv, h)
        return jnp.sum(lg.astype(jnp.float32))

    def full(images):
        out = model.apply(variables, images, train=False)
        return jnp.sum(out[0]) + jnp.sum(out[1])

    def _full_pieces(images, filter_mode="real", pooler_mode=None):
        """The full graph assembled from the stage pieces, so single
        stages can be swapped for dummies — (full_pieces −
        full_no_<stage>) is the stage's MARGINAL cost in context,
        which cumulative prefixes can't see (XLA overlap)."""
        feats = bb.apply(bbv, images, False)
        obj, deltas, level_sizes = RPN.RPNHead(3, dtype=dtype).apply(
            rpnv, feats)
        obj = obj.astype(jnp.float32)
        deltas = deltas.astype(jnp.float32)
        grid_sizes = tuple((f.shape[1], f.shape[2]) for f in feats)
        sizes, ars = anchor_lib.rpn_anchor_config()
        anchors = jnp.asarray(anchor_lib.grid_anchors(
            (images.shape[1], images.shape[2]), grid_sizes,
            sizes[:len(grid_sizes)], ars[:len(grid_sizes)]))
        props = box_ops.decode_boxes(deltas, anchors[None],
                                     cfg.rpn.box_weights)
        if filter_mode == "real":
            pb, ps, pv = RPN.filter_proposals(
                props, obj, level_sizes, images.shape[1:3], cfg.rpn,
                training=False)
        else:  # dummy: plain global top-k by objectness, no NMS
            from object_detectors_tpu.ops import selection as SEL
            post_n = cfg.rpn.post_nms_top_n_test

            def per_image(pr, ob):
                v, i = SEL.radix_topk(ob, post_n)
                bx = box_ops.clip_boxes_to_image(
                    pr[i], images.shape[1:3])
                return bx, v, jnp.isfinite(v)

            pb, ps, pv = jax.vmap(per_image)(props, obj)
        pooled = pool_multiscale(
            tuple(feats[:4]), pb, images.shape[1:3], (7, 7),
            method=pooler_mode or pooler)
        h = RH.TwoMLPHead(1024, dtype=dtype).apply(
            headv, pooled.astype(dtype))
        lg, rg = RH.FastRCNNPredictor(91, dtype=dtype).apply(predv, h)
        out = RH.postprocess_detections(
            lg.astype(jnp.float32), rg.astype(jnp.float32), pb, pv,
            images.shape[1:3], cfg.roi)
        return jnp.sum(out[0]) + jnp.sum(out[1])

    return {"backbone": backbone_only, "rpn_head": plus_rpn,
            "filter_topk": filter_stage("topk"),
            # r4 per-level radix_topk loop (r5 A/B vs the batched
            # single-vmap topk that is now the default)
            "filter_topk_perlevel": filter_stage(
                "topk", topk_mode="perlevel"),
            "filter_nms": filter_stage("nms"),
            "filter_nms_u4": filter_stage("nms", fp_unroll=4),
            "filter_nms_c512": filter_stage("nms", fp_chunk=512),
            "proposal_filter": plus_filter, "roi_align": plus_roialign,
            "box_heads": plus_heads, "full": full,
            "full_pieces": _full_pieces,
            "full_no_pooler": partial(_full_pieces, pooler_mode="dummy"),
            "full_no_filter": partial(_full_pieces, filter_mode="dummy"),
            # IN-GRAPH pooler attribution (r5): the grouped kernel with
            # compute (resp. DMA) stripped inside the otherwise-real
            # graph — full_pieces − full_pooler_dma = in-context compute
            "full_pooler_dma": partial(
                _full_pieces,
                pooler_mode="pallas_bands_grouped@dma_only"),
            "full_pooler_compute": partial(
                _full_pieces,
                pooler_mode="pallas_bands_grouped@compute_only"),
            "full_xalign16": partial(
                _full_pieces,
                pooler_mode="pallas_bands_grouped@xalign16"),
            # hybrid WITHOUT the unconditional 16-RoI/img XLA-gather
            # fixup repool (prime suspect for the in-graph 16.4 ms vs
            # isolated 9.3 ms gap: ~50k gather rows x ~30ns).
            # MEASURED: exonerated (queue_r5d: 56.7 vs 56.8 full)
            "full_nofix": partial(
                _full_pieces, pooler_mode="pallas_bands_grouped@nofix"),
            # prep (descriptor sort/scatter chains + canvas) only, and
            # kernel-without-unpermute — the remaining in-graph
            # attribution after nofix came back null
            "full_prep_only": partial(
                _full_pieces,
                pooler_mode="pallas_bands_grouped@prep_only"),
            "full_noperm": partial(
                _full_pieces,
                pooler_mode="pallas_bands_grouped@noperm"),
            # r4 argsort+scatter prep vs the r5 sort-free default
            # (queue_r5e: prep marginal was 6.2 ms of the 16.2)
            "full_oldprep": partial(
                _full_pieces,
                pooler_mode="pallas_bands_grouped@oldprep"),
            "full_prep_only_old": partial(
                _full_pieces,
                pooler_mode="pallas_bands_grouped@prep_only,oldprep"),
            # r5 pair fold: one span-2 read per bilinear tap — 14
            # dynamic band reads per RoI instead of 28 (the grouped
            # compute is read-issue-bound, BASELINE.md r4)
            "full_pair": partial(
                _full_pieces,
                pooler_mode="pallas_bands_grouped@fold=pair"),
            # r5 sortlite prep: 2-operand (key, iota) sort + one
            # [np, 12] row gather instead of the 14-operand sort —
            # sort passes move every payload lane
            "full_sortlite": partial(
                _full_pieces,
                pooler_mode="pallas_bands_grouped@sortlite"),
            "full_sortlite_pair": partial(
                _full_pieces,
                pooler_mode="pallas_bands_grouped@sortlite,fold=pair"),
            }


def time_fn(fn, images, warmup=2, iters=12):
    """Async back-to-back dispatch, one final host read (per-iteration
    reads pay ~28ms of noisy relay RPC each — BASELINE.md)."""
    jf = jax.jit(fn)
    for _ in range(warmup):
        float(jf(images))  # host read forces real execution
    t0 = time.perf_counter()
    outs = [jf(images) for _ in range(iters)]
    s = float(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    del s, outs
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--stages", nargs="*", default=None)
    ap.add_argument("--pooler", default="auto",
                    help="auto|pallas|pallas_tiled|canvas")
    args = ap.parse_args()
    dtype = jnp.float32 if args.f32 else jnp.bfloat16

    stages = build_stages(args.size, dtype, pooler=args.pooler)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(args.bs, args.size, args.size, 3).astype(np.float32),
        dtype)
    prev = 0.0
    for name, fn in stages.items():
        if args.stages and name not in args.stages:
            continue
        dt = time_fn(fn, images)
        print(f"{name:18s} {dt*1e3:8.1f} ms  (+{(dt-prev)*1e3:7.1f} ms)"
              f"  {args.bs/dt:7.1f} img/s")
        prev = dt


if __name__ == "__main__":
    main()
