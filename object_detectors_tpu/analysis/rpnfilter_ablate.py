"""RPN proposal-filter stage ablation on the real chip.

filter_proposals costs +10.3 ms at bs16/640² (frcnn_ablate r3) — this
breaks the stage into cumulative prefixes to find the dominant term:
per-level blocked top-k, the candidate gathers, the [L, pre_n, pre_n]
IoU matrices, the fixed-point NMS while-loop, and the final merge top-k.

Usage: python -m object_detectors_tpu.analysis.rpnfilter_ablate [--bs 16]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from object_detectors_tpu.models import rpn as RPN  # noqa: E402
from object_detectors_tpu.ops import boxes as box_ops  # noqa: E402
from object_detectors_tpu.ops import nms as N  # noqa: E402


def time_fn(fn, *args, warmup=2, iters=20):
    jf = jax.jit(fn)
    for _ in range(warmup):
        float(jf(*args))
    t0 = time.perf_counter()
    outs = [jf(*args) for _ in range(iters)]
    s = float(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    del s, outs
    return dt


def build_stages(level_sizes, image_size, cfg):
    pre_n = cfg.pre_nms_top_n_test

    def per_image_topk(props, obj):
        sel_boxes, sel_scores = [], []
        start = 0
        for ls in level_sizes:
            ob = jax.lax.dynamic_slice_in_dim(obj, start, ls, 0)
            k = min(pre_n, ls)
            topv, topi = N.exact_blocked_topk(ob, k)
            if k < pre_n:
                topv = jnp.concatenate(
                    [topv, jnp.full((pre_n - k,), -jnp.inf, topv.dtype)])
                topi = jnp.concatenate(
                    [topi, jnp.zeros((pre_n - k,), topi.dtype)])
            sel_scores.append(topv)
            sel_boxes.append(topi)
            start += ls
        return jnp.stack(sel_boxes), jnp.stack(sel_scores)

    def topk_only(props, obj):
        bi, sv = jax.vmap(per_image_topk)(props, obj)
        return jnp.sum(sv) + jnp.sum(bi)

    def per_image_gather(props, obj):
        sel_boxes, sel_scores = [], []
        start = 0
        for ls in level_sizes:
            ob = jax.lax.dynamic_slice_in_dim(obj, start, ls, 0)
            pr = jax.lax.dynamic_slice_in_dim(props, start, ls, 0)
            k = min(pre_n, ls)
            topv, topi = N.exact_blocked_topk(ob, k)
            if k < pre_n:
                topv = jnp.concatenate(
                    [topv, jnp.full((pre_n - k,), -jnp.inf, topv.dtype)])
                topi = jnp.concatenate(
                    [topi, jnp.zeros((pre_n - k,), topi.dtype)])
            sel_boxes.append(pr[topi])
            sel_scores.append(topv)
            start += ls
        return jnp.stack(sel_boxes), jnp.stack(sel_scores)

    def plus_gather(props, obj):
        b, s = jax.vmap(per_image_gather)(props, obj)
        return jnp.sum(b) + jnp.sum(s)

    def per_image_iou(props, obj):
        boxes, logits = per_image_gather(props, obj)
        scores = jax.nn.sigmoid(logits)
        boxes = box_ops.clip_boxes_to_image(boxes, image_size)
        iou = jax.vmap(lambda bb: box_ops.pairwise_iou(bb, bb))(boxes)
        return jnp.sum(iou) + jnp.sum(scores)

    def plus_iou(props, obj):
        return jnp.sum(jax.vmap(per_image_iou)(props, obj))

    def full(props, obj):
        pb, ps, pv = RPN.filter_proposals(
            props, obj, level_sizes, image_size, cfg, training=False)
        return jnp.sum(pb) + jnp.sum(ps)

    return {"topk_only": topk_only, "plus_gather": plus_gather,
            "plus_iou": plus_iou, "full_filter": full}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--stages", nargs="*", default=None)
    args = ap.parse_args()

    s = args.size
    level_sizes = tuple(3 * (s // st) ** 2 for st in (4, 8, 16, 32)) + (
        3 * (s // 64) ** 2,)
    a = sum(level_sizes)
    rng = np.random.RandomState(0)
    props = jnp.asarray(
        np.clip(rng.rand(args.bs, a, 4) * s, 0, s).astype(np.float32))
    props = props.at[..., 2:].set(props[..., 2:] + props[..., :2])
    obj = jnp.asarray(rng.randn(args.bs, a).astype(np.float32))

    cfg = RPN.RPNConfig()
    stages = build_stages(level_sizes, (s, s), cfg)
    for name, fn in stages.items():
        if args.stages and name not in args.stages:
            continue
        dt = time_fn(fn, props, obj)
        print(f"{name:12s} {dt*1e3:8.2f} ms  {args.bs/dt:7.1f} img/s")


if __name__ == "__main__":
    main()


