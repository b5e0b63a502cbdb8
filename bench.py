"""Benchmark harness — the reference `yolo/benchmark.py` protocol rebuilt
for TPU: end-to-end YOLOv3 COCO-val-shaped inference throughput
(images/sec/chip) as one jitted program, swept over batch sizes.

Optimizations over the naive pipeline:
* scores/labels computed straight from raw logits (sigmoid(obj) *
  exp(max - logsumexp)) — no full [B, P, 85] decode materialization;
* only the top-k candidate rows are gathered and decoded to boxes;
* majority-vote NMS is the K-step select-max scan (ops/nms.py);
* bfloat16 backbone, f32 box math;
* persistent XLA compilation cache (first driver run warm-starts).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 500 — the BASELINE.json north star is 4000
imgs/sec e2e on a v5e-8 (8 chips), i.e. 500 imgs/sec/chip.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from object_detectors_tpu.models import yolo_criterion as YC
from object_detectors_tpu.models.yolo import YoloHead
from object_detectors_tpu.ops import nms as N

PER_CHIP_TARGET = 500.0  # 4000 imgs/sec on v5e-8 => 500/chip


def build_pipeline(num_classes=80, img_size=640, topk=256, max_det=100,
                   dtype=jnp.bfloat16, conf=0.1, iou_thr=0.6):
    cfg = YC.YoloLossConfig(num_classes=num_classes, img_size=img_size)
    model = YoloHead(num_classes=num_classes, dtype=dtype)
    x0 = jnp.zeros((1, img_size, img_size, 3), dtype)
    variables = model.init(jax.random.key(0), x0, train=False)

    @jax.jit
    def infer(images):
        outs = model.apply(variables, images, train=False)
        raw = YC.flatten_raw_outputs(outs, num_classes, 3)
        priors, gw = YC.make_priors(cfg, tuple(o.shape[1] for o in outs))

        obj = raw[..., 4].astype(jnp.float32)
        logits = raw[..., 5:].astype(jnp.float32)
        max_l = jnp.max(logits, -1)
        lse = jax.nn.logsumexp(logits, -1)
        score = jax.nn.sigmoid(obj) * jnp.exp(max_l - lse)
        label = jnp.argmax(logits, -1).astype(jnp.int32)

        topv, topi = jax.lax.top_k(score, topk)
        sel = jnp.take_along_axis(
            raw[..., :4].astype(jnp.float32), topi[..., None], 1)
        sel_priors = priors[topi]
        sel_gw = gw[topi]
        strides = (img_size / sel_gw)[..., None]
        xy = (jax.nn.sigmoid(sel[..., 0:2])
              + sel_priors[..., 0:2] * sel_gw[..., None] - 0.5) * strides
        wh = jnp.exp(sel[..., 2:4]) * sel_priors[..., 2:4] \
            * sel_gw[..., None] * strides
        boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)
        labels = jnp.take_along_axis(label, topi, 1)
        f = jax.vmap(lambda b, s, c, v: N.nms_majority(
            b, s, c, num_classes=num_classes, iou_threshold=iou_thr,
            max_output=max_det, valid=v))
        return f(boxes, topv, labels, topv > conf)

    return infer


def run(batch_sizes=(64,), img_size=640, warmup=2, iters=10):
    infer = build_pipeline(img_size=img_size)
    best = 0.0
    results = {}
    rng = np.random.RandomState(0)
    for bs in batch_sizes:
        imgs = jnp.asarray(
            rng.rand(bs, img_size, img_size, 3).astype(np.float32),
            jnp.bfloat16)
        for _ in range(warmup):
            jax.block_until_ready(infer(imgs))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(imgs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        ips = bs / dt
        results[bs] = ips
        best = max(best, ips)
    return best, results


def run_protocol(batch_sizes=(4, 8), img_size=416, num_images=64,
                 out_csv="benchmark_res.csv"):
    """The reference benchmark.py protocol (yolo/benchmark.py:17-157):
    per batch size, time forward+decode+NMS vs CPU-eval vs total app
    time, run full COCO-protocol eval, append a CSV row. Runs on a
    synthetic COCO-val stand-in (no datasets on disk)."""
    import csv

    import numpy as np

    from object_detectors_tpu.data import coco as D
    from object_detectors_tpu.data import synthetic
    from object_detectors_tpu.eval import evaluator as E

    rng = np.random.RandomState(0)
    gt = synthetic.make_coco_dicts(rng, num_images=num_images,
                                   img_size=img_size, num_classes=80)
    imgs = {im["id"]: np.random.RandomState(im["id"]).randint(
        0, 255, (img_size, img_size, 3)).astype(np.uint8)
        for im in gt["images"]}
    ds = D.CocoDetectionDataset(gt, label_mode="lvis0",
                                image_loader=lambda i: imgs[i["id"]])
    infer = build_pipeline(img_size=img_size)

    rows = []
    for bs in batch_sizes:
        # warm up (compile) outside the timed app window
        jax.block_until_ready(infer(jnp.zeros(
            (bs, img_size, img_size, 3), jnp.bfloat16)))
        t_app0 = time.perf_counter()
        forw = 0.0
        ev = E.DetectionEvaluator(gt, label_map=lambda c: c + 1)
        for batch in D.yolo_batches(ds, bs, img_size, max_boxes=8):
            x = jnp.asarray(batch["images"], jnp.bfloat16)
            t0 = time.perf_counter()
            b, sc, lab, v = jax.block_until_ready(infer(x))
            forw += time.perf_counter() - t0
            keep = batch["image_ids"] >= 0
            ev.update(batch["image_ids"][keep], np.asarray(b)[keep],
                      np.asarray(sc)[keep], np.asarray(lab)[keep],
                      np.asarray(v)[keep], batch["scale_factors"][keep])
        t0 = time.perf_counter()
        stats = ev.summarize()
        cpu_eval = time.perf_counter() - t0
        app = time.perf_counter() - t_app0
        rows.append({"batch": bs, "forw_time": round(forw, 3),
                     "cpu_time": round(cpu_eval, 3),
                     "app_time": round(app, 3),
                     "map": round(float(stats[0]), 5)})
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="single small batch size for smoke runs")
    ap.add_argument("--full", action="store_true",
                    help="reference-style batch sweep (slow compiles)")
    ap.add_argument("--protocol", action="store_true",
                    help="reference benchmark.py protocol -> "
                         "benchmark_res.csv (timing + mAP per batch)")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch-sizes", type=int, nargs="*", default=None)
    args = ap.parse_args()

    if args.protocol:
        rows = run_protocol(tuple(args.batch_sizes or (4, 8)),
                            args.img_size)
        print(json.dumps({"metric": "benchmark_protocol",
                          "value": rows[-1]["map"], "unit": "mAP",
                          "vs_baseline": 0.0, "rows": rows}))
        return

    if args.batch_sizes:
        sizes = tuple(args.batch_sizes)
    elif args.quick:
        sizes = (4,)
    elif args.full:
        sizes = (2, 4, 8, 16, 32, 64, 128)
    else:
        sizes = (64,)

    best, results = run(sizes, args.img_size)
    print(json.dumps({
        "metric": f"yolov3_{args.img_size}sq_e2e_inference_throughput",
        "value": round(best, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / PER_CHIP_TARGET, 4),
        "per_batch": {str(k): round(v, 2) for k, v in results.items()},
        "device": str(jax.devices()[0].platform),
    }))


if __name__ == "__main__":
    main()
