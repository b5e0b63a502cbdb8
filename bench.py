"""Benchmark harness — the reference `yolo/benchmark.py` protocol rebuilt
for TPU: end-to-end YOLOv3 COCO-val-shaped inference throughput
(images/sec/chip) as one jitted program (forward + decode + top-k + NMS,
zero host round-trips), swept over batch sizes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 4000 (the BASELINE.json north-star 4000
imgs/sec/chip at 640², v5e-8).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from object_detectors_tpu.models import yolo_criterion as YC
from object_detectors_tpu.models.yolo import YoloHead
from object_detectors_tpu.ops import nms as N

NORTH_STAR = 4000.0  # imgs/sec/chip e2e at 640^2 (BASELINE.json)


def build_pipeline(num_classes=80, img_size=640, topk=512, max_det=100,
                   dtype=jnp.bfloat16):
    cfg = YC.YoloLossConfig(num_classes=num_classes, img_size=img_size)
    model = YoloHead(num_classes=num_classes, dtype=dtype)
    x0 = jnp.zeros((1, img_size, img_size, 3), dtype)
    variables = model.init(jax.random.key(0), x0, train=False)

    @jax.jit
    def infer(images):
        outs = model.apply(variables, images, train=False)
        raw = YC.flatten_raw_outputs(outs, num_classes, 3).astype(jnp.float32)
        priors, gw = YC.make_priors(cfg, tuple(o.shape[1] for o in outs))
        dec = YC.yolo_decode(raw, priors, gw, cfg)
        score = dec[..., 4] * jnp.max(dec[..., 5:], -1)
        cls = jnp.argmax(dec[..., 5:], -1)
        topv, topi = jax.lax.top_k(score, topk)
        xy, wh = dec[..., :2], dec[..., 2:4]
        xyxy = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)
        boxes = jnp.take_along_axis(xyxy, topi[..., None], axis=1)
        labels = jnp.take_along_axis(cls, topi, axis=1)
        keep_valid = topv > 0.1  # reference inf_confidence
        f = jax.vmap(lambda b, s, c, v: N.nms_majority(
            b, s, c, num_classes=num_classes, iou_threshold=0.6,
            max_output=max_det, valid=v))
        return f(boxes, topv, labels, keep_valid)

    return infer


def run(batch_sizes=(16,), img_size=640, warmup=2, iters=8):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="single small batch size for smoke runs")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch-sizes", type=int, nargs="*", default=None)
    args = ap.parse_args()

    if args.batch_sizes:
        sizes = tuple(args.batch_sizes)
    elif args.quick:
        sizes = (4,)
    else:
        sizes = (8, 16, 32, 64)

    best, results = run(sizes, args.img_size)
    print(json.dumps({
        "metric": f"yolov3_{args.img_size}sq_e2e_inference_throughput",
        "value": round(best, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / NORTH_STAR, 4),
        "per_batch": {str(k): round(v, 2) for k, v in results.items()},
        "device": str(jax.devices()[0].platform),
    }))


if __name__ == "__main__":
    main()
