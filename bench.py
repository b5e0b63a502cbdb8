"""Benchmark harness — the reference `yolo/benchmark.py` protocol rebuilt
for TPU, covering ALL FIVE BASELINE.json configs:

1. yolo640      — YOLOv3 640² e2e (uint8 in, on-device normalize,
                  decode + majority NMS)
2. retinanet640 — RetinaNet R50-FPN eval postprocess
3. frcnn640     — Faster R-CNN two-stage eval
4. yolo_lvis416 — YOLO with 1203 LVIS classes (long-tail NMS)
5. serving      — mixed YOLO+RetinaNet stream (serve.py scheduler)

Honest e2e: the timed graph starts from raw uint8 images and casts +
normalizes ON DEVICE; distinct pre-staged device batches are cycled
with back-to-back async dispatch and one final host read. True H2D is
excluded because the dev relay tunnel moves ~50 MB/s (production PCIe
is <3ms for a bs64 batch; per-dispatch sync costs ~2-3s of relay RPC
and would measure the relay, not the TPU — BASELINE.md methodology).

Optimizations over the naive pipeline:
* scores/labels computed straight from raw logits (sigmoid(obj) *
  exp(max - logsumexp)) — no full [B, P, 85] decode materialization;
* only the top-k candidate rows are gathered and decoded to boxes;
* majority-vote NMS is the K-step select-max scan (ops/nms.py);
* bfloat16 backbone, f32 box math;
* persistent XLA compilation cache (first driver run warm-starts).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"configs": {...}}. ``vs_baseline`` is value / 500 — the BASELINE.json
north star is 4000 imgs/sec e2e on a v5e-8 (8 chips) = 500/chip.
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
                   dtype=jnp.bfloat16, conf=0.1, iou_thr=0.6,
                   variables=None, backbone_layers=None):
    cfg = YC.YoloLossConfig(num_classes=num_classes, img_size=img_size)
    extra = {} if backbone_layers is None else {
        "backbone_layers": tuple(backbone_layers)}
    model = YoloHead(num_classes=num_classes, dtype=dtype, **extra)
    if variables is None:
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

        topv, topi = jax.vmap(lambda s: N.exact_blocked_topk(s, topk))(score)
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


def build_pipeline_uint8(num_classes=80, img_size=640, topk=256,
                         max_det=100, dtype=jnp.bfloat16, conf=0.1,
                         iou_thr=0.6):
    """uint8-input variant: on-device /255 + ImageNet normalize fused in
    front of the same graph (the e2e definition in BASELINE.json)."""
    from object_detectors_tpu.kernels.preprocess import preprocess_images

    core = build_pipeline(num_classes, img_size, topk, max_det, dtype,
                          conf, iou_thr)

    @jax.jit
    def infer(u8):
        return core(preprocess_images(u8, dtype))

    return infer


# TPU v5e bf16 peak (197 TFLOP/s); override for other chips.
PEAK_FLOPS = float(os.environ.get("TPU_PEAK_FLOPS", 197e12))


def _graph_flops(infer, *example):
    """Optimized-HLO FLOP count of the jitted graph (XLA cost
    analysis) — the numerator for per-config MFU (VERDICT r4 item 7:
    judge perf rounds on utilization headroom, not just img/s)."""
    try:
        c = jax.jit(infer).lower(*example).compile()
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        fl = float(ca.get("flops", 0.0))
        return fl if fl > 0 else None
    except Exception:
        return None


def _mfu(flops, dt):
    if flops is None or not dt:
        return None
    return round(flops / dt / PEAK_FLOPS, 4)


def _timed_stream(infer, host_batches, warmup=2, iters=10):
    """Cycle DISTINCT pre-staged uint8 device batches, dispatch
    back-to-back, one final host read.

    The batches are device_put OUTSIDE the timed loop: through the dev
    relay, H2D runs at ~50 MB/s (a 640^2 bs64 uint8 batch takes ~1.6s),
    which measures the tunnel rather than the TPU. Production PCIe H2D
    for the same batch is <3ms — the uint8 cast + normalize stays
    on-device inside the timed graph, so the measured pipeline is the
    production image->boxes program minus host JPEG decode."""
    dev_batches = [jax.device_put(b) for b in host_batches]
    for i in range(warmup):
        out = infer(dev_batches[i % len(dev_batches)])
    jax.block_until_ready(out)
    float(np.asarray(out[1]).sum())  # true host read
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(infer(dev_batches[i % len(dev_batches)]))
    # final sync: host-read a checksum of the LAST output (relay-proof)
    s = float(np.asarray(outs[-1][1]).sum())
    dt = (time.perf_counter() - t0) / iters
    del s
    return dt


def run(batch_sizes=(64,), img_size=640, warmup=2, iters=10,
        uint8=True):
    build = build_pipeline_uint8 if uint8 else build_pipeline
    infer = build(img_size=img_size)
    best = 0.0
    results = {}
    rng = np.random.RandomState(0)
    for bs in batch_sizes:
        if uint8:
            batches = [rng.randint(0, 255, (bs, img_size, img_size, 3),
                                   dtype=np.uint8) for _ in range(3)]
        else:
            batches = [np.asarray(
                rng.rand(bs, img_size, img_size, 3), np.float32
            ).astype(jnp.bfloat16) for _ in range(3)]
        dt = _timed_stream(infer, batches, warmup, iters)
        ips = bs / dt
        results[bs] = ips
        if ips >= best:
            best_mfu = _mfu(_graph_flops(infer, batches[0]), dt)
        best = max(best, ips)
    return best, results, best_mfu


def run_train_step(bs=128, img_size=416, warmup=2, iters=10):
    """YOLO SPMD training step (fwd+bwd+SGD, bf16) img/s/chip — the r1
    measurement (382 img/s) re-taken each round (VERDICT r2 item 10).

    bs=128 (r4): the step is MXU-bound and batch amortizes the fixed
    dispatch + loss overheads — analysis/train_ablate measured 395
    (bs16) -> 405.9 (bs32) -> 440.6 (bs64) -> 534.3 (bs128) img/s;
    bs16 was the r1-r3 setting."""
    import optax

    from object_detectors_tpu.models import yolo_criterion as YC
    from object_detectors_tpu.models.yolo import YoloHead
    from object_detectors_tpu.train import trainer

    cfg = YC.YoloLossConfig(num_classes=80, img_size=img_size)
    model = YoloHead(num_classes=80, dtype=jnp.bfloat16)
    tx = optax.sgd(1e-3, momentum=0.9)
    state = trainer.create_yolo_train_state(model, tx, img_size,
                                            jax.random.key(0))
    rng = np.random.RandomState(3)
    batches = [dict(
        images=jnp.asarray(rng.rand(bs, img_size, img_size, 3)
                           .astype(np.float32)),
        gt_boxes=jnp.asarray(rng.rand(bs, 32, 4).astype(np.float32)
                             * 0.5 + 0.25),
        gt_labels=jnp.asarray(rng.randint(0, 80, (bs, 32))),
        gt_valid=jnp.asarray(rng.rand(bs, 32) < 0.5),
    ) for _ in range(3)]

    def step(st, b):
        new_state, metrics = trainer.yolo_train_step(
            st, b["images"], b["gt_boxes"], b["gt_labels"],
            b["gt_valid"], cfg, 80)
        return new_state, metrics["loss"]

    jf = jax.jit(step)
    st = state
    for i in range(warmup):
        st, loss = jf(st, batches[i % 3])
    float(np.asarray(loss))
    t0 = time.perf_counter()
    for i in range(iters):
        st, loss = jf(st, batches[i % 3])
    s = float(np.asarray(loss))
    dt = (time.perf_counter() - t0) / iters
    del s
    return bs / dt, _mfu(_graph_flops(step, st, batches[0]), dt)


def run_retinanet(bs=16, img_size=640, warmup=2, iters=8,
                  select_mode="perlevel"):
    """BASELINE config 2: RetinaNet R50-FPN eval, uint8 e2e.

    bs=16: the serve-pipeline A/B on a quiet chip (queue_r5d) read
    bs16 337.5 > bs32 328.5 with the batched select; the r4f "bs32
    395.0" row did not reproduce. select_mode default follows the
    r5e serve-pipeline A/B (batched vs perlevel)."""
    from object_detectors_tpu.serve import build_retinanet_pipeline

    infer = build_retinanet_pipeline(img_size=img_size, uint8_input=True,
                                     select_mode=select_mode)
    rng = np.random.RandomState(1)
    batches = [rng.randint(0, 255, (bs, img_size, img_size, 3),
                           dtype=np.uint8) for _ in range(3)]
    dt = _timed_stream(infer, batches, warmup, iters)
    return bs / dt, _mfu(_graph_flops(infer, batches[0]), dt)


def run_frcnn(bs=16, img_size=640, warmup=2, iters=8,
              dtype=jnp.bfloat16):
    """BASELINE config 3: Faster R-CNN two-stage eval, uint8 e2e."""
    from object_detectors_tpu.kernels.preprocess import preprocess_images
    from object_detectors_tpu.models import faster_rcnn as FR

    model = FR.FasterRCNN(FR.FasterRCNNConfig(num_classes=91),
                          dtype=dtype)
    variables = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, img_size, img_size, 3), dtype), train=False)

    @jax.jit
    def infer(u8, v):
        return model.apply(v, preprocess_images(u8, dtype), train=False)

    rng = np.random.RandomState(2)
    batches = [rng.randint(0, 255, (bs, img_size, img_size, 3),
                           dtype=np.uint8) for _ in range(3)]
    infer_v = lambda x: infer(x, variables)  # noqa: E731
    dt = _timed_stream(infer_v, batches, warmup, iters)
    return bs / dt, _mfu(_graph_flops(infer, batches[0], variables), dt)


def run_yolo_lvis(bs=16, img_size=416, warmup=2, iters=8,
                  num_classes=1203, topk=300):
    """BASELINE config 4: YOLO + 1203-class LVIS decode/majority-NMS.

    Params are passed as ARGUMENTS (a 1203-class closure exceeds the dev
    relay's /remote_compile body limit — BASELINE.md methodology)."""
    from object_detectors_tpu.kernels.preprocess import preprocess_images
    from object_detectors_tpu.ops import nms as N

    dtype = jnp.bfloat16
    cfg = YC.YoloLossConfig(num_classes=num_classes, img_size=img_size)
    model = YoloHead(num_classes=num_classes, dtype=dtype)
    x0 = jnp.zeros((1, img_size, img_size, 3), dtype)
    variables = model.init(jax.random.key(0), x0, train=False)

    @jax.jit
    def infer(u8, v):
        images = preprocess_images(u8, dtype)
        outs = model.apply(v, images, train=False)
        raw = YC.flatten_raw_outputs(outs, num_classes, 3)
        priors, gw = YC.make_priors(cfg, tuple(o.shape[1] for o in outs))
        obj = raw[..., 4].astype(jnp.float32)
        logits = raw[..., 5:].astype(jnp.float32)
        max_l = jnp.max(logits, -1)
        lse = jax.nn.logsumexp(logits, -1)
        score = jax.nn.sigmoid(obj) * jnp.exp(max_l - lse)
        label = jnp.argmax(logits, -1).astype(jnp.int32)
        topv, topi = jax.vmap(lambda s: N.exact_blocked_topk(s, topk))(score)
        sel = jnp.take_along_axis(
            raw[..., :4].astype(jnp.float32), topi[..., None], 1)
        sp = priors[topi]
        sgw = gw[topi]
        strides = (img_size / sgw)[..., None]
        xy = (jax.nn.sigmoid(sel[..., 0:2])
              + sp[..., 0:2] * sgw[..., None] - 0.5) * strides
        wh = jnp.exp(sel[..., 2:4]) * sp[..., 2:4] * sgw[..., None] \
            * strides
        boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)
        labels = jnp.take_along_axis(label, topi, 1)
        f = jax.vmap(lambda b, s, c, v: N.nms_majority(
            b, s, c, num_classes=num_classes, iou_threshold=0.6,
            max_output=300, valid=v))
        return f(boxes, topv, labels, topv > 0.1)

    rng = np.random.RandomState(3)
    batches = [rng.randint(0, 255, (bs, img_size, img_size, 3),
                           dtype=np.uint8) for _ in range(3)]
    infer_v = lambda x: infer(x, variables)  # noqa: E731
    dt = _timed_stream(infer_v, batches, warmup, iters)
    return bs / dt, _mfu(_graph_flops(infer, batches[0], variables), dt)


def run_serving(n_requests=256, img_size=640, yolo_bs=64, retina_bs=16):
    """BASELINE config 5: mixed YOLO+RetinaNet stream through the
    batched serving scheduler (uint8 requests, async in-flight).

    Flush sizes 64/16 (r4): the stream is kernel-bound
    (relay_bound: false), so bigger flushes amortize per-flush
    dispatch — serving_ablate measured 459.9 img/s at 64/16 vs ~424
    at the r3 setting 32/8."""
    from object_detectors_tpu import serve as S

    pipelines = {
        "yolo": S.build_yolo_pipeline(img_size=img_size,
                                      batch_size=yolo_bs,
                                      uint8_input=True),
        "retinanet": S.build_retinanet_pipeline(img_size=img_size,
                                                uint8_input=True),
    }
    server = S.BatchedDetectionServer(
        pipelines, {"yolo": yolo_bs, "retinanet": retina_bs},
        input_dtype=jnp.uint8)
    rng = np.random.RandomState(4)
    # device-stage ONE image pool tensor OUTSIDE the timed window; the
    # timed stream submits slot indices, so each flush is a single fused
    # gather+infer dispatch with one packed result fetch (per-request
    # H2D through the dev relay runs ~50 MB/s and would measure the
    # tunnel, not the scheduler+TPU)
    server.stage_pool(rng.randint(
        0, 255, (32, img_size, img_size, 3), dtype=np.uint8))
    reqs = [S.Request(i, "yolo" if i % 5 else "retinanet", i % 32)
            for i in range(n_requests)]
    # warmup compiles
    server.run_stream(reqs[: yolo_bs + retina_bs])
    t0 = time.perf_counter()
    out = server.run_stream(reqs)
    dt = time.perf_counter() - t0
    assert len(out) >= n_requests
    return n_requests / dt


def run_nms_latency(bs=512, n_cand=256, max_det=100, num_classes=80,
                    iters=20, unroll=2):
    """BASELINE named metric: p50 NMS latency per image. Times the
    batched majority-vote NMS (the YOLO production variant) standalone
    on device-resident candidates; reports the median per-iteration
    batch time divided by batch size, in microseconds. bs is large so
    per-dispatch relay overhead (~15ms) stays below the kernel's own
    execution time."""
    def uniform(rng):
        xy = rng.rand(bs, n_cand, 2) * 600
        wh = rng.rand(bs, n_cand, 2) * 120 + 1
        return np.concatenate([xy, xy + wh], -1).astype(np.float32)

    def clustered(rng):
        """Crowded-scene candidates (the reference's motivating case for
        majority NMS): ~12 dense clusters per image -> deep suppression
        chains."""
        centers = rng.rand(bs, 12, 2) * 560 + 40
        assign = rng.randint(0, 12, (bs, n_cand))
        cxy = np.take_along_axis(centers, assign[..., None], axis=1)
        jitter = rng.randn(bs, n_cand, 2) * 10
        wh = rng.rand(bs, n_cand, 2) * 40 + 40
        xy = cxy + jitter - wh / 2
        return np.concatenate([xy, xy + wh], -1).astype(np.float32)

    def adversarial(rng):
        """Worst-case suppression chain: box i overlaps box i+1 at IoU
        8/12=0.67 > 0.6 but box i+2 at 6/14=0.43 < 0.6, and scores
        DESCEND along the chain, so greedy keeps 0,2,4,... and the
        fixed-point needs ~n_cand/2 iterations (the intrinsic it<N
        worst case — this distribution bounds the p99). Returns
        (boxes, scores): chain depth requires monotone scores."""
        x = np.arange(n_cand, dtype=np.float32) * 2.0
        one = np.stack([x, np.zeros_like(x), x + 10,
                        np.full_like(x, 10.0)], -1)
        boxes = np.tile(one[None], (bs, 1, 1))
        scores = np.tile(np.linspace(1.0, 0.5, n_cand,
                                     dtype=np.float32)[None], (bs, 1))
        return boxes, scores

    f = jax.jit(jax.vmap(lambda b, s, c: N.nms_majority(
        b, s, c, num_classes=num_classes, iou_threshold=0.6,
        max_output=max_det, unroll=unroll)))

    results = {}
    for name, gen in (("uniform", uniform), ("clustered", clustered),
                      ("adversarial", adversarial)):
        rng = np.random.RandomState(5)
        out_gen = gen(rng)
        if isinstance(out_gen, tuple):
            boxes_np, scores_np = out_gen
        else:
            boxes_np = out_gen
            scores_np = rng.rand(bs, n_cand).astype(np.float32)
        boxes = jnp.asarray(boxes_np)
        scores = jnp.asarray(scores_np)
        labels = jnp.asarray(rng.randint(0, num_classes, (bs, n_cand)))
        for _ in range(3):
            out = f(boxes, scores, labels)
        float(np.asarray(out[1]).sum())
        times = []
        for _ in range(7):
            t0 = time.perf_counter()
            outs = [f(boxes, scores, labels) for _ in range(iters)]
            s = float(np.asarray(outs[-1][1]).sum())
            times.append((time.perf_counter() - t0) / iters)
            del s
        times = np.sort(times)
        # each sample is a mean over `iters` async dispatches (per-
        # dispatch tails are unobservable without 28ms host syncs), so
        # the worst sample is a max-of-means — label it as such, not p99
        results[name] = {
            "p50_us": float(np.median(times)) / bs * 1e6,
            "max_mean_us": float(times[-1]) / bs * 1e6,
        }
    return results


def run_protocol(batch_sizes=(2, 4, 8, 16, 32, 64, 128), img_size=416,
                 num_images=256, out_csv="benchmark_res.csv", runs=2):
    """The reference benchmark.py protocol (yolo/benchmark.py:17-157):
    per batch size in the reference's {2..128} ladder x ``runs`` runs
    (benchmark.py:23 repeats each size), time forward+decode+NMS vs
    CPU-eval vs total app time, run full COCO-protocol eval, append a
    CSV row per run. Compile is excluded (explicit warm-up before the
    app window — the r3 CSV's bs4 row was compile-polluted). Runs on a
    synthetic COCO-val stand-in (no datasets on disk)."""
    import csv

    import numpy as np

    from object_detectors_tpu.data import coco as D
    from object_detectors_tpu.data import synthetic
    from object_detectors_tpu.eval import evaluator as E

    # Trained-weight artifact (analysis/make_artifacts.py): when present,
    # the protocol scores the TRAINED tiny model on its renderable
    # synthetic val set, so the mAP column is a real regression signal
    # (the reference scores pretrained yolov3 on COCO-val,
    # benchmark.py:128-143; this rig has no pretrained weights/egress).
    from object_detectors_tpu.analysis.make_artifacts import (
        load_yolo_artifact,
    )

    variables, meta = load_yolo_artifact()
    if variables is not None:
        img_size = meta["img_size"]
        num_classes = meta["num_classes"]
        gt, loader = synthetic.renderable_dataset(
            np.random.RandomState(1), num_images=num_images,
            img_size=96, num_classes=num_classes)
        ds = D.CocoDetectionDataset(gt, label_mode="lvis0",
                                    image_loader=loader)
        infer = build_pipeline(
            num_classes=num_classes, img_size=img_size, topk=64,
            max_det=20, variables=variables,
            backbone_layers=tuple(meta["backbone_layers"]))
    else:
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
        for _ in range(runs):
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
                          np.asarray(v)[keep],
                          batch["scale_factors"][keep])
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
    ap.add_argument("--configs", nargs="*", default=None,
                    help="subset of {yolo640,retinanet640,frcnn640,"
                         "yolo_lvis416,serving}; default: all five")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch-sizes", type=int, nargs="*", default=None)
    ap.add_argument("--device-resident", action="store_true",
                    help="pre-normalized device inputs (the round-1 "
                         "metric) instead of uint8 H2D e2e")
    args = ap.parse_args()

    if args.protocol:
        rows = run_protocol(
            tuple(args.batch_sizes or (2, 4, 8, 16, 32, 64, 128)),
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
        sizes = (128,)

    wanted = args.configs or ["yolo640", "retinanet640", "frcnn640",
                              "yolo_lvis416", "serving"]
    if args.quick:
        wanted = args.configs or ["yolo640"]
    configs = {}
    best, results, ymfu = run(sizes, args.img_size,
                              uint8=not args.device_resident)
    configs["yolo640"] = {
        "value": round(best, 2), "mfu": ymfu,
        "per_batch": {str(k): round(v, 2) for k, v in results.items()}}
    if "retinanet640" in wanted:
        v, m = run_retinanet()
        configs["retinanet640"] = {"value": round(v, 2), "mfu": m}
    if "frcnn640" in wanted:
        v, m = run_frcnn()
        configs["frcnn640"] = {"value": round(v, 2), "mfu": m}
    if "yolo_lvis416" in wanted:
        v, m = run_yolo_lvis()
        configs["yolo_lvis416"] = {"value": round(v, 2), "mfu": m}
    if "train_step" in wanted or (args.configs is None
                                  and not args.quick):
        v, m = run_train_step()
        configs["yolo_train416"] = {"value": round(v, 2), "mfu": m}
    if not args.quick:
        nms_res = run_nms_latency()
        configs["nms_p50_latency"] = {
            "value": round(nms_res["uniform"]["p50_us"], 2),
            "unit": "us/image",
            "distributions": {
                k: {m: round(x, 2) for m, x in v.items()}
                for k, v in nms_res.items()}}
    if "serving" in wanted:
        try:
            configs["serving"] = {"value": round(run_serving(), 2)}
        except Exception as e:  # serving is the stretch config
            configs["serving"] = {"error": str(e)[:200]}
    for v in configs.values():
        if "value" in v and v.get("unit") is None:  # throughput configs
            v["vs_baseline"] = round(v["value"] / PER_CHIP_TARGET, 4)

    print(json.dumps({
        "metric": f"yolov3_{args.img_size}sq_e2e_uint8_throughput",
        "value": configs["yolo640"]["value"],
        "unit": "images/sec/chip",
        "vs_baseline": configs["yolo640"]["vs_baseline"],
        "configs": configs,
        "e2e": ("device-staged uint8 + on-device normalize in the "
                "timed graph; H2D excluded (dev-relay tunnel ~50MB/s "
                "is not representative; production PCIe adds <3ms)"
                if not args.device_resident else "device-resident"),
        "device": str(jax.devices()[0].platform),
    }))


if __name__ == "__main__":
    main()
