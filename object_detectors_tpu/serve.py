"""Mixed-model batched serving (BASELINE.json config 5: "YOLO+RetinaNet
640x640 bs=64 mixed stream").

The reference has no serving path (training/eval research code only);
this is the production-deployment surface the rebuild adds:

* each model gets one pre-jitted, fixed-batch inference pipeline
  (compile once, reuse forever — XLA static shapes);
* requests are tagged with a model name and accumulate in per-model
  queues; a scheduler flushes a queue when it reaches the batch size or
  a deadline expires, padding short batches with the last image (the
  padding results are dropped on the way out);
* responses preserve request ids, so interleaved streams demultiplex.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Request:
    request_id: int
    model: str
    # [H, W, 3] image (float32/uint8), OR an int slot index into the
    # server's device-resident image pool (see stage_pool) — the pooled
    # form is the production ingest: one gather from one device tensor
    # per flush instead of per-request device arrays.
    image: object


@dataclasses.dataclass
class Response:
    request_id: int
    model: str
    boxes: np.ndarray
    scores: np.ndarray
    labels: np.ndarray
    valid: np.ndarray
    latency_s: float


class BatchedDetectionServer:
    def __init__(self, pipelines: dict[str, Callable], batch_size,
                 max_delay_s: float = 0.01, input_dtype=None):
        """pipelines: {name: jitted fn [B,H,W,3] -> (boxes, scores,
        labels, valid)}. batch_size: int, or {model: int} for per-model
        static batch sizes. input_dtype: cast batches before dispatch so
        request dtype can't trigger a recompile (bfloat16 pipelines!)."""
        self.pipelines = pipelines
        self.input_dtype = input_dtype
        if isinstance(batch_size, int):
            batch_size = {m: batch_size for m in pipelines}
        self.batch_size = batch_size
        self.max_delay_s = max_delay_s
        self.queues: dict[str, deque] = {m: deque() for m in pipelines}
        self.deadlines: dict[str, float] = {}
        # in-flight flushes: device work is dispatched WITHOUT blocking
        # so consecutive batches pipeline on the device; responses are
        # materialized in drain()/poll()
        self.pending: deque = deque()
        self.max_inflight = 4
        self.pool = None                  # device tensor [P, H, W, 3]
        self._pooled_fns: dict[str, Callable] = {}

    def stage_pool(self, images):
        """Stage an image pool on device; requests then carry slot
        indices. Collapses a flush to ONE fused dispatch (gather + cast
        + pipeline, outputs packed into a single tensor) — the round-2
        scheduler dispatched a jnp.stack over N device arrays plus an
        astype plus the pipeline per flush, each a separate RPC through
        the dev relay (~15 ms apiece), which bounded the mixed stream at
        ~32 img/s."""
        self.pool = jax.device_put(images) if not isinstance(
            images, jax.Array) else images
        dt = self.input_dtype

        def make(model):
            core = self.pipelines[model]

            @jax.jit
            def fn(pool, idx):
                batch = jnp.take(pool, idx, axis=0)
                if dt is not None:
                    batch = batch.astype(dt)
                boxes, scores, labels, valid = core(batch)
                return jnp.concatenate(
                    [boxes.astype(jnp.float32),
                     scores.astype(jnp.float32)[..., None],
                     labels.astype(jnp.float32)[..., None],
                     valid.astype(jnp.float32)[..., None]], axis=-1)

            return fn

        self._pooled_fns = {m: make(m) for m in self.pipelines}
        return self.pool

    def submit(self, req: Request):
        q = self.queues[req.model]
        if not q:
            self.deadlines[req.model] = time.perf_counter() + \
                self.max_delay_s
        q.append((req, time.perf_counter()))

    def _flush(self, model: str) -> list[Response]:
        q = self.queues[model]
        bs = self.batch_size[model]
        n = min(len(q), bs)
        items = [q.popleft() for _ in range(n)]
        if isinstance(items[0][0].image, (int, np.integer)):
            # pooled mode: one fused gather+cast+infer dispatch with
            # packed output (see stage_pool)
            slots = [int(it[0].image) for it in items]
            slots += [slots[-1]] * (bs - n)
            idx = jnp.asarray(np.asarray(slots, np.int32))
            packed = self._pooled_fns[model](self.pool, idx)
            self.pending.append((model, items, packed))
            out = []
            if len(self.pending) > self.max_inflight:
                out.extend(self._resolve(self.pending.popleft()))
            return out
        if isinstance(items[0][0].image, jax.Array):
            # device-staged requests: batch on device (no host round
            # trip — the dev-relay H2D tunnel runs ~50 MB/s and would
            # dominate; production ingest DMAs straight to HBM)
            imgs = jnp.stack([it[0].image for it in items])
            if n < bs:
                imgs = jnp.concatenate(
                    [imgs, jnp.repeat(imgs[-1:], bs - n, axis=0)], 0)
            batch = imgs if self.input_dtype is None else \
                imgs.astype(self.input_dtype)
        else:
            imgs = np.stack([it[0].image for it in items])
            if n < bs:  # pad to the static batch
                pad = np.repeat(imgs[-1:], bs - n, axis=0)
                imgs = np.concatenate([imgs, pad], axis=0)
            batch = jnp.asarray(imgs) if self.input_dtype is None else \
                jnp.asarray(imgs, self.input_dtype)
        outputs = self.pipelines[model](batch)  # async dispatch
        self.pending.append((model, items, outputs))
        out = []
        if len(self.pending) > self.max_inflight:
            out.extend(self._resolve(self.pending.popleft()))
        return out

    def _resolve(self, entry) -> list[Response]:
        model, items, outputs = entry
        if isinstance(outputs, jax.Array):  # pooled: ONE packed fetch
            p = np.asarray(outputs)
            boxes, scores = p[..., :4], p[..., 4]
            labels, valid = p[..., 5].astype(np.int32), p[..., 6] > 0.5
        else:
            boxes, scores, labels, valid = outputs
            # one device->host transfer per output tensor, NOT per request
            boxes, scores, labels, valid = (np.asarray(boxes),
                                            np.asarray(scores),
                                            np.asarray(labels),
                                            np.asarray(valid))
        now = time.perf_counter()
        return [Response(req.request_id, model, boxes[i], scores[i],
                         labels[i], valid[i], now - t_in)
                for i, (req, t_in) in enumerate(items)]

    def drain(self) -> list[Response]:
        out = []
        while self.pending:
            out.extend(self._resolve(self.pending.popleft()))
        return out

    def poll(self, force: bool = False) -> list[Response]:
        """Flush any queue that is full or past its deadline."""
        out = []
        now = time.perf_counter()
        for model, q in self.queues.items():
            while len(q) >= self.batch_size[model]:
                out.extend(self._flush(model))
            if q and (force or now >= self.deadlines.get(model, now)):
                out.extend(self._flush(model))
        if force:
            out.extend(self.drain())
        return out

    def run_stream(self, requests) -> list[Response]:
        """Synchronous driver: feed all requests, flush everything."""
        out = []
        for req in requests:
            self.submit(req)
            out.extend(self.poll())
        out.extend(self.poll(force=True))
        return out


def build_yolo_pipeline(num_classes=80, img_size=640, batch_size=64,
                        dtype=jnp.bfloat16, topk=512, max_det=100,
                        uint8_input=False):
    """Standard YOLO serving pipeline (shares the bench graph).

    uint8_input=True prepends the fused on-device normalize (Pallas /
    XLA) so requests ship raw uint8 — 4x less host->device traffic and
    no host-side bf16 conversion (ml_dtypes casts are glacial)."""
    import bench as bench_mod

    core = bench_mod.build_pipeline(num_classes, img_size, topk, max_det,
                                    dtype)
    if not uint8_input:
        return core
    from object_detectors_tpu.kernels.preprocess import preprocess_images

    @jax.jit
    def fn(u8_images):
        return core(preprocess_images(u8_images, dtype))

    return fn


def build_retinanet_pipeline(num_classes=91, img_size=640,
                             resnet_layers=(3, 4, 6, 3),
                             dtype=jnp.bfloat16, uint8_input=False,
                             fused_towers=False, select_mode="fused"):
    from object_detectors_tpu.models import anchors as anchor_lib
    from object_detectors_tpu.models import retinanet as RN

    cfg = RN.RetinaNetConfig(num_classes=num_classes)
    model = RN.RetinaNet(num_classes=num_classes,
                         resnet_layers=tuple(resnet_layers), dtype=dtype,
                         fused_towers=fused_towers)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, img_size, img_size, 3), dtype),
                           train=False)
    s = img_size
    # ceil-chain feature grids (anchors.fpn_grid_sizes docstring)
    grids = anchor_lib.fpn_grid_sizes((s, s))
    sizes, ars = anchor_lib.retinanet_anchor_config()
    anchors = jnp.asarray(anchor_lib.grid_anchors((s, s), grids, sizes,
                                                  ars))

    @jax.jit
    def infer(images):
        if uint8_input:
            from object_detectors_tpu.kernels.preprocess import (
                preprocess_images,
            )

            images = preprocess_images(images, dtype)
        cls, reg, level_sizes = model.apply(variables, images,
                                            train=False)
        return RN.retinanet_postprocess(
            cls, reg, anchors, tuple(level_sizes), (s, s), cfg,
            grids=tuple(grids), select_mode=select_mode)

    return infer
