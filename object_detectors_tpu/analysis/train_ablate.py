"""YOLO training-step stage budget on the real chip (VERDICT r3 item 4:
yolo_train416 is 0.79x with no fwd/bwd budget anywhere in analysis/).

Times cumulative prefixes of the SPMD train step at the bench config
(416², bs16 by default): forward-only, +criterion, value_and_grad,
and the full donated-state optimizer step — plus the device-ingest
variant (uint8 canvas -> fused resize+normalize inside the step).

Usage: python -m object_detectors_tpu.analysis.train_ablate [--bs 16]
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

from object_detectors_tpu.models import yolo_criterion as YC  # noqa: E402
from object_detectors_tpu.models.yolo import YoloHead  # noqa: E402
from object_detectors_tpu.train import optim as O  # noqa: E402
from object_detectors_tpu.train import trainer as T  # noqa: E402


def make_batch(bs, size, rng):
    return dict(
        images=jnp.asarray(rng.rand(bs, size, size, 3).astype(np.float32),
                           jnp.bfloat16),
        gt_boxes=jnp.asarray(
            np.sort(rng.rand(bs, 32, 2, 2), axis=2).reshape(bs, 32, 4)
            .astype(np.float32)),
        gt_labels=jnp.asarray(rng.randint(0, 80, (bs, 32)), jnp.int32),
        gt_valid=jnp.asarray(rng.rand(bs, 32) < 0.5),
    )


def time_fn(fn, *args, warmup=2, iters=12, read=None):
    jf = jax.jit(fn)
    for _ in range(warmup):
        out = jf(*args)
        float(out if read is None else read(out))
    t0 = time.perf_counter()
    outs = [jf(*args) for _ in range(iters)]
    float(outs[-1] if read is None else read(outs[-1]))
    dt = (time.perf_counter() - t0) / iters
    del outs
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--size", type=int, default=416)
    args = ap.parse_args()
    bs, size = args.bs, args.size
    num_classes = 80

    cfg = YC.YoloLossConfig(num_classes=num_classes, img_size=size)
    model = YoloHead(num_classes=num_classes, dtype=jnp.bfloat16)
    tx = O.make_optimizer(O.OptimizerConfig(), O.SchedulerConfig(), 100)
    state = T.create_yolo_train_state(model, tx, size, jax.random.key(0))
    rng = np.random.RandomState(0)
    batch = make_batch(bs, size, rng)

    apply_vars = {"params": state.params, "batch_stats": state.batch_stats}

    def fwd_eval(images):
        outs = model.apply(apply_vars, images, train=False)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    def fwd_train(images):
        outs, _ = model.apply(apply_vars, images, train=True,
                              mutable=["batch_stats"])
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    def fwd_loss(images, gt_boxes, gt_labels, gt_valid):
        outs, _ = model.apply(apply_vars, images, train=True,
                              mutable=["batch_stats"])
        raw = YC.flatten_raw_outputs(outs, num_classes, 3).astype(
            jnp.float32)
        priors, gw = YC.make_priors(cfg, tuple(o.shape[1] for o in outs))
        loss, _, _ = YC.yolo_loss(raw, priors, gw, gt_boxes, gt_labels,
                                  gt_valid, cfg)
        return loss

    def grad_only(images, gt_boxes, gt_labels, gt_valid):
        def loss_fn(p):
            outs, _ = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            raw = YC.flatten_raw_outputs(outs, num_classes, 3).astype(
                jnp.float32)
            priors, gw = YC.make_priors(cfg,
                                        tuple(o.shape[1] for o in outs))
            loss, _, _ = YC.yolo_loss(raw, priors, gw, gt_boxes,
                                      gt_labels, gt_valid, cfg)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return loss + sum(
            jnp.sum(jnp.abs(g).astype(jnp.float32)) * 0
            for g in jax.tree_util.tree_leaves(grads))

    print(f"bs={bs} size={size}")
    rows = [
        ("fwd_eval", lambda: time_fn(fwd_eval, batch["images"])),
        ("fwd_train", lambda: time_fn(fwd_train, batch["images"])),
        ("fwd_loss", lambda: time_fn(
            fwd_loss, batch["images"], batch["gt_boxes"],
            batch["gt_labels"], batch["gt_valid"])),
        ("grad", lambda: time_fn(
            grad_only, batch["images"], batch["gt_boxes"],
            batch["gt_labels"], batch["gt_valid"])),
    ]
    prev = 0.0
    for name, run in rows:
        dt = run()
        print(f"{name:12s} {dt*1e3:8.1f} ms  (+{(dt-prev)*1e3:7.1f})"
              f"  {bs/dt:7.1f} img/s")
        prev = dt

    # full step: donated state chained through iterations (the real
    # bench loop shape — bench.py run_train_step)
    def full_iters(iters=12, warmup=2):
        st = state
        for _ in range(warmup):
            st, m = T.yolo_train_step(
                st, batch["images"], batch["gt_boxes"],
                batch["gt_labels"], batch["gt_valid"], cfg, num_classes)
            float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            st, m = T.yolo_train_step(
                st, batch["images"], batch["gt_boxes"],
                batch["gt_labels"], batch["gt_valid"], cfg, num_classes)
        float(m["loss"])
        return (time.perf_counter() - t0) / iters

    dt = full_iters()
    print(f"{'full_step':12s} {dt*1e3:8.1f} ms  (+{(dt-prev)*1e3:7.1f})"
          f"  {bs/dt:7.1f} img/s")


if __name__ == "__main__":
    main()
