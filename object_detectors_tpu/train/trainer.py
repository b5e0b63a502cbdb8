"""SPMD training step for the YOLO stack.

Replaces the reference's per-GPU training loop
(`yolo/procedures/train_one_epoch.py:30-121`: H2D copies, apex AMP scale,
DDP gradient all-reduce, `dist.all_reduce` of loss/stat meters) with one
jitted program over a `Mesh`:

* batch sharded on the ``data`` axis, state replicated — XLA inserts the
  gradient all-reduce (there is no DDP object);
* bf16 activations via the model's ``dtype`` (apex O1/O2 equivalent;
  bf16 needs no loss scaling), f32 master params and loss math;
* the 6 sub-losses + 5 stats are computed globally in the same program —
  the reference's `dist.all_reduce(avg_losses)` disappears;
* multiscale training (train_one_epoch.py:15-26) becomes a set of
  pre-compiled resolution buckets — jit specializes per static shape, so
  changing ``img_size`` costs one compile per bucket, then free.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import core as flax_core
from flax import struct

from object_detectors_tpu.models import yolo_criterion as YC
from object_detectors_tpu.models.yolo import YoloHead


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )


def create_yolo_train_state(
    model: YoloHead,
    tx: optax.GradientTransformation,
    img_size: int,
    rng: jax.Array,
) -> TrainState:
    x = jnp.zeros((1, img_size, img_size, 3), model.dtype)
    variables = model.init(rng, x, train=False)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", flax_core.freeze({})),
        tx=tx,
    )


@partial(jax.jit, static_argnames=("cfg", "num_classes", "anchors_per_scale"),
         donate_argnums=(0,))
def yolo_train_step(
    state: TrainState,
    images: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: YC.YoloLossConfig,
    num_classes: int,
    anchors_per_scale: int = 3,
    class_weights: jnp.ndarray | None = None,
    idf_logits: jnp.ndarray | float = 1.0,
):
    """One SPMD step. images [B,H,W,3] (H==W==cfg.img_size), GT padded.

    Returns (new_state, metrics dict with loss, 6 sub-losses, 5 stats).
    """

    def loss_fn(params):
        outputs, new_model_state = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        raw = YC.flatten_raw_outputs(
            outputs, num_classes, anchors_per_scale).astype(jnp.float32)
        grids = tuple(o.shape[1] for o in outputs)
        priors, grid_w = YC.make_priors(cfg, grids)
        loss, sub, stats = YC.yolo_loss(
            raw, priors, grid_w, gt_boxes, gt_labels, gt_valid, cfg,
            class_weights=class_weights, idf_logits=idf_logits,
        )
        return loss, (sub, stats, new_model_state)

    (loss, (sub, stats, new_model_state)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)

    updates, new_opt_state = state.tx.update(
        grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_model_state.get("batch_stats", state.batch_stats),
        opt_state=new_opt_state,
    )
    metrics = {
        "loss": loss,
        "sub_losses": sub,     # xy, wh, iou, pos_conf, neg_conf, cls
        "stats": stats,        # avg_iou, pos_conf, no_obj_conf, pos/neg class
        "grad_norm": optax.global_norm(grads),
    }
    return new_state, metrics


@partial(jax.jit, static_argnames=("cfg", "num_classes",
                                   "anchors_per_scale", "out_dim"),
         donate_argnums=(0,))
def yolo_train_step_ingest(
    state: TrainState,
    canvas: jnp.ndarray,     # [B, Hc, Wc, 3] uint8 native-res canvas
    sizes: jnp.ndarray,      # [B, 2] (h, w) true sizes
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: YC.YoloLossConfig,
    num_classes: int,
    out_dim: int | None = None,
    anchors_per_scale: int = 3,
    class_weights: jnp.ndarray | None = None,
    idf_logits: jnp.ndarray | float = 1.0,
):
    """Device-ingest train step: uint8 canvas in, fused bicubic
    resize+normalize (kernels/preprocess.py) INSIDE the jitted step,
    then the same SPMD update as :func:`yolo_train_step` — the whole
    image->gradients path is one program (BASELINE north star; the
    reference resizes on host, `yolo/dsets/transformations.py:10-53`).
    GT is relative cxcywh so the resize never touches it. ``out_dim``
    overrides cfg.img_size for multiscale buckets (one compile per
    bucket, same as the host path)."""
    from object_detectors_tpu.kernels.preprocess import (
        resize_normalize_from_canvas,
    )

    images = resize_normalize_from_canvas(
        canvas, sizes, out_dim or cfg.img_size, jnp.float32)
    return yolo_train_step(
        state, images, gt_boxes, gt_labels, gt_valid, cfg, num_classes,
        anchors_per_scale, class_weights=class_weights,
        idf_logits=idf_logits)


@partial(jax.jit, static_argnames=("cfg", "num_classes", "anchors_per_scale"))
def yolo_eval_step(
    state: TrainState,
    images: jnp.ndarray,
    cfg: YC.YoloLossConfig,
    num_classes: int,
    anchors_per_scale: int = 3,
    idf_logits: jnp.ndarray | float = 1.0,
):
    """Eval decode: images -> [B, P, 5+C] decoded predictions."""
    outputs = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        images, train=False,
    )
    raw = YC.flatten_raw_outputs(
        outputs, num_classes, anchors_per_scale).astype(jnp.float32)
    grids = tuple(o.shape[1] for o in outputs)
    priors, grid_w = YC.make_priors(cfg, grids)
    return YC.yolo_decode(raw, priors, grid_w, cfg, idf_logits)


def multiscale_sizes(base: int, lower: float = 0.5, upper: float = 1.5,
                     divisor: int = 32):
    """The multiscaler's resolution bucket set
    (yolo/procedures/train_one_epoch.py:15-26: random multiple of 32 in
    [lower*base, upper*base]); returned as the static tuple of sizes to
    pre-compile."""
    lo = int(base * lower) // divisor
    hi = int(base * upper) // divisor
    return tuple(d * divisor for d in range(lo, hi + 1))


def pick_scale(rng: jax.Array, sizes) -> int:
    """Host-side random scale draw; in SPMD all hosts fold the same step
    count into the key, so no broadcast is needed (the reference
    dist.broadcast's the drawn size, train_one_epoch.py:24)."""
    idx = int(jax.random.randint(rng, (), 0, len(sizes)))
    return sizes[idx]
