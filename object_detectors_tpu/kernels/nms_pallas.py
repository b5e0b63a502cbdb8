"""Greedy NMS as a single Pallas kernel.

The XLA path (ops/nms.py) runs the K-step select-max scan; each step is
a fused HLO loop iteration. This kernel runs the WHOLE greedy loop
inside one Mosaic program with all state in VMEM:

* boxes live transposed [8, N] (x1;y1;x2;y2;area rows padded to the
  sublane tile) so per-step IoU against the selected box is pure
  lane-wise VPU work;
* the score vector is updated in place in VMEM; no HBM traffic between
  steps;
* outputs are the [K] keep indices + validity, identical semantics to
  ops.nms.nms (suppress IoU > threshold).

Majority-vote labeling stays in the XLA wrapper (cheap once the keep
set is known: vote matrices are recomputed from the suppression order).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, scores_ref, thr_ref, out_idx_ref,
                out_valid_ref, alive_ref):
    # boxes_ref: [8, N] rows = x1, y1, x2, y2, area, 0, 0, 0
    # scores_ref: [1, N]; out_*: [1, K]
    n = scores_ref.shape[1]
    k = out_idx_ref.shape[1]
    thr = thr_ref[0, 0]
    alive_ref[...] = scores_ref[...]

    x1 = boxes_ref[0:1, :]
    y1 = boxes_ref[1:2, :]
    x2 = boxes_ref[2:3, :]
    y2 = boxes_ref[3:4, :]
    area = boxes_ref[4:5, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(step, _):
        alive = alive_ref[...]
        best = jnp.max(alive)
        ok = best > -jnp.inf
        i = jnp.argmax(alive[0, :])
        sel = lane == i
        bx1 = jnp.max(jnp.where(sel, x1, -jnp.inf))
        by1 = jnp.max(jnp.where(sel, y1, -jnp.inf))
        bx2 = jnp.max(jnp.where(sel, x2, -jnp.inf))
        by2 = jnp.max(jnp.where(sel, y2, -jnp.inf))
        barea = jnp.max(jnp.where(sel, area, -jnp.inf))
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        iou = inter / (area + barea - inter + 1e-16)
        kill = (iou > thr) | sel
        alive_ref[...] = jnp.where(ok & kill, -jnp.inf, alive)
        # Mosaic can't store scalars to VMEM: write the step's slot with
        # a masked full-vector store instead.
        at_step = lane_k == step
        out_idx_ref[...] = jnp.where(
            at_step, jnp.where(ok, i.astype(jnp.int32), -1),
            out_idx_ref[...])
        out_valid_ref[...] = jnp.where(
            at_step, jnp.where(ok, 1, 0), out_valid_ref[...])
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@partial(jax.jit, static_argnames=("iou_threshold", "max_output",
                                   "interpret"))
def nms_pallas(boxes: jnp.ndarray, scores: jnp.ndarray,
               iou_threshold: float = 0.5, max_output: int = 100,
               valid: jnp.ndarray | None = None,
               interpret: bool = False):
    """[N, 4] xyxy + [N] scores -> (keep_idx [K], valid [K]).

    Same contract as ops.nms._select_max_nms.
    """
    n = boxes.shape[0]
    s = scores if valid is None else jnp.where(valid, scores, -jnp.inf)
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    rows = jnp.zeros((8, n), jnp.float32)
    rows = rows.at[0:4, :].set(boxes.T.astype(jnp.float32))
    rows = rows.at[4, :].set(area.astype(jnp.float32))

    out_idx, out_valid = pl.pallas_call(
        _nms_kernel,
        out_shape=(jax.ShapeDtypeStruct((1, max_output), jnp.int32),
                   jax.ShapeDtypeStruct((1, max_output), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((1, n), jnp.float32)],
        interpret=interpret,
    )(rows, s[None, :].astype(jnp.float32),
      jnp.asarray([[iou_threshold]], jnp.float32))
    return out_idx[0], out_valid[0] > 0
