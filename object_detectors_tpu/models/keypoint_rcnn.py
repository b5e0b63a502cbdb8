"""Keypoint R-CNN branch — parity with the keypoint pieces of
`torchvision_models/tvision/roi_heads.py:186-379`.

* KeypointRCNNHeads: 8 x (3x3 conv 512 + ReLU) on 14x14 RoIAligned
  features; KeypointRCNNPredictor: 4x4/s2 deconv + 2x bilinear upscale
  -> K heatmap logits at 56x56.
* keypoints_to_heatmap (:186-230): keypoints map to box-relative heatmap
  cells; valid iff visible and inside the box.
* keypointrcnn_loss (:295-322): softmax cross-entropy over the flattened
  heatmap at each valid keypoint's target cell, mean over valid.
* heatmaps_to_keypoints (:233-292): per keypoint argmax -> image
  coordinates + score. TPU variant: argmax on the fixed 56x56 grid and
  scale to the box (the reference first bilinearly resizes to the exact
  box size; equivalent up to sub-cell quantization, which its own
  offset correction also only approximates).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


class KeypointRCNNHeads(nn.Module):
    layers: int = 8
    features: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_init=nn.initializers.kaiming_normal(),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"kps_fcn{i+1}")(x)
            x = nn.relu(x)
        return x


class KeypointRCNNPredictor(nn.Module):
    num_keypoints: int = 17
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             padding="SAME", dtype=self.dtype,
                             param_dtype=jnp.float32,
                             name="kps_score_lowres")(x)
        b, h, w, k = x.shape
        return jax.image.resize(x, (b, h * 2, w * 2, k), "bilinear")


def keypoints_to_heatmap(keypoints, boxes, heatmap_size: int):
    """[S, K, 3] keypoints (x, y, vis) + [S, 4] boxes ->
    (target_cell [S, K] int, valid [S, K] bool)."""
    x1, y1 = boxes[:, 0:1], boxes[:, 1:2]
    w = jnp.clip(boxes[:, 2:3] - boxes[:, 0:1], 1e-6)
    h = jnp.clip(boxes[:, 3:4] - boxes[:, 1:2], 1e-6)
    sx = heatmap_size / w
    sy = heatmap_size / h
    x = (keypoints[..., 0] - x1) * sx
    y = (keypoints[..., 1] - y1) * sy
    x_int = jnp.floor(x).astype(jnp.int32)
    y_int = jnp.floor(y).astype(jnp.int32)
    # boundary inclusion like the reference: points exactly on the far
    # edge map to the last cell
    x_int = jnp.where(x_int == heatmap_size, heatmap_size - 1, x_int)
    y_int = jnp.where(y_int == heatmap_size, heatmap_size - 1, y_int)
    valid = ((keypoints[..., 2] > 0) & (x_int >= 0) & (y_int >= 0)
             & (x_int < heatmap_size) & (y_int < heatmap_size))
    cell = jnp.clip(y_int, 0, heatmap_size - 1) * heatmap_size + \
        jnp.clip(x_int, 0, heatmap_size - 1)
    return cell, valid


@jax.jit
def keypointrcnn_loss(kp_logits, proposals, gt_keypoints, matched_idxs,
                      pos_mask):
    """kp_logits [B, S, H, H, K]; proposals [B, S, 4];
    gt_keypoints [B, M, K, 3]; matched_idxs [B, S]; pos_mask [B, S]."""
    b, s, hm, _, k = kp_logits.shape

    def per_image(logits, props, kps, midx, pos):
        sel = kps[midx]  # [S, K, 3]
        cell, valid = keypoints_to_heatmap(sel, props, hm)
        valid = valid & pos[:, None]
        flat = logits.reshape(s, hm * hm, k).transpose(0, 2, 1)  # [S,K,HH]
        logp = jax.nn.log_softmax(flat, axis=-1)
        nll = -jnp.take_along_axis(logp, cell[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * valid), jnp.sum(valid)

    loss_sum, count = jax.vmap(per_image)(
        kp_logits, proposals, gt_keypoints, matched_idxs,
        pos_mask)
    # reference: missing valid keypoints -> zero loss contribution
    return jnp.sum(loss_sum) / jnp.maximum(jnp.sum(count), 1.0)


@jax.jit
def heatmaps_to_keypoints(kp_logits, boxes):
    """[B, D, H, H, K] logits + [B, D, 4] boxes ->
    (keypoints [B, D, K, 3] (x, y, vis=1), scores [B, D, K])."""
    b, d, hm, _, k = kp_logits.shape
    flat = kp_logits.reshape(b, d, hm * hm, k)
    probs = jax.nn.softmax(flat, axis=2)
    idx = jnp.argmax(flat, axis=2)  # [B, D, K]
    scores = jnp.take_along_axis(probs, idx[:, :, None, :], axis=2)[
        :, :, 0, :]
    yy = (idx // hm).astype(jnp.float32) + 0.5
    xx = (idx % hm).astype(jnp.float32) + 0.5
    w = jnp.clip(boxes[..., 2] - boxes[..., 0], 1e-6)[..., None]
    h = jnp.clip(boxes[..., 3] - boxes[..., 1], 1e-6)[..., None]
    x = boxes[..., 0][..., None] + xx / hm * w
    y = boxes[..., 1][..., None] + yy / hm * h
    kps = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return kps, scores
