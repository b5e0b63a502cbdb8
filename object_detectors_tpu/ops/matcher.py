"""Vectorized GT<->prediction matchers with static padded shapes.

Reimplements the semantics of the reference Matcher
(`torchvision_models/tvision/_utils.py:226-344`): three-way thresholding
(matched / BETWEEN_THRESHOLDS / BELOW_LOW_THRESHOLD) plus optional
low-quality-match recovery (every GT keeps its best prediction(s), ties
included), and the SSDMatcher (`_utils.py:347-361`) which additionally
force-assigns each GT's single best prediction.

TPU design: ground truth is padded to a fixed M with a validity mask, so all
matching is a single [M, N] reduction — no per-image Python loops, no
dynamic shapes, vmap-able over the batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2


@partial(jax.jit, static_argnames=("high_threshold", "low_threshold",
                                   "allow_low_quality_matches"))
def match(
    match_quality: jnp.ndarray,
    gt_valid: jnp.ndarray,
    high_threshold: float,
    low_threshold: float,
    allow_low_quality_matches: bool = False,
) -> jnp.ndarray:
    """Assign each prediction the best valid GT, with threshold stratification.

    Args:
      match_quality: [M, N] quality (e.g. IoU) between M padded GTs and N
        predictions.
      gt_valid: [M] bool — False rows are padding and can never match.
      high_threshold / low_threshold: stratification cut points.
      allow_low_quality_matches: recover each GT's argmax predictions
        (including ties) even if below threshold.

    Returns:
      [N] int32: matched GT index in [0, M), or BELOW_LOW_THRESHOLD (-1) /
      BETWEEN_THRESHOLDS (-2).
    """
    neg_inf = jnp.asarray(-jnp.inf, match_quality.dtype)
    quality = jnp.where(gt_valid[:, None], match_quality, neg_inf)

    matched_vals = jnp.max(quality, axis=0)  # [N]
    all_matches = jnp.argmax(quality, axis=0).astype(jnp.int32)  # [N]

    matches = jnp.where(
        matched_vals < low_threshold, BELOW_LOW_THRESHOLD, all_matches
    )
    matches = jnp.where(
        (matched_vals >= low_threshold) & (matched_vals < high_threshold),
        BETWEEN_THRESHOLDS,
        matches,
    )

    if allow_low_quality_matches:
        # For each valid GT: the set of predictions achieving its max quality
        # (ties included) gets its original argmax assignment restored
        # (_utils.py:319-344).
        highest_per_gt = jnp.max(quality, axis=1, keepdims=True)  # [M, 1]
        is_best_for_some_gt = jnp.any(
            (quality == highest_per_gt) & gt_valid[:, None]
            & jnp.isfinite(highest_per_gt), axis=0
        )  # [N]
        matches = jnp.where(is_best_for_some_gt, all_matches, matches)

    return matches


@partial(jax.jit, static_argnames=("threshold",))
def ssd_match(
    match_quality: jnp.ndarray,
    gt_valid: jnp.ndarray,
    threshold: float = 0.5,
) -> jnp.ndarray:
    """SSDMatcher semantics (`_utils.py:347-361`): single-threshold match,
    then each valid GT force-claims its best prediction.

    Duplicate best-prediction collisions resolve to the highest GT index,
    matching torch's last-write-wins on CPU.
    """
    matches = match(match_quality, gt_valid, threshold, threshold, False)

    quality = jnp.where(
        gt_valid[:, None], match_quality,
        jnp.asarray(-jnp.inf, match_quality.dtype),
    )
    best_pred_per_gt = jnp.argmax(quality, axis=1)  # [M]
    m = match_quality.shape[0]
    gt_ids = jnp.arange(m, dtype=jnp.int32)
    # Scatter gt index into its best pred slot; only valid GTs write. Use a
    # one-hot max composition so collisions deterministically take the
    # largest gt index.
    claim = jnp.full_like(matches, -10_000_000)
    claim = claim.at[best_pred_per_gt].max(
        jnp.where(gt_valid, gt_ids, -10_000_000)
    )
    return jnp.where(claim >= 0, claim, matches)


@partial(jax.jit, static_argnames=("iou_type",))
def yolo_best_prior_match(
    gt_boxes: jnp.ndarray,
    priors: jnp.ndarray,
    iou_type: int = 0,
) -> jnp.ndarray:
    """YOLO assignment (`yolo/nets/yolo_forw.py:183-189`): each GT box claims
    the prior (grid cell x anchor) with max IoU.

    Args:
      gt_boxes: [M, 4] cxcywh (relative).
      priors:   [P, 4] cxcywh (relative) grid priors.
    Returns:
      [M] int32 best prior index per GT.
    """
    from object_detectors_tpu.ops import boxes as box_ops

    iou = box_ops.box_iou(
        gt_boxes[:, None, :], priors[None, :, :], iou_type=iou_type
    )  # [M, P]
    return jnp.argmax(iou, axis=1).astype(jnp.int32)
