"""Loss functions: BCE/CE with logits, focal family, EQ loss, smooth-L1.

Semantics follow the reference's loss zoo:
* TF-style focal modulation wrapper — `yolo/utilities/custom.py:40-67`
* Equalization (EQ) loss masking rare-class negatives — `custom.py:69-106`
* Quality focal — `custom.py:109-132`; BCE-blur — `custom.py:23-37`
* smooth_BCE label smoothing pair — `custom.py:18-20`
* torchvision `sigmoid_focal_loss` — used by RetinaNet
  (`torchvision_models/tvision/retinanet.py:107-143`)
* smooth-L1 with beta — RPN/RoI losses (`tvision/rpn.py:305`,
  `tvision/roi_heads.py:83-90`)

Everything is elementwise, reduction left to the caller ("none") unless a
``reduction`` argument is given — on TPU we always reduce with explicit
masks because shapes are static/padded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _reduce(x: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


def sigmoid_binary_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, pos_weight: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Numerically-stable BCE-with-logits (torch.nn.BCEWithLogitsLoss
    semantics, incl. ``pos_weight`` scaling of the positive term)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    if pos_weight is not None:
        return -(pos_weight * labels * log_p + (1.0 - labels) * log_not_p)
    return -(labels * log_p + (1.0 - labels) * log_not_p)


def softmax_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """CE with integer labels [..., C] x [...] -> [...].

    ``weight`` is an optional per-class rescaling vector [C] applied like
    torch.nn.CrossEntropyLoss(weight=...) — the per-sample loss is scaled by
    weight[label]. NOTE: torch 'mean' reduction divides by sum of weights;
    callers that need that use :func:`weighted_ce_mean`.
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(
        log_probs, labels[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    if weight is not None:
        nll = nll * weight[labels]
    return nll


def weighted_ce_mean(logits, labels, weight, sample_mask=None):
    """torch CrossEntropyLoss(weight=w, reduction='mean') semantics:
    sum(w[y_i] * nll_i) / sum(w[y_i]) over unmasked samples."""
    nll = softmax_cross_entropy(logits, labels, weight)
    w = weight[labels] if weight is not None else jnp.ones_like(nll)
    if sample_mask is not None:
        nll = nll * sample_mask
        w = w * sample_mask
    return jnp.sum(nll) / jnp.clip(jnp.sum(w), 1e-12)


def focal_modulation(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float,
    alpha: float,
) -> jnp.ndarray:
    """The TF-addons focal factor used by the reference wrapper
    (custom.py:53-61): alpha_factor * (1 - p_t)**gamma."""
    p = jax.nn.sigmoid(logits)
    p_t = labels * p + (1.0 - labels) * (1.0 - p)
    alpha_factor = labels * alpha + (1.0 - labels) * (1.0 - alpha)
    return alpha_factor * (1.0 - p_t) ** gamma


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 1.5,
    alpha: float = 0.25,
    pos_weight: jnp.ndarray | None = None,
    reduction: str = "none",
) -> jnp.ndarray:
    """Reference FocalLoss wrapper around BCE-with-logits (custom.py:40-67)."""
    loss = sigmoid_binary_cross_entropy(logits, labels, pos_weight)
    loss = loss * focal_modulation(logits, labels, gamma, alpha)
    return _reduce(loss, reduction)


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    reduction: str = "none",
) -> jnp.ndarray:
    """torchvision.ops.sigmoid_focal_loss semantics (RetinaNet's loss).

    Differs from :func:`focal_loss` only in default hyperparams and in that
    alpha < 0 disables the alpha factor.
    """
    p = jax.nn.sigmoid(logits)
    ce = sigmoid_binary_cross_entropy(logits, labels)
    p_t = p * labels + (1.0 - p) * (1.0 - labels)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * labels + (1.0 - alpha) * (1.0 - labels)
        loss = alpha_t * loss
    return _reduce(loss, reduction)


def quality_focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 1.5,
    alpha: float = 0.25,
    reduction: str = "none",
) -> jnp.ndarray:
    """Quality focal (custom.py:109-132): |y - p|**gamma modulation."""
    loss = sigmoid_binary_cross_entropy(logits, labels)
    p = jax.nn.sigmoid(logits)
    alpha_factor = labels * alpha + (1.0 - labels) * (1.0 - alpha)
    loss = loss * alpha_factor * jnp.abs(labels - p) ** gamma
    return _reduce(loss, reduction)


def bce_blur_with_logits(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    alpha: float = 0.05,
) -> jnp.ndarray:
    """BCE with reduced missing-label effect (custom.py:23-37). Returns the
    elementwise loss; reference mean-reduces."""
    loss = sigmoid_binary_cross_entropy(logits, labels)
    p = jax.nn.sigmoid(logits)
    dx = p - labels
    alpha_factor = 1.0 - jnp.exp((dx - 1.0) / (alpha + 1e-4))
    return loss * alpha_factor


def smooth_bce_targets(eps: float = 0.1):
    """(positive, negative) label-smoothing targets (custom.py:18-20)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def eq_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    rare_mask: jnp.ndarray,
    gamma: float = 1.5,
    alpha: float = 0.25,
    pos_weight: jnp.ndarray | None = None,
    reduction: str = "none",
) -> jnp.ndarray:
    """Equalization loss (custom.py:69-106): negatives of rare classes are
    excluded from the focal-BCE loss.

    Args:
      logits, labels: [N, C].
      rare_mask: [C] float — 1.0 where the class's image frequency is below
        the rarity threshold (reference: freq_i < 0.0045). The per-element
        weight is clip(rare_mask + labels, 0, 1): positives always count,
        negatives only count for *common* classes... note the reference's
        mask semantics keep rare-class **negatives** (mask=1 keeps them) —
        we reproduce exactly: weight = clip(rare + y, 0, 1).
    """
    weights = jnp.clip(rare_mask[None, :] + labels, 0.0, 1.0)
    loss = focal_loss(logits, labels, gamma, alpha, pos_weight, "none")
    return _reduce(loss * weights, reduction)


def smooth_l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    beta: float = 1.0,
    reduction: str = "none",
) -> jnp.ndarray:
    """torch.nn.functional.smooth_l1_loss with beta (RPN uses beta=1/9)."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
    return _reduce(loss, reduction)


def l1_loss(pred, target, reduction: str = "none"):
    return _reduce(jnp.abs(pred - target), reduction)


def mse_loss(pred, target, reduction: str = "none"):
    return _reduce((pred - target) ** 2, reduction)


def effective_number_weights(cls_num_list: jnp.ndarray, beta: float = 0.9999):
    """Class-balanced 'effective number of samples' weights (CSL),
    semantics of `yolo/nets/yolo_forw.py:55-61` / `detection/train.py` CSL:
    w_c = (1-beta)/(1-beta^n_c), normalized to sum to C."""
    cls_num = jnp.asarray(cls_num_list, jnp.float32)
    effective_num = 1.0 - jnp.power(beta, cls_num)
    w = (1.0 - beta) / effective_num
    return w / jnp.sum(w) * cls_num.shape[0]
