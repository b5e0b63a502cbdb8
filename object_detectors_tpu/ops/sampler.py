"""Balanced positive/negative sampling with explicit JAX PRNG keys.

Reimplements `torchvision_models/tvision/_utils.py:10-76`
(BalancedPositiveNegativeSampler): per image, pick up to
``batch_size * positive_fraction`` positives and fill the rest with
negatives, uniformly at random without replacement.

TPU design: instead of randperm + index_select (dynamic shapes), each
candidate gets a uniform random score; we rank candidates of each polarity
and keep the top ``num_pos`` / ``num_neg`` by rank. Shapes stay [N] masks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _topk_mask_by_score(score: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask selecting the k highest-scoring entries of score.

    k may be a traced scalar; score should be -inf for ineligible entries.
    """
    n = score.shape[0]
    order = jnp.argsort(-score)  # descending
    ranks = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return (ranks < k) & jnp.isfinite(score)


@partial(jax.jit, static_argnames=("batch_size_per_image", "positive_fraction"))
def balanced_sample(
    labels: jnp.ndarray,
    key: jax.Array,
    batch_size_per_image: int,
    positive_fraction: float,
):
    """Sample a balanced set of positives and negatives.

    Args:
      labels: [N] — >=1 positive, 0 negative, <0 ignored (reference uses
        -1 for ignore / -2 between-thresholds).
      key: PRNG key.
      batch_size_per_image: total samples to draw.
      positive_fraction: target fraction of positives.

    Returns:
      (pos_mask, neg_mask): [N] bool masks of selected samples.
    """
    is_pos = labels >= 1
    is_neg = labels == 0

    max_pos = int(batch_size_per_image * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(is_pos), max_pos)
    num_neg = jnp.minimum(jnp.sum(is_neg), batch_size_per_image - num_pos)

    kp, kn = jax.random.split(key)
    neg_inf = -jnp.inf
    pos_score = jnp.where(is_pos, jax.random.uniform(kp, labels.shape), neg_inf)
    neg_score = jnp.where(is_neg, jax.random.uniform(kn, labels.shape), neg_inf)

    return (
        _topk_mask_by_score(pos_score, num_pos),
        _topk_mask_by_score(neg_score, num_neg),
    )
