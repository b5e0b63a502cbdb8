"""Matcher / SSDMatcher / balanced-sampler semantics tests
(vs torchvision_models/tvision/_utils.py:10-76, 226-361)."""

import numpy as np
import jax
import jax.numpy as jnp

from object_detectors_tpu.ops import matcher as M
from object_detectors_tpu.ops import sampler as S


def np_matcher(quality, high, low, allow_low_quality):
    """Independent numpy transcription of the Matcher contract."""
    matched_vals = quality.max(axis=0)
    matches = quality.argmax(axis=0)
    all_matches = matches.copy()
    out = matches.copy()
    out[matched_vals < low] = M.BELOW_LOW_THRESHOLD
    out[(matched_vals >= low) & (matched_vals < high)] = M.BETWEEN_THRESHOLDS
    if allow_low_quality:
        highest_per_gt = quality.max(axis=1)
        gt_idx, pred_idx = np.where(quality == highest_per_gt[:, None])
        out[pred_idx] = all_matches[pred_idx]
    return out


def test_matcher_basic_three_way():
    quality = jnp.array(
        [
            [0.9, 0.45, 0.2, 0.0],
            [0.1, 0.6, 0.35, 0.1],
        ]
    )
    valid = jnp.array([True, True])
    out = np.asarray(M.match(quality, valid, 0.5, 0.3, False))
    # pred0: best gt0 @0.9 -> 0; pred1: best gt1 @0.6 -> 1;
    # pred2: 0.35 between -> -2; pred3: 0.1 below -> -1.
    assert out.tolist() == [0, 1, M.BETWEEN_THRESHOLDS, M.BELOW_LOW_THRESHOLD]


def test_matcher_vs_numpy_random():
    rng = np.random.RandomState(0)
    for allow in (False, True):
        for _ in range(10):
            q = rng.rand(6, 40).astype(np.float32)
            ref = np_matcher(q, 0.7, 0.3, allow)
            got = np.asarray(
                M.match(jnp.asarray(q), jnp.ones(6, bool), 0.7, 0.3, allow)
            )
            np.testing.assert_array_equal(got, ref)


def test_matcher_low_quality_recovery():
    # GT1's best pred is only 0.2 (below low) — recovered when allowed.
    quality = jnp.array(
        [
            [0.9, 0.0, 0.0],
            [0.0, 0.2, 0.1],
        ]
    )
    valid = jnp.ones(2, bool)
    no_recover = np.asarray(M.match(quality, valid, 0.7, 0.3, False))
    assert no_recover.tolist() == [0, M.BELOW_LOW_THRESHOLD,
                                   M.BELOW_LOW_THRESHOLD]
    recover = np.asarray(M.match(quality, valid, 0.7, 0.3, True))
    assert recover.tolist() == [0, 1, M.BELOW_LOW_THRESHOLD]


def test_matcher_ignores_invalid_gt():
    quality = jnp.array(
        [
            [0.9, 0.9, 0.9],   # padding row — must never match
            [0.6, 0.0, 0.0],
        ]
    )
    valid = jnp.array([False, True])
    out = np.asarray(M.match(quality, valid, 0.5, 0.3, True))
    assert out[0] == 1
    assert out[1] in (M.BELOW_LOW_THRESHOLD,)
    # with recovery gt1's best (pred0) already matched; pred1/2 stay unmatched
    assert out[2] == M.BELOW_LOW_THRESHOLD


def test_ssd_matcher_forces_best_pred():
    # All qualities below threshold, but each GT still claims its argmax.
    quality = jnp.array(
        [
            [0.3, 0.1, 0.05],
            [0.1, 0.25, 0.2],
        ]
    )
    valid = jnp.ones(2, bool)
    out = np.asarray(M.ssd_match(quality, valid, threshold=0.5))
    assert out[0] == 0
    assert out[1] == 1
    assert out[2] == M.BELOW_LOW_THRESHOLD


def test_ssd_matcher_invalid_gt_does_not_claim():
    quality = jnp.array([[0.9, 0.8], [0.1, 0.2]])
    valid = jnp.array([False, True])
    out = np.asarray(M.ssd_match(quality, valid, threshold=0.5))
    assert out[1] == 1  # valid gt claims its best pred
    assert out[0] == M.BELOW_LOW_THRESHOLD  # padding gt never claims


def test_balanced_sampler_counts():
    labels = jnp.asarray(
        np.concatenate([np.ones(10), np.zeros(500), -np.ones(20)])
    )
    pos, neg = S.balanced_sample(labels, jax.random.key(0), 256, 0.25)
    pos, neg = np.asarray(pos), np.asarray(neg)
    assert pos.sum() == 10  # only 10 positives available (< 64 cap)
    assert neg.sum() == 246  # fill to 256
    lab = np.asarray(labels)
    assert (lab[pos] >= 1).all()
    assert (lab[neg] == 0).all()


def test_balanced_sampler_caps_positives():
    labels = jnp.asarray(np.concatenate([np.ones(300), np.zeros(300)]))
    pos, neg = S.balanced_sample(labels, jax.random.key(1), 256, 0.25)
    assert np.asarray(pos).sum() == 64   # 256 * 0.25
    assert np.asarray(neg).sum() == 192


def test_balanced_sampler_is_random_but_deterministic():
    labels = jnp.asarray(np.concatenate([np.ones(100), np.zeros(100)]))
    p1, _ = S.balanced_sample(labels, jax.random.key(2), 64, 0.5)
    p2, _ = S.balanced_sample(labels, jax.random.key(2), 64, 0.5)
    p3, _ = S.balanced_sample(labels, jax.random.key(3), 64, 0.5)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    assert not np.array_equal(np.asarray(p1), np.asarray(p3))


def test_yolo_best_prior_match():
    priors = jnp.array(
        [
            [0.25, 0.25, 0.1, 0.1],
            [0.75, 0.75, 0.2, 0.2],
            [0.5, 0.5, 0.5, 0.5],
        ]
    )
    gt = jnp.array([[0.74, 0.74, 0.22, 0.18], [0.5, 0.5, 0.45, 0.5]])
    out = np.asarray(M.yolo_best_prior_match(gt, priors))
    assert out.tolist() == [1, 2]
