"""Loss golden-value tests vs independent numpy formulas (semantics of
yolo/utilities/custom.py and torchvision sigmoid_focal_loss)."""

import numpy as np
import jax.numpy as jnp

from object_detectors_tpu.ops import losses as L


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_bce_logits(x, y, pos_weight=None):
    # stable formulation
    max_val = np.clip(-x, 0, None)
    loss = (1 - y) * x + max_val + np.log(
        np.exp(-max_val) + np.exp(-x - max_val)
    )
    if pos_weight is not None:
        # recompute with pos_weight on positive term
        log_p = -np.log1p(np.exp(-x))
        log_np = -x - np.log1p(np.exp(-x))
        return -(pos_weight * y * log_p + (1 - y) * log_np)
    return loss


def test_bce_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(64).astype(np.float32) * 3
    y = (rng.rand(64) > 0.5).astype(np.float32)
    got = np.asarray(L.sigmoid_binary_cross_entropy(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, np_bce_logits(x, y), rtol=3e-3, atol=1e-5)


def test_bce_pos_weight():
    x = np.array([0.5, -1.0], np.float32)
    y = np.array([1.0, 0.0], np.float32)
    w = np.array([3.0, 3.0], np.float32)
    got = np.asarray(
        L.sigmoid_binary_cross_entropy(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w))
    )
    ref = np_bce_logits(x, y, pos_weight=w)
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_focal_loss_reference_formula():
    """FocalLoss wrapper (custom.py:40-67): bce * alpha_f * (1-p_t)^gamma."""
    rng = np.random.RandomState(1)
    x = rng.randn(32).astype(np.float32)
    y = (rng.rand(32) > 0.5).astype(np.float32)
    gamma, alpha = 1.835, 0.353  # the tuned values from batch_files/sample.txt
    p = np_sigmoid(x)
    p_t = y * p + (1 - y) * (1 - p)
    alpha_f = y * alpha + (1 - y) * (1 - alpha)
    ref = np_bce_logits(x, y) * alpha_f * (1 - p_t) ** gamma
    got = np.asarray(L.focal_loss(jnp.asarray(x), jnp.asarray(y), gamma, alpha))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_sigmoid_focal_loss_torchvision_semantics():
    rng = np.random.RandomState(2)
    x = rng.randn(16).astype(np.float32)
    y = (rng.rand(16) > 0.5).astype(np.float32)
    p = np_sigmoid(x)
    ce = np_bce_logits(x, y)
    p_t = p * y + (1 - p) * (1 - y)
    ref = 0.25 * y * ce * (1 - p_t) ** 2 + (1 - 0.25) * (1 - y) * ce * (1 - p_t) ** 2
    got = np.asarray(L.sigmoid_focal_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-5)
    # alpha < 0 disables alpha weighting
    got_na = np.asarray(L.sigmoid_focal_loss(jnp.asarray(x), jnp.asarray(y), alpha=-1))
    np.testing.assert_allclose(got_na, ce * (1 - p_t) ** 2, rtol=1e-3, atol=1e-5)


def test_quality_focal():
    x = np.array([1.0, -2.0], np.float32)
    y = np.array([1.0, 0.0], np.float32)
    p = np_sigmoid(x)
    alpha_f = y * 0.25 + (1 - y) * 0.75
    ref = np_bce_logits(x, y) * alpha_f * np.abs(y - p) ** 1.5
    got = np.asarray(L.quality_focal_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_eq_loss_masks_common_class_negatives_only():
    """EQ loss weight = clip(rare_mask + y, 0, 1): positives always counted;
    negatives only counted where rare_mask==1 (custom.py:85-90)."""
    logits = jnp.zeros((2, 3))
    labels = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    rare = jnp.array([0.0, 1.0, 0.0])
    out = np.asarray(L.eq_loss(logits, labels, rare, gamma=0.0, alpha=0.5))
    base = 0.5 * np.log(2.0) * 2  # bce(0,y)*alpha_factor: ln2 * 0.5
    # weight matrix: [[1,1,0],[0,1,0]]
    expected_nonzero = np.array([[1, 1, 0], [0, 1, 0]], bool)
    assert ((out > 1e-8) == expected_nonzero).all()


def test_smooth_l1_beta():
    pred = jnp.array([0.0, 0.0, 0.0])
    tgt = jnp.array([0.05, 0.2, 2.0])
    beta = 1.0 / 9.0
    out = np.asarray(L.smooth_l1_loss(pred, tgt, beta))
    ref = np.array(
        [0.5 * 0.05**2 / beta, 0.2 - 0.5 * beta, 2.0 - 0.5 * beta]
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_weighted_ce_mean_matches_torch_semantics():
    # torch CE(weight=w, reduction='mean') = sum(w[y]*nll)/sum(w[y])
    logits = np.array([[2.0, 1.0, 0.0], [0.0, 2.0, 1.0]], np.float32)
    labels = np.array([0, 2], np.int64)
    w = np.array([1.0, 1.0, 3.0], np.float32)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    nll = -logp[np.arange(2), labels]
    ref = (w[labels] * nll).sum() / w[labels].sum()
    got = float(
        L.weighted_ce_mean(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_smooth_bce_targets():
    pos, neg = L.smooth_bce_targets(0.1)
    assert abs(pos - 0.95) < 1e-9 and abs(neg - 0.05) < 1e-9


def test_effective_number_weights():
    w = np.asarray(L.effective_number_weights(jnp.array([10.0, 1000.0])))
    assert w[0] > w[1]  # rare class upweighted
    np.testing.assert_allclose(w.sum(), 2.0, rtol=1e-5)  # normalized to C
