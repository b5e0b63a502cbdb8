"""Keypoint R-CNN branch tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from object_detectors_tpu.models import keypoint_rcnn as KP


def test_keypoints_to_heatmap_mapping():
    boxes = jnp.array([[0.0, 0.0, 56.0, 56.0]])
    kps = jnp.array([[[0.5, 0.5, 2.0],      # top-left cell
                      [55.9, 55.9, 1.0],    # bottom-right cell
                      [28.0, 28.0, 0.0],    # invisible
                      [100.0, 28.0, 1.0]]])  # outside box
    cell, valid = KP.keypoints_to_heatmap(kps, boxes, 56)
    c = np.asarray(cell)[0]
    v = np.asarray(valid)[0]
    assert c[0] == 0
    assert c[1] == 55 * 56 + 55
    assert v.tolist() == [True, True, False, False]


def test_keypoint_loss_perfect_prediction():
    s, hm, k = 2, 8, 3
    boxes = jnp.tile(jnp.array([[0.0, 0.0, 8.0, 8.0]]), (s, 1))[None]
    # keypoint at cell (1, 2) for every kp
    kps = jnp.tile(jnp.array([[[2.5, 1.5, 1.0]] * k]), (1, 1, 1))
    gt_kps = jnp.tile(kps, (s, 1, 1))[None]
    logits = np.full((1, s, hm, hm, k), -10.0, np.float32)
    logits[:, :, 1, 2, :] = 10.0  # mass at the target cell
    matched = jnp.zeros((1, s), jnp.int32)
    pos = jnp.ones((1, s), bool)
    loss = KP.keypointrcnn_loss(
        jnp.asarray(logits), boxes, gt_kps, matched, pos)
    assert float(loss) < 1e-3
    loss_bad = KP.keypointrcnn_loss(
        -jnp.asarray(logits), boxes, gt_kps, matched, pos)
    assert float(loss_bad) > 5.0


def test_keypoint_loss_no_valid_keypoints():
    logits = jnp.zeros((1, 2, 8, 8, 3))
    boxes = jnp.tile(jnp.array([[0.0, 0.0, 8.0, 8.0]]), (2, 1))[None]
    kps = jnp.zeros((1, 1, 3, 3))  # vis = 0 everywhere
    loss = KP.keypointrcnn_loss(
        logits, boxes, kps, jnp.zeros((1, 2), jnp.int32),
        jnp.ones((1, 2), bool))
    assert float(loss) == 0.0


def test_heatmaps_to_keypoints_argmax():
    b, d, hm, k = 1, 1, 8, 2
    logits = np.full((b, d, hm, hm, k), -5.0, np.float32)
    logits[0, 0, 3, 5, 0] = 5.0   # kp0 at cell y=3, x=5
    logits[0, 0, 7, 0, 1] = 5.0   # kp1 at y=7, x=0
    boxes = jnp.array([[[10.0, 20.0, 26.0, 36.0]]])  # 16x16 box
    kps, scores = KP.heatmaps_to_keypoints(jnp.asarray(logits), boxes)
    kk = np.asarray(kps)[0, 0]
    np.testing.assert_allclose(kk[0, 0], 10 + (5 + 0.5) / 8 * 16,
                               rtol=1e-5)
    np.testing.assert_allclose(kk[0, 1], 20 + (3 + 0.5) / 8 * 16,
                               rtol=1e-5)
    assert np.asarray(scores)[0, 0, 0] > 0.9


def test_keypoint_head_shapes():
    head = KP.KeypointRCNNHeads(layers=2, features=32)
    pred = KP.KeypointRCNNPredictor(num_keypoints=17)
    x = jnp.zeros((4, 14, 14, 8))
    vh = head.init(jax.random.key(0), x)
    h = head.apply(vh, x)
    assert h.shape == (4, 14, 14, 32)
    vp = pred.init(jax.random.key(1), h)
    out = pred.apply(vp, h)
    assert out.shape == (4, 56, 56, 17)
