"""Legacy per-scale YOLOLoss/decoder tests (yolo/nets/yolo_loss.py
semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from object_detectors_tpu.models import yolo_legacy as YL


CFG = YL.YoloLegacyConfig(num_classes=4, img_size=64,
                          anchors=((16, 16), (32, 24), (48, 48)))


def test_targets_scatter_into_correct_cell():
    # one GT centered at (0.3, 0.6) on a 4x4 grid -> cell (gi=1, gj=2)
    gt = jnp.asarray([[[0.3, 0.6, 0.25, 0.25]]])
    gv = jnp.ones((1, 1), bool)
    gl = jnp.asarray([[2]], jnp.int32)
    raw = jnp.zeros((1, 4, 4, 3 * 9))
    loss, parts = YL.yolo_legacy_loss(raw, gt, gl, gv, CFG)
    assert np.isfinite(float(loss))
    # rebuild targets directly for introspection
    scaled = jnp.asarray(CFG.anchors, jnp.float32) / (64 / 4)
    mask, noobj, tx, ty, tw, th, tcls = YL._targets_one(
        gt[0], gv[0], gl[0], (4, 4), scaled, 4, 0.5)
    m = np.asarray(mask)
    assert m.sum() == 1
    j, i, a = np.argwhere(m)[0]
    assert (j, i) == (2, 1)
    # best anchor claims its cell and leaves noobj
    assert not np.asarray(noobj)[j, i, a]
    # tx = gx - gi = 0.3*4 - 1 = 0.2
    assert np.asarray(tx)[j, i, a] == pytest.approx(0.2, abs=1e-5)
    assert np.asarray(tcls)[j, i, a, 2] == 1.0


def test_padding_invariance():
    gt = jnp.asarray([[[0.3, 0.6, 0.25, 0.25], [0.5, 0.5, 0.2, 0.2]]])
    gv = jnp.asarray([[True, False]])
    gl = jnp.asarray([[2, 1]], jnp.int32)
    raw = jnp.asarray(
        np.random.RandomState(0).randn(1, 4, 4, 27).astype(np.float32))
    l1, _ = YL.yolo_legacy_loss(raw, gt, gl, gv, CFG)
    l2, _ = YL.yolo_legacy_loss(raw, gt[:, :1], gl[:, :1], gv[:, :1], CFG)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_legacy_decode_golden():
    raw = np.zeros((1, 4, 4, 27), np.float32)
    out = np.asarray(YL.yolo_legacy_decode(jnp.asarray(raw), CFG))
    assert out.shape == (1, 3 * 16, 9)
    # first entry: anchor 0, cell (0,0): x = (sig(0)+0)*16 = 8
    np.testing.assert_allclose(out[0, 0, 0], 8.0, rtol=1e-5)
    # w = exp(0) * (16/16) * 16 = 16
    np.testing.assert_allclose(out[0, 0, 2], 16.0, rtol=1e-5)
    np.testing.assert_allclose(out[0, 0, 4], 0.5, rtol=1e-5)
    # (a, h, w) ordering: entry 16 is anchor 1, cell (0, 0)
    np.testing.assert_allclose(out[0, 16, 2], 32.0, rtol=1e-5)


def test_loss_drops_with_correct_predictions():
    rng = np.random.RandomState(0)
    gt = jnp.asarray([[[0.3, 0.6, 0.25, 0.25]]])
    gv = jnp.ones((1, 1), bool)
    gl = jnp.asarray([[2]], jnp.int32)
    bad = jnp.asarray(rng.randn(1, 4, 4, 27).astype(np.float32))
    # construct a "good" prediction: strong negative conf everywhere,
    # positive at the target cell
    good = np.full((1, 4, 4, 27), 0.0, np.float32)
    good[..., 4::9] = -8.0
    scaled = np.asarray(CFG.anchors) / 16.0
    good[0, 2, 1, 4] = 8.0  # anchor slot 0 conf (cell j=2, i=1)
    l_bad, _ = YL.yolo_legacy_loss(bad, gt, gl, gv, CFG)
    l_good, _ = YL.yolo_legacy_loss(jnp.asarray(good), gt, gl, gv, CFG)
    # conf part should be drastically lower for 'good'
    assert float(l_good) < float(l_bad)
