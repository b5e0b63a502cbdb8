"""Golden-value tests for box geometry ops vs hand-computed references."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from object_detectors_tpu.ops import boxes as B


def test_format_roundtrip():
    rng = np.random.RandomState(0)
    cxcywh = np.abs(rng.randn(32, 4)).astype(np.float32) + 0.1
    xyxy = B.cxcywh_to_xyxy(jnp.asarray(cxcywh))
    back = B.xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), cxcywh, rtol=1e-5, atol=1e-6)


def test_xywh_roundtrip():
    rng = np.random.RandomState(1)
    xywh = np.abs(rng.randn(8, 4)).astype(np.float32)
    out = B.xyxy_to_xywh(B.xywh_to_xyxy(jnp.asarray(xywh)))
    np.testing.assert_allclose(np.asarray(out), xywh, rtol=1e-5, atol=1e-6)


def test_plain_iou_golden():
    # Unit squares overlapping by half: inter=0.5, union=1.5 -> IoU=1/3.
    b1 = jnp.array([[0.5, 0.5, 1.0, 1.0]])  # cxcywh
    b2 = jnp.array([[1.0, 0.5, 1.0, 1.0]])
    iou = B.box_iou(b1, b2, iou_type=B.IOU)
    np.testing.assert_allclose(float(iou[0]), 1.0 / 3.0, rtol=1e-5)


def test_identical_boxes_iou_one():
    b = jnp.array([[2.0, 3.0, 4.0, 2.0]])
    for t in (B.IOU, B.GIOU, B.DIOU, B.CIOU):
        v = float(B.box_iou(b, b, iou_type=t)[0])
        assert abs(v - 1.0) < 1e-5, (t, v)


def test_giou_disjoint_golden():
    # Two unit squares side by side with a 1-unit gap.
    # xyxy: [0,0,1,1] and [2,0,3,1]. inter=0, union=2, IoU=0.
    # enclosing box = [0,0,3,1], area 3 -> GIoU = 0 - (3-2)/3 = -1/3.
    b1 = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b2 = jnp.array([[2.0, 0.0, 3.0, 1.0]])
    giou = B.box_iou(b1, b2, iou_type=B.GIOU, fmt="xyxy")
    np.testing.assert_allclose(float(giou[0]), -1.0 / 3.0, rtol=1e-4)


def test_diou_golden():
    # Same disjoint squares. centers (0.5,0.5) and (2.5,0.5): rho2 = 4.
    # enclosing box diag^2 = 3^2 + 1^2 = 10 -> DIoU = 0 - 4/10 = -0.4.
    b1 = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b2 = jnp.array([[2.0, 0.0, 3.0, 1.0]])
    diou = B.box_iou(b1, b2, iou_type=B.DIOU, fmt="xyxy")
    np.testing.assert_allclose(float(diou[0]), -0.4, rtol=1e-4)


def test_ciou_equals_diou_for_same_aspect():
    # Same aspect ratio -> v = 0 -> CIoU == DIoU.
    b1 = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b2 = jnp.array([[1.0, 1.0, 3.0, 3.0]])
    d = float(B.box_iou(b1, b2, iou_type=B.DIOU, fmt="xyxy")[0])
    c = float(B.box_iou(b1, b2, iou_type=B.CIOU, fmt="xyxy")[0])
    np.testing.assert_allclose(c, d, atol=1e-5)


def test_ciou_penalizes_aspect_mismatch():
    b1 = jnp.array([[0.0, 0.0, 2.0, 2.0]])   # square
    b2 = jnp.array([[0.0, 0.0, 4.0, 1.0]])   # wide
    d = float(B.box_iou(b1, b2, iou_type=B.DIOU, fmt="xyxy")[0])
    c = float(B.box_iou(b1, b2, iou_type=B.CIOU, fmt="xyxy")[0])
    assert c < d


def test_broadcasting_matches_pairwise():
    rng = np.random.RandomState(2)
    m = np.abs(rng.randn(5, 4)).astype(np.float32) + 0.5
    n = np.abs(rng.randn(7, 4)).astype(np.float32) + 0.5
    m_xyxy = np.asarray(B.cxcywh_to_xyxy(jnp.asarray(m)))
    n_xyxy = np.asarray(B.cxcywh_to_xyxy(jnp.asarray(n)))
    broadcast = B.box_iou(
        jnp.asarray(m)[:, None, :], jnp.asarray(n)[None, :, :], iou_type=B.IOU
    )
    pairwise = B.pairwise_iou(jnp.asarray(m_xyxy), jnp.asarray(n_xyxy))
    np.testing.assert_allclose(
        np.asarray(broadcast), np.asarray(pairwise), rtol=1e-4, atol=1e-5
    )


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(3)
    anchors = np.abs(rng.rand(16, 4).astype(np.float32)) * 50
    anchors[:, 2:] += anchors[:, :2] + 5.0  # ensure x2>x1, y2>y1
    gt = np.abs(rng.rand(16, 4).astype(np.float32)) * 50
    gt[:, 2:] += gt[:, :2] + 5.0
    weights = (10.0, 10.0, 5.0, 5.0)
    codes = B.encode_boxes(jnp.asarray(gt), jnp.asarray(anchors), weights)
    decoded = B.decode_boxes(codes, jnp.asarray(anchors), weights)
    np.testing.assert_allclose(np.asarray(decoded), gt, rtol=1e-3, atol=1e-3)


def test_decode_exp_clip():
    # dw larger than log(1000/16) must be clipped, not overflow.
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    codes = jnp.array([[0.0, 0.0, 100.0, 100.0]])
    out = np.asarray(B.decode_boxes(codes, anchors))
    max_side = 10.0 * math.exp(B.BBOX_XFORM_CLIP)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0, 2] - out[0, 0], max_side, rtol=1e-4)


def test_clip_boxes():
    b = jnp.array([[-5.0, -5.0, 50.0, 120.0], [10.0, 20.0, 30.0, 40.0]])
    out = np.asarray(B.clip_boxes_to_image(b, (100, 40)))
    np.testing.assert_allclose(out[0], [0.0, 0.0, 40.0, 100.0])
    np.testing.assert_allclose(out[1], [10.0, 20.0, 30.0, 40.0])


def test_small_box_mask():
    b = jnp.array([[0, 0, 1, 1], [0, 0, 5, 5], [0, 0, 5, 1]], jnp.float32)
    mask = np.asarray(B.small_box_mask(b, 2.0))
    assert mask.tolist() == [False, True, False]


def test_bbox_xform_clip_value():
    assert abs(B.BBOX_XFORM_CLIP - math.log(1000.0 / 16)) < 1e-9
