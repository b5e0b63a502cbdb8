"""YOLO model + criterion tests: output shapes, prior layout, decode math,
loss behavior on padded GT."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from object_detectors_tpu.models.yolo import YoloHead
from object_detectors_tpu.models import yolo_criterion as YC


SMALL_CFG = YC.YoloLossConfig(num_classes=4, img_size=64)


@pytest.fixture(scope="module")
def tiny_head():
    model = YoloHead(num_classes=4, backbone_layers=(1, 1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    return model, variables


def test_yolo_head_output_shapes(tiny_head):
    model, variables = tiny_head
    x = jnp.zeros((2, 64, 64, 3))
    out0, out1, out2 = model.apply(variables, x, train=False)
    # strides 32, 16, 8; channels A*(5+C) = 3*9 = 27
    assert out0.shape == (2, 2, 2, 27)
    assert out1.shape == (2, 4, 4, 27)
    assert out2.shape == (2, 8, 8, 27)


def test_make_priors_layout():
    cfg = YC.YoloLossConfig(num_classes=4, img_size=416)
    priors, gw = YC.make_priors(cfg, (13, 26, 52))
    p_total = (13 * 13 + 26 * 26 + 52 * 52) * 3
    assert priors.shape == (p_total, 4)
    assert gw.shape == (p_total,)
    pn = np.asarray(priors)
    # First scale: grid 13, anchors (116,90): first prior at cell (0,0),
    # anchor 0 -> cx=cy=0.5/13, pw=116/416.
    np.testing.assert_allclose(pn[0], [0.5 / 13, 0.5 / 13, 116 / 416,
                                       90 / 416], rtol=1e-5)
    # Prior order is (h, w, a): index 1 is anchor 1, same cell.
    np.testing.assert_allclose(pn[1, 2], 156 / 416, rtol=1e-5)
    # index 3*1 = 3 -> cell (h=0, w=1)
    np.testing.assert_allclose(pn[3, 0], 1.5 / 13, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw)[:13 * 13 * 3], 13.0)


def test_flatten_matches_reference_order():
    # NHWC [B,H,W,A*(5+C)] reshape -> [B, H*W*A, 5+C]: entry (h,w,a) at
    # flat index (h*W + w)*A + a, channel a*(5+C)+attr.
    b, h, w, a, c = 1, 2, 2, 3, 4
    attrs = 5 + c
    raw = np.arange(b * h * w * a * attrs, dtype=np.float32).reshape(
        b, h, w, a * attrs)
    flat = np.asarray(YC.flatten_raw_outputs([jnp.asarray(raw)], c, a))
    for hh in range(h):
        for ww in range(w):
            for aa in range(a):
                np.testing.assert_array_equal(
                    flat[0, (hh * w + ww) * a + aa],
                    raw[0, hh, ww, aa * attrs:(aa + 1) * attrs],
                )


def test_decode_centers_boxes_in_cells():
    cfg = SMALL_CFG
    priors, gw = YC.make_priors(cfg, (2,))
    # raw zeros: sigmoid(0)=0.5 -> xy = (0.5 + gx+0.5 - 0.5)*stride = center
    raw = jnp.zeros((1, priors.shape[0], 5 + cfg.num_classes))
    out = np.asarray(YC.yolo_decode(raw, priors, gw, cfg))
    stride = cfg.img_size / 2
    # first prior: cell (0,0) -> cx = (0.5 + 0.5 - 0.5) * 32 = 16
    np.testing.assert_allclose(out[0, 0, 0], 16.0, rtol=1e-5)
    np.testing.assert_allclose(out[0, 0, 1], 16.0, rtol=1e-5)
    # wh = exp(0) * anchor_rel * gridw * stride = anchor pixels scaled
    np.testing.assert_allclose(
        out[0, 0, 2], (cfg.anchors[0][0][0] / cfg.img_size) * 2 * stride,
        rtol=1e-5)
    # conf = sigmoid(0) = 0.5; cls softmax uniform = 1/C
    np.testing.assert_allclose(out[0, 0, 4], 0.5, rtol=1e-5)
    np.testing.assert_allclose(out[0, 0, 5], 0.25, rtol=1e-5)


def _toy_loss_inputs(cfg, num_priors, m=3):
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randn(2, num_priors, 5 + cfg.num_classes)
                      .astype(np.float32) * 0.1)
    gt_boxes = jnp.asarray(
        np.array([
            [[0.3, 0.3, 0.2, 0.25], [0.7, 0.6, 0.1, 0.1], [0, 0, 0, 0]],
            [[0.5, 0.5, 0.4, 0.4], [0, 0, 0, 0], [0, 0, 0, 0]],
        ], np.float32))
    gt_labels = jnp.asarray(np.array([[1, 2, 0], [3, 0, 0]], np.int32))
    gt_valid = jnp.asarray(np.array([[1, 1, 0], [1, 0, 0]], bool))
    return raw, gt_boxes, gt_labels, gt_valid


def test_yolo_loss_runs_and_is_finite():
    cfg = SMALL_CFG
    priors, gw = YC.make_priors(cfg, (2, 4, 8))
    raw, gt_boxes, gt_labels, gt_valid = _toy_loss_inputs(cfg, priors.shape[0])
    loss, sub, stats = YC.yolo_loss(
        raw, priors, gw, gt_boxes, gt_labels, gt_valid, cfg)
    assert np.isfinite(float(loss))
    assert sub.shape == (6,) and stats.shape == (5,)
    assert np.isfinite(np.asarray(sub)).all()
    assert np.isfinite(np.asarray(stats)).all()
    # sum-reduced and normalized by #gt -> each sub-loss already divided by 3
    assert float(loss) == pytest.approx(float(np.asarray(sub).sum()), rel=1e-5)


def test_yolo_loss_padding_invariance():
    """Extra padded GT slots must not change the loss."""
    cfg = SMALL_CFG
    priors, gw = YC.make_priors(cfg, (2, 4, 8))
    raw, gt_boxes, gt_labels, gt_valid = _toy_loss_inputs(cfg, priors.shape[0])
    loss1, sub1, _ = YC.yolo_loss(
        raw, priors, gw, gt_boxes, gt_labels, gt_valid, cfg)
    # pad with 5 more junk slots
    pad_boxes = jnp.concatenate(
        [gt_boxes, jnp.ones((2, 5, 4)) * 0.123], axis=1)
    pad_labels = jnp.concatenate(
        [gt_labels, jnp.ones((2, 5), jnp.int32)], axis=1)
    pad_valid = jnp.concatenate([gt_valid, jnp.zeros((2, 5), bool)], axis=1)
    loss2, sub2, _ = YC.yolo_loss(
        raw, priors, gw, pad_boxes, pad_labels, pad_valid, cfg)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sub1), np.asarray(sub2), rtol=1e-5)


def test_yolo_loss_grad_flows():
    cfg = SMALL_CFG
    priors, gw = YC.make_priors(cfg, (2, 4, 8))
    raw, gt_boxes, gt_labels, gt_valid = _toy_loss_inputs(cfg, priors.shape[0])

    def f(r):
        return YC.yolo_loss(r, priors, gw, gt_boxes, gt_labels, gt_valid,
                            cfg)[0]

    g = jax.grad(f)(raw)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_yolo_loss_perfect_prediction_small():
    """Construct raw preds that decode exactly onto one GT; iou loss ~ 0."""
    cfg = YC.YoloLossConfig(num_classes=4, img_size=64, iou_type=0,
                            ignore_threshold=0.99)
    priors, gw = YC.make_priors(cfg, (2,))
    pn = np.asarray(priors)
    # GT = prior 0's anchor box centered in its cell.
    gt = np.array([[[pn[0, 0], pn[0, 1], pn[0, 2], pn[0, 3]]]], np.float32)
    raw = np.zeros((1, priors.shape[0], 9), np.float32)
    raw[:, :, 4] = -10.0  # low conf everywhere
    raw[0, 0, 4] = 10.0
    # sigmoid(x)=0.5 target offset: cell center matches gx=0.5 clamp ok
    loss, sub, stats = YC.yolo_loss(
        jnp.asarray(raw), priors, gw, jnp.asarray(gt),
        jnp.zeros((1, 1), jnp.int32), jnp.ones((1, 1), bool), cfg)
    sub = np.asarray(sub)
    assert sub[2] < 1e-3  # iou loss ~ 0 (perfect box)
    assert np.asarray(stats)[0] > 0.99  # avg_iou ~ 1


def test_bf16_forward(tiny_head):
    model = YoloHead(num_classes=4, backbone_layers=(1, 1, 1, 1, 1),
                     dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out[0].dtype == jnp.bfloat16
    # params stay f32
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32


def test_yolo_neck_spp_fpn_variants():
    """SPP and FPN necks preserve the head's channel plan and shapes."""
    for use_spp, use_fpn in [(True, False), (False, True), (True, True)]:
        model = YoloHead(num_classes=4, backbone_layers=(1, 1, 1, 1, 1),
                         use_spp=use_spp, use_fpn=use_fpn,
                         pyramids=((5, 9, 13),) * 3)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.key(0), x, train=False)
        out0, out1, out2 = model.apply(variables, x, train=False)
        assert out0.shape == (1, 2, 2, 27), (use_spp, use_fpn)
        assert out1.shape == (1, 4, 4, 27)
        assert out2.shape == (1, 8, 8, 27)
