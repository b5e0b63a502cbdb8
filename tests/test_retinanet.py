"""RetinaNet tests: anchor generation golden values, head shapes, loss
semantics (fg normalization, BETWEEN exclusion), static postprocess."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from object_detectors_tpu.models import anchors as A
from object_detectors_tpu.models import retinanet as R
from object_detectors_tpu.ops import boxes as box_ops


def test_cell_anchors_golden():
    # scale 128, ar 1.0 -> [-64,-64,64,64]
    base = A.cell_anchors([128], [1.0])
    np.testing.assert_array_equal(base, [[-64, -64, 64, 64]])
    # ar 2.0 (h/w=2): h=128*sqrt2, w=128/sqrt2 -> rounded halves
    base2 = A.cell_anchors([128], [2.0])
    w, h = 128 / np.sqrt(2), 128 * np.sqrt(2)
    np.testing.assert_array_equal(
        base2, [np.round([-w / 2, -h / 2, w / 2, h / 2])])


def test_grid_anchors_count_and_positions():
    sizes, ars = A.rpn_anchor_config()
    grids = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    anc = A.grid_anchors((64, 64), grids, sizes, ars)
    expected = sum(h * w * 3 for h, w in grids)
    assert anc.shape == (expected, 4)
    # first anchor: cell (0,0) of level 0, size 32 ar 0.5
    base = A.cell_anchors([32], [0.5, 1.0, 2.0])
    np.testing.assert_array_equal(anc[:3], base)
    # second cell shifted by stride 8 in x
    np.testing.assert_array_equal(anc[3], base[0] + [8, 0, 8, 0])


def test_retinanet_anchor_config_octaves():
    sizes, _ = A.retinanet_anchor_config()
    assert sizes[0] == (32, 40, 50)  # 32 * 2^(0,1/3,2/3) int-truncated
    assert len(sizes) == 5


def test_ssd_default_boxes_shape():
    boxes = A.ssd_default_boxes(
        (300, 300),
        [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)])
    expected = (38 * 38 * 4 + 19 * 19 * 6 + 10 * 10 * 6 + 5 * 5 * 6
                + 3 * 3 * 4 + 1 * 1 * 4)
    assert boxes.shape == (expected, 4)
    # centers of level 0 are at (0.5/37.5)*300 = 4 px steps of 8
    w = boxes[0, 2] - boxes[0, 0]
    assert 0 < w < 300


@pytest.fixture(scope="module")
def tiny_retinanet():
    model = R.RetinaNet(num_classes=5, resnet_layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    return model, variables


def test_retinanet_forward_shapes(tiny_retinanet):
    model, variables = tiny_retinanet
    x = jnp.zeros((2, 64, 64, 3))
    cls, reg, level_sizes = model.apply(variables, x, train=False)
    # levels: P3 (8x8), P4 (4x4), P5 (2x2), P6 (1x1), P7 (1x1), A=9
    assert level_sizes == (8 * 8 * 9, 4 * 4 * 9, 2 * 2 * 9, 9, 9)
    total = sum(level_sizes)
    assert cls.shape == (2, total, 5)
    assert reg.shape == (2, total, 4)


def test_retinanet_cls_bias_prior(tiny_retinanet):
    """Prior-prob init: sigmoid(bias) ~ 0.01 on fresh model."""
    model, variables = tiny_retinanet
    x = jnp.zeros((1, 64, 64, 3))
    cls, _, _ = model.apply(variables, x, train=False)
    probs = np.asarray(jax.nn.sigmoid(cls))
    assert probs.mean() == pytest.approx(0.01, rel=0.5)


def _loss_inputs(num_anchors=32, num_classes=5):
    rng = np.random.RandomState(0)
    anchors = np.zeros((num_anchors, 4), np.float32)
    xy = rng.rand(num_anchors, 2) * 50
    anchors[:, :2] = xy
    anchors[:, 2:] = xy + 10
    cls = jnp.asarray(rng.randn(2, num_anchors, num_classes) * 0.01)
    reg = jnp.asarray(rng.randn(2, num_anchors, 4) * 0.01)
    gt_boxes = jnp.asarray(np.array([
        [list(anchors[0]), list(anchors[5])],
        [list(anchors[3]), [0, 0, 0, 0]],
    ], np.float32))
    gt_labels = jnp.asarray([[1, 2], [3, 0]], dtype=jnp.int32)
    gt_valid = jnp.asarray([[True, True], [True, False]])
    return jnp.asarray(anchors), cls, reg, gt_boxes, gt_labels, gt_valid


def test_retinanet_loss_finite_and_positive():
    anchors, cls, reg, gb, gl, gv = _loss_inputs()
    cfg = R.RetinaNetConfig(num_classes=5)
    out = R.retinanet_loss(cls, reg, anchors, gb, gl, gv, cfg)
    assert np.isfinite(float(out["classification"]))
    assert np.isfinite(float(out["bbox_regression"]))
    assert float(out["classification"]) > 0


def test_retinanet_loss_perfect_regression_zero():
    """If predictions equal encoded targets on fg anchors, reg loss = 0."""
    anchors, cls, reg, gb, gl, gv = _loss_inputs()
    cfg = R.RetinaNetConfig(num_classes=5)
    # GT == anchors exactly -> encoded deltas are 0 -> zero pred = perfect
    out = R.retinanet_loss(cls, jnp.zeros_like(reg), anchors, gb, gl, gv, cfg)
    assert float(out["bbox_regression"]) == pytest.approx(0.0, abs=1e-6)


def test_retinanet_loss_padding_invariance():
    anchors, cls, reg, gb, gl, gv = _loss_inputs()
    cfg = R.RetinaNetConfig(num_classes=5)
    o1 = R.retinanet_loss(cls, reg, anchors, gb, gl, gv, cfg)
    pad_b = jnp.concatenate([gb, jnp.ones((2, 3, 4)) * 7.0], axis=1)
    pad_l = jnp.concatenate([gl, jnp.ones((2, 3), jnp.int32)], axis=1)
    pad_v = jnp.concatenate([gv, jnp.zeros((2, 3), bool)], axis=1)
    o2 = R.retinanet_loss(cls, reg, anchors, pad_b, pad_l, pad_v, cfg)
    np.testing.assert_allclose(float(o1["classification"]),
                               float(o2["classification"]), rtol=1e-5)
    np.testing.assert_allclose(float(o1["bbox_regression"]),
                               float(o2["bbox_regression"]), rtol=1e-5)


def test_retinanet_postprocess_finds_planted_box(tiny_retinanet):
    """Plant a confident logit at one anchor; postprocess must return it."""
    num_classes = 5
    cfg = R.RetinaNetConfig(num_classes=num_classes, score_thresh=0.05,
                            detections_per_img=10, topk_candidates=50)
    sizes, ars = A.retinanet_anchor_config()
    grids = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    anchors = jnp.asarray(A.grid_anchors((64, 64), grids, sizes, ars))
    level_sizes = tuple(h * w * 9 for h, w in grids)
    total = sum(level_sizes)

    cls = np.full((1, total, num_classes), -10.0, np.float32)
    cls[0, 100, 3] = 5.0  # one hot anchor, class 3
    reg = np.zeros((1, total, 4), np.float32)
    boxes, scores, labels, valid = R.retinanet_postprocess(
        jnp.asarray(cls), jnp.asarray(reg), anchors, level_sizes,
        (64, 64), cfg)
    v = np.asarray(valid[0])
    assert v.sum() == 1
    assert int(np.asarray(labels)[0, 0]) == 3
    assert float(np.asarray(scores)[0, 0]) == pytest.approx(
        1 / (1 + np.exp(-5.0)), rel=1e-4)
    expected_box = box_ops.clip_boxes_to_image(anchors[100], (64, 64))
    np.testing.assert_allclose(np.asarray(boxes)[0, 0],
                               np.asarray(expected_box), atol=1e-3)


def test_packed_head_matches_per_level_head():
    """The packed-canvas head (one conv over gap-separated levels) must
    be numerically identical to the per-level tower application."""
    import jax

    feats = [jnp.asarray(np.random.RandomState(i).randn(
        2, s, s, 16).astype(np.float32)) for i, s in
        enumerate((16, 8, 4, 2, 1))]
    head_p = R.RetinaNetHead(num_classes=7, num_anchors=3,
                              in_channels=16, packed=True)
    head_u = R.RetinaNetHead(num_classes=7, num_anchors=3,
                              in_channels=16, packed=False)
    v = head_u.init(jax.random.key(0), feats)
    cls_u, reg_u, ls_u = head_u.apply(v, feats)
    cls_p, reg_p, ls_p = head_p.apply(v, feats)
    assert ls_u == ls_p
    np.testing.assert_allclose(np.asarray(cls_p), np.asarray(cls_u),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(reg_p), np.asarray(reg_u),
                               rtol=1e-5, atol=1e-5)


def test_arith_anchor_decode_bitwise_equal():
    """grids= arithmetic anchor reconstruction produces BITWISE the
    same detections as the gather decode: grid_anchors rows are
    col*stride + rounded base (anchors.py:50-60); integer products
    < 2^24 are exact in f32 and the base rows equal the first cell's
    anchor rows, so _anchors_from_index rebuilds table rows exactly.
    Uses a non-divisible size (72) so stride = size // grid exercises
    the floor-stride rule."""
    size = 72
    grids = tuple((max(size // s, 1),) * 2 for s in (8, 16, 32, 64, 128))
    sizes, ars = A.retinanet_anchor_config()
    anchors = jnp.asarray(A.grid_anchors((size, size), grids, sizes, ars))
    a_per = 9
    level_sizes = tuple(gh * gw * a_per for gh, gw in grids)
    total = sum(level_sizes)
    cfg = R.RetinaNetConfig(num_classes=7)
    rng = np.random.RandomState(3)
    cls = jnp.asarray(rng.randn(2, total, 7).astype(np.float32) * 2,
                      jnp.bfloat16)
    reg = jnp.asarray(rng.randn(2, total, 4).astype(np.float32) * 0.3,
                      jnp.bfloat16)
    ref = R.retinanet_postprocess(cls, reg, anchors, level_sizes,
                                  (size, size), cfg)
    got = R.retinanet_postprocess(cls, reg, anchors, level_sizes,
                                  (size, size), cfg, grids=grids)
    for name, (a, b) in zip(("boxes", "scores", "labels", "valid"),
                            zip(ref, got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_fpn_grid_sizes_match_model_features_at_160():
    """fpn_grid_sizes reproduces the conv chain's ceil-halving feature
    dims. At 160 the P7 map is 2x2 (ceil chain 20->10->5->3->2) while
    160 // 128 = 1 — a floor-grid anchor table would be short and the
    parity harness crashed exactly this way at 320 (r4). Both decode
    paths (gather and grids= arithmetic) must agree on these grids."""
    size = 160
    grids = A.fpn_grid_sizes((size, size))
    assert grids == [(20, 20), (10, 10), (5, 5), (3, 3), (2, 2)]

    model = R.RetinaNet(num_classes=5, resnet_layers=(1, 1, 1, 1))
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    v = model.init(jax.random.key(0), x, train=False)
    rng = np.random.RandomState(2)
    xr = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
    cls, reg, level_sizes = model.apply(v, xr, train=False)
    assert tuple(level_sizes) == tuple(gh * gw * 9 for gh, gw in grids)

    sizes, ars = A.retinanet_anchor_config()
    anchors = jnp.asarray(A.grid_anchors((size, size), grids, sizes,
                                         ars))
    assert anchors.shape[0] == sum(level_sizes)
    cfg = R.RetinaNetConfig(num_classes=5)
    ref = R.retinanet_postprocess(
        cls.astype(jnp.float32), reg.astype(jnp.float32), anchors,
        tuple(level_sizes), (size, size), cfg)
    got = R.retinanet_postprocess(
        cls.astype(jnp.float32), reg.astype(jnp.float32), anchors,
        tuple(level_sizes), (size, size), cfg, grids=tuple(grids))
    for name, (a, b) in zip(("boxes", "scores", "labels", "valid"),
                            zip(ref, got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_fused_towers_match_unfused():
    """fused_towers=True (joint cls+reg towers: dense layer-1 +
    grouped block-diagonal layers 2-4) computes the same function as
    the per-tower packed head, with an identical param tree."""
    size = 64
    model_a = R.RetinaNet(num_classes=5, resnet_layers=(1, 1, 1, 1))
    model_b = R.RetinaNet(num_classes=5, resnet_layers=(1, 1, 1, 1),
                          fused_towers=True)
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    v = model_a.init(jax.random.key(0), x, train=False)
    vb = model_b.init(jax.random.key(0), x, train=False)
    # identical param trees (checkpoint compatibility both ways)
    ta = jax.tree.structure(v)
    tb = jax.tree.structure(vb)
    assert ta == tb
    rng = np.random.RandomState(5)
    xr = jnp.asarray(rng.rand(2, size, size, 3).astype(np.float32))
    cls_a, reg_a, ls_a = model_a.apply(v, xr, train=False)
    cls_b, reg_b, ls_b = model_b.apply(v, xr, train=False)
    assert ls_a == ls_b
    np.testing.assert_allclose(np.asarray(cls_a), np.asarray(cls_b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(reg_a), np.asarray(reg_b),
                               rtol=1e-5, atol=1e-5)


def test_batched_select_matches_perlevel():
    """select_mode="batched" (the r5 A/B knob, measured loser on the
    serve pipeline but kept for the record) must stay numerically
    identical to the production per-level select on dense random
    logits with ties and sub-threshold rows."""
    num_classes = 6
    cfg = R.RetinaNetConfig(num_classes=num_classes, score_thresh=0.3,
                            detections_per_img=12, topk_candidates=40)
    sizes, ars = A.retinanet_anchor_config()
    grids = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    anchors = jnp.asarray(A.grid_anchors((64, 64), grids, sizes, ars))
    level_sizes = tuple(h * w * 9 for h, w in grids)
    total = sum(level_sizes)
    rng = np.random.RandomState(11)
    cls = rng.randn(2, total, num_classes).astype(np.float32) * 2.0
    cls[1, : level_sizes[0]] = -9.0  # whole level below threshold
    reg = (rng.randn(2, total, 4) * 0.1).astype(np.float32)
    outs = {}
    for mode in ("perlevel", "batched", "fused"):
        outs[mode] = R.retinanet_postprocess(
            jnp.asarray(cls), jnp.asarray(reg), anchors, level_sizes,
            (64, 64), cfg, select_mode=mode)
    for other in ("batched", "fused"):
        for a, b, name in zip(outs["perlevel"], outs[other],
                              ("boxes", "scores", "labels", "valid")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=f"{other}:{name}")
