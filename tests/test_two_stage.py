"""RPN + RoIHeads + Faster R-CNN tests (tiny backbone, hermetic)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from object_detectors_tpu.models import anchors as A
from object_detectors_tpu.models import faster_rcnn as F
from object_detectors_tpu.models import roi_heads as RH
from object_detectors_tpu.models import rpn as RPN
from object_detectors_tpu.ops import boxes as box_ops


TINY_RPN = RPN.RPNConfig(
    pre_nms_top_n_train=64, pre_nms_top_n_test=64,
    post_nms_top_n_train=32, post_nms_top_n_test=16,
    batch_size_per_image=32)
TINY_ROI = RH.RoIHeadsConfig(
    num_classes=5, batch_size_per_image=16, detections_per_img=8)


def test_rpn_filter_proposals_static_output():
    rng = np.random.RandomState(0)
    level_sizes = (8 * 8 * 3, 4 * 4 * 3)
    total = sum(level_sizes)
    props = jnp.asarray(rng.rand(2, total, 4).astype(np.float32) * 30)
    props = jnp.concatenate([props[..., :2], props[..., :2] + 5 +
                             props[..., 2:]], -1)
    obj = jnp.asarray(rng.randn(2, total).astype(np.float32))
    boxes, scores, valid = RPN.filter_proposals(
        props, obj, level_sizes, (64, 64), TINY_RPN, training=False)
    assert boxes.shape == (2, 16, 4)
    assert scores.shape == (2, 16)
    v = np.asarray(valid)
    assert v.any()
    # scores sorted descending among valid
    s = np.asarray(scores)
    for b in range(2):
        sv = s[b][v[b]]
        assert (np.diff(sv) <= 1e-6).all()


def test_rpn_loss_finite_and_balanced():
    rng = np.random.RandomState(1)
    anchors = A.grid_anchors((64, 64), [(8, 8)], ((16,),), ((0.5, 1.0, 2.0),))
    n = anchors.shape[0]
    obj = jnp.asarray(rng.randn(2, n).astype(np.float32))
    deltas = jnp.asarray(rng.randn(2, n, 4).astype(np.float32) * 0.01)
    gt = jnp.asarray(np.array([
        [[5, 5, 25, 25], [30, 30, 60, 60]],
        [[10, 10, 40, 40], [0, 0, 0, 0]],
    ], np.float32))
    gv = jnp.asarray([[True, True], [True, False]])
    out = RPN.rpn_loss(obj, deltas, jnp.asarray(anchors), gt, gv,
                       jax.random.key(0), TINY_RPN)
    assert np.isfinite(float(out["loss_objectness"]))
    assert np.isfinite(float(out["loss_rpn_box_reg"]))
    assert float(out["loss_objectness"]) > 0


def test_rpn_loss_background_image():
    """All-invalid GT (background image) must not produce NaNs."""
    rng = np.random.RandomState(2)
    anchors = A.grid_anchors((64, 64), [(4, 4)], ((16,),), ((1.0,),))
    n = anchors.shape[0]
    obj = jnp.asarray(rng.randn(1, n).astype(np.float32))
    deltas = jnp.asarray(rng.randn(1, n, 4).astype(np.float32) * 0.01)
    gt = jnp.zeros((1, 2, 4))
    gv = jnp.zeros((1, 2), bool)
    out = RPN.rpn_loss(obj, deltas, jnp.asarray(anchors), gt, gv,
                       jax.random.key(0), TINY_RPN)
    assert np.isfinite(float(out["loss_objectness"]))
    assert np.isfinite(float(out["loss_rpn_box_reg"]))


def test_select_training_samples_includes_gt():
    """GT boxes are appended to proposals, so a GT-exact positive must
    exist even with junk proposals."""
    rng = np.random.RandomState(3)
    proposals = jnp.asarray(rng.rand(1, 24, 4).astype(np.float32) * 5)
    prop_valid = jnp.ones((1, 24), bool)
    gt = jnp.asarray([[[10, 10, 30, 30], [40, 40, 60, 60]]], jnp.float32)
    gl = jnp.asarray([[2, 4]], jnp.int32)
    gv = jnp.ones((1, 2), bool)
    s_boxes, s_labels, reg_t, s_pos, s_sampled, s_matched = \
        RH.select_training_samples(
            proposals, prop_valid, gt, gl, gv, jax.random.key(0), TINY_ROI)
    assert s_boxes.shape == (1, 16, 4)
    pos_labels = np.asarray(s_labels)[np.asarray(s_pos)]
    assert set(pos_labels.tolist()) <= {2, 4}
    assert len(pos_labels) >= 2  # both GT self-matches are positives
    # the matched GT index agrees with the sampled label (labels came
    # from gt_labels[matched])
    pos_matched = np.asarray(s_matched)[np.asarray(s_pos)]
    assert all(np.asarray(gl)[0, m] == l
               for m, l in zip(pos_matched, pos_labels))
    # positive reg targets for GT-exact proposals are ~0
    pos_t = np.asarray(reg_t)[np.asarray(s_pos)]
    assert np.abs(pos_t).max() < 1e-4


def test_fastrcnn_loss_ce_and_variants():
    rng = np.random.RandomState(4)
    b, s, c = 2, 16, 5
    logits = jnp.asarray(rng.randn(b, s, c).astype(np.float32))
    reg = jnp.asarray(rng.randn(b, s, c * 4).astype(np.float32) * 0.01)
    labels = jnp.asarray(rng.randint(0, c, (b, s)), dtype=jnp.int32)
    reg_t = jnp.asarray(rng.randn(b, s, 4).astype(np.float32) * 0.01)
    sampled = jnp.ones((b, s), bool)
    for lt in ("ce", "bce", "focal_loss", "gombit", "gombit_fl"):
        cfg = RH.RoIHeadsConfig(num_classes=c, loss_type=lt)
        out = RH.fastrcnn_loss(logits, reg, labels, reg_t, sampled, cfg)
        assert np.isfinite(float(out["loss_classifier"])), lt
        assert np.isfinite(float(out["loss_box_reg"])), lt


def test_postprocess_detections_planted():
    c = 5
    cfg = RH.RoIHeadsConfig(num_classes=c, detections_per_img=4,
                            score_thresh=0.05)
    p = 8
    logits = np.full((1, p, c), -8.0, np.float32)
    logits[0, 2, 3] = 8.0  # proposal 2 -> class 3
    logits[0, :, 0] = 0.0  # background logits neutral
    reg = np.zeros((1, p, c * 4), np.float32)
    proposals = np.tile(
        np.array([[5, 5, 20, 20]], np.float32), (p, 1))[None]
    proposals[0, 2] = [10, 10, 40, 40]
    valid = np.ones((1, p), bool)
    boxes, scores, labels, ovalid = RH.postprocess_detections(
        jnp.asarray(logits), jnp.asarray(reg), jnp.asarray(proposals),
        jnp.asarray(valid), (64, 64), cfg)
    v = np.asarray(ovalid)[0]
    assert v.sum() >= 1
    assert int(np.asarray(labels)[0, 0]) == 3
    np.testing.assert_allclose(np.asarray(boxes)[0, 0], [10, 10, 40, 40],
                               atol=1e-3)


@pytest.fixture(scope="module")
def tiny_frcnn():
    cfg = F.FasterRCNNConfig(
        num_classes=5, rpn=TINY_RPN, roi=TINY_ROI, resnet_layers=(1, 1, 1, 1))
    model = F.FasterRCNN(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    gt = jnp.asarray([[[10, 10, 30, 30]]], jnp.float32)
    gl = jnp.asarray([[2]], jnp.int32)
    gv = jnp.ones((1, 1), bool)
    variables = model.init(
        {"params": jax.random.key(0), "sampler": jax.random.key(1)},
        x, gt, gl, gv, train=True)
    return model, variables


def test_faster_rcnn_train_losses(tiny_frcnn):
    model, variables = tiny_frcnn
    x = jnp.zeros((2, 64, 64, 3))
    gt = jnp.asarray([[[10, 10, 30, 30]], [[20, 20, 50, 50]]], jnp.float32)
    gl = jnp.asarray([[2], [4]], jnp.int32)
    gv = jnp.ones((2, 1), bool)
    losses = model.apply(variables, x, gt, gl, gv, train=True,
                         rngs={"sampler": jax.random.key(2)})
    assert set(losses) == {"loss_classifier", "loss_box_reg",
                           "loss_objectness", "loss_rpn_box_reg"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_faster_rcnn_eval_detections(tiny_frcnn):
    model, variables = tiny_frcnn
    x = jnp.zeros((1, 64, 64, 3))
    boxes, scores, labels, valid = model.apply(variables, x, train=False)
    assert boxes.shape == (1, TINY_ROI.detections_per_img, 4)
    assert np.isfinite(np.asarray(boxes)).all()


def test_faster_rcnn_grads_flow(tiny_frcnn):
    model, variables = tiny_frcnn
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    gt = jnp.asarray([[[10, 10, 30, 30]]], jnp.float32)
    gl = jnp.asarray([[2]], jnp.int32)
    gv = jnp.ones((1, 1), bool)

    def loss_fn(params):
        out = model.apply(
            {**variables, "params": params}, x, gt, gl, gv, train=True,
            rngs={"sampler": jax.random.key(3)})
        return sum(out.values())

    g = jax.grad(loss_fn)(variables["params"])
    gnorm = float(jnp.sqrt(sum(
        jnp.sum(x_ ** 2) for x_ in jax.tree_util.tree_leaves(g))))
    assert np.isfinite(gnorm) and gnorm > 0


def test_faster_rcnn_background_image_finite(tiny_frcnn):
    """Regression: images with zero GT must give finite losses AND
    gradients (log(0) box encodings used to leak inf through the mask)."""
    model, variables = tiny_frcnn
    x = jnp.ones((1, 64, 64, 3)) * 0.3
    gt = jnp.zeros((1, 1, 4))
    gl = jnp.zeros((1, 1), jnp.int32)
    gv = jnp.zeros((1, 1), bool)

    def loss_fn(params):
        out = model.apply(
            {**variables, "params": params}, x, gt, gl, gv, train=True,
            rngs={"sampler": jax.random.key(5)})
        return sum(out.values())

    loss, g = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = float(jnp.sqrt(sum(
        jnp.sum(x_ ** 2) for x_ in jax.tree_util.tree_leaves(g))))
    assert np.isfinite(gnorm)


def test_packed_rpn_head_matches_per_level():
    import numpy as np

    feats = [jnp.asarray(np.random.RandomState(i).randn(
        2, s, s, 16).astype(np.float32)) for i, s in
        enumerate((16, 8, 4, 2, 1))]
    hp = RPN.RPNHead(num_anchors=3, in_channels=16, packed=True)
    hu = RPN.RPNHead(num_anchors=3, in_channels=16, packed=False)
    v = hu.init(jax.random.key(0), feats)
    ou, ru, lu = hu.apply(v, feats)
    op, rp, lp = hp.apply(v, feats)
    assert lu == lp
    np.testing.assert_allclose(np.asarray(op), np.asarray(ou),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rp), np.asarray(ru),
                               rtol=1e-5, atol=1e-5)


def test_s2d_stem_matches_direct_7x7_conv():
    """SpaceToDepthStem is an exact reparametrization of the 7x7/s2
    conv (torchvision ResNet.conv1) — same params, same outputs."""
    from object_detectors_tpu.models.resnet import SpaceToDepthStem

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    stem = SpaceToDepthStem(dtype=jnp.float32)
    v = stem.init(jax.random.key(0), x)
    y = stem.apply(v, x)

    w = v["params"]["kernel"]
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert y.shape == ref.shape == (2, 32, 32, 64)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # odd-size fallback path also matches
    xo = jnp.asarray(rng.randn(1, 33, 33, 3).astype(np.float32))
    yo = stem.apply(v, xo)
    refo = jax.lax.conv_general_dilated(
        xo, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(yo), np.asarray(refo),
                               rtol=1e-5, atol=1e-5)


def test_frcnn_detections_identical_with_tiled_pooler():
    """FULL FasterRCNN eval: the tiled pooler must reproduce the canvas
    pooler's detections exactly (boxes, scores, labels, validity)."""
    import dataclasses

    from object_detectors_tpu.models.faster_rcnn import (
        FasterRCNN, FasterRCNNConfig,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    outs = {}
    for method in ("canvas", "pallas_tiled_interpret"):
        cfg = FasterRCNNConfig(
            num_classes=5, rpn=TINY_RPN,
            roi=dataclasses.replace(TINY_ROI, pooler_method=method),
            resnet_layers=(1, 1, 1, 1))
        model = FasterRCNN(cfg, dtype=jnp.float32)
        v = model.init(jax.random.key(0), x, train=False)
        outs[method] = model.apply(v, x, train=False)
    a, b = outs["canvas"], outs["pallas_tiled_interpret"]
    for name, av, bv in zip(("boxes", "scores", "labels", "valid"),
                            a, b):
        np.testing.assert_allclose(np.asarray(av), np.asarray(bv),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_stem4_matches_direct_stem():
    """The 4x4 phase-split stem (_stem4: conv1 + frozen-BN + relu +
    maxpool in phase layout) matches the direct 7x7/s2 conv ->
    affine -> relu -> 3x3/s2 maxpool composition (torchvision
    ResNet.conv1..maxpool, utilities/resnet.py:146-151)."""
    from object_detectors_tpu.models.common import max_pool_same
    from object_detectors_tpu.models.resnet import _stem4

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1)
    bn = {
        "weight": jnp.asarray(rng.rand(64).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rng.randn(64).astype(np.float32)),
        "running_mean": jnp.asarray(rng.randn(64).astype(np.float32)),
        "running_var": jnp.asarray(rng.rand(64).astype(np.float32)
                                   + 0.2),
    }
    eps = 1e-5
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    scale = bn["weight"] / jnp.sqrt(bn["running_var"] + eps)
    ref = ref * scale + (bn["bias"] - bn["running_mean"] * scale)
    ref = jax.nn.relu(ref)
    ref = max_pool_same(ref, 3, 2)

    got = _stem4(x, w, bn, jnp.float32)
    assert got.shape == ref.shape == (2, 16, 24, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_resnet_stem4_same_params_and_output_as_fallback():
    """ResNet's phase-split stem path declares the identical
    conv1/bn1 parameter tree and produces the same features as the
    s2d-2 fallback (forced via a 4-indivisible input size)."""
    from object_detectors_tpu.models.resnet import ResNet

    net = ResNet((1, 1), "bottleneck", norm="frozen",
                 dtype=jnp.float32)
    rng = np.random.RandomState(11)
    x4 = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    v = net.init(jax.random.key(0), x4)
    # param/frozen trees must be loadable regardless of input size
    xodd = jnp.asarray(np.pad(np.asarray(x4), ((0, 0), (0, 2), (0, 2),
                                               (0, 0))))
    f4 = net.apply(v, x4)
    fodd = net.apply(v, xodd)  # fallback path, same tree
    assert f4[0].shape[1:] == (16, 16, 256)
    assert fodd[0].shape[1] == fodd[0].shape[2] == 17
    assert np.isfinite(np.asarray(f4[-1])).all()
    assert np.isfinite(np.asarray(fodd[-1])).all()


def test_rpn_filter_batched_topk_matches_perlevel():
    """topk_mode="batched" (r5 A/B knob, measured loser at RPN row
    sizes but kept for the record) must produce identical proposals to
    the production per-level radix top-k."""
    cfg = RPN.RPNConfig(pre_nms_top_n_test=24, post_nms_top_n_test=12)
    level_sizes = (16 * 16 * 3, 8 * 8 * 3, 4 * 4 * 3)
    total = sum(level_sizes)
    rng = np.random.RandomState(3)
    props = rng.rand(2, total, 4).astype(np.float32) * 60
    props = np.concatenate([
        np.minimum(props[..., :2], props[..., 2:]),
        np.maximum(props[..., :2], props[..., 2:]) + 2.0], -1)
    obj = rng.randn(2, total).astype(np.float32)
    obj[0, :7] = 3.0  # exact score ties exercise lowest-index breaks
    outs = {}
    for mode in ("perlevel", "batched", "fused"):
        outs[mode] = RPN.filter_proposals(
            jnp.asarray(props), jnp.asarray(obj), level_sizes,
            (64, 64), cfg, training=False, topk_mode=mode)
    for other in ("batched", "fused"):
        for a, b, name in zip(outs["perlevel"], outs[other],
                              ("boxes", "scores", "valid")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=f"{other}:{name}")
