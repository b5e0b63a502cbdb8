"""Mask R-CNN mask branch + SSD300 tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from object_detectors_tpu.models import anchors as A
from object_detectors_tpu.models import mask_rcnn as MR
from object_detectors_tpu.models import roi_heads as RH
from object_detectors_tpu.models import rpn as RPN
from object_detectors_tpu.models import ssd as S


def test_project_masks_on_boxes_identity():
    """A mask covering the whole box projects to all ones."""
    masks = jnp.zeros((1, 32, 32)).at[0, 8:16, 8:16].set(1.0)
    boxes = jnp.array([[8.0, 8.0, 16.0, 16.0]])
    out = np.asarray(MR.project_masks_on_boxes(
        masks, boxes, jnp.array([0]), 8))
    assert out.shape == (1, 8, 8)
    # interior bins fully covered
    assert out[0, 2:6, 2:6].min() > 0.9


def test_maskrcnn_loss_perfect_logits():
    """Strong logits agreeing with targets -> near-zero loss."""
    b, s, m, c = 1, 4, 8, 3
    gt_masks = jnp.ones((b, 2, 32, 32))
    gt_labels = jnp.asarray([[1, 2]], jnp.int32)
    proposals = jnp.tile(jnp.asarray([[4.0, 4.0, 28.0, 28.0]]), (b, s, 1))
    matched = jnp.zeros((b, s), jnp.int32)
    pos = jnp.ones((b, s), bool)
    logits = jnp.full((b, s, m, m, c), -20.0)
    logits = logits.at[..., 1].set(20.0)  # class 1 channel: all fg
    loss = MR.maskrcnn_loss(logits, proposals, gt_masks, gt_labels,
                            matched, pos)
    assert float(loss) < 1e-6

    # flipped logits -> large loss
    bad = -logits
    loss2 = MR.maskrcnn_loss(bad, proposals, gt_masks, gt_labels,
                             matched, pos)
    assert float(loss2) > 5.0


def test_maskrcnn_inference_selects_label_channel():
    logits = jnp.stack([jnp.full((2, 3, 4, 4), -5.0),
                        jnp.full((2, 3, 4, 4), 5.0)], axis=-1)
    labels = jnp.asarray([[1, 0, 1], [0, 1, 0]], jnp.int32)
    probs = np.asarray(MR.maskrcnn_inference(logits, labels))
    assert probs.shape == (2, 3, 4, 4)
    assert probs[0, 0].mean() > 0.99   # label 1 -> +5 channel
    assert probs[0, 1].mean() < 0.01   # label 0 -> -5 channel


def test_paste_masks_in_image():
    masks = jnp.ones((1, 8, 8))
    boxes = jnp.array([[10.0, 10.0, 20.0, 20.0]])
    out = np.asarray(MR.paste_masks_in_image(masks, boxes, (40, 40)))
    assert out.shape == (1, 40, 40)
    assert out[0, 15, 15] > 0.9       # inside the box
    assert out[0, 2, 2] == 0.0        # far outside
    assert out[0, 35, 35] == 0.0


def test_paste_masks_multiple_disjoint():
    masks = jnp.ones((2, 4, 4))
    boxes = jnp.array([[0.0, 0.0, 8.0, 8.0], [20.0, 20.0, 30.0, 30.0]])
    out = np.asarray(MR.paste_masks_in_image(masks, boxes, (32, 32)))
    assert out[0, 4, 4] > 0.5 and out[0, 25, 25] == 0.0
    assert out[1, 25, 25] > 0.5 and out[1, 4, 4] == 0.0


@pytest.fixture(scope="module")
def tiny_maskrcnn():
    cfg = MR.MaskRCNNConfig(
        num_classes=5,
        rpn=RPN.RPNConfig(pre_nms_top_n_train=32, pre_nms_top_n_test=32,
                          post_nms_top_n_train=16, post_nms_top_n_test=8,
                          batch_size_per_image=16),
        roi=RH.RoIHeadsConfig(num_classes=5, batch_size_per_image=8,
                              detections_per_img=4),
        resnet_layers=(1, 1, 1, 1),
        mask_pool_size=(7, 7))
    model = MR.MaskRCNN(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    gt = jnp.asarray([[[10, 10, 30, 30]]], jnp.float32)
    gl = jnp.asarray([[2]], jnp.int32)
    gv = jnp.ones((1, 1), bool)
    gm = jnp.zeros((1, 1, 64, 64)).at[:, :, 10:30, 10:30].set(1.0)
    variables = model.init(
        {"params": jax.random.key(0), "sampler": jax.random.key(1)},
        x, gt, gl, gv, gm, train=True)
    return model, variables, (x, gt, gl, gv, gm)


def test_mask_rcnn_train_losses(tiny_maskrcnn):
    model, variables, (x, gt, gl, gv, gm) = tiny_maskrcnn
    losses = model.apply(variables, x, gt, gl, gv, gm, train=True,
                         rngs={"sampler": jax.random.key(2)})
    assert "loss_mask" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_mask_rcnn_eval_returns_masks(tiny_maskrcnn):
    model, variables, (x, *_ ) = tiny_maskrcnn
    boxes, scores, labels, valid, masks = model.apply(
        variables, x, train=False)
    assert masks.shape[0] == 1 and masks.shape[1] == boxes.shape[1]
    assert masks.shape[2] == masks.shape[3]  # square mask probs
    assert np.isfinite(np.asarray(masks)).all()


# ----------------------------- SSD ---------------------------------- #

@pytest.fixture(scope="module")
def tiny_ssd():
    cfg = S.SSDConfig(num_classes=5, detections_per_img=8,
                      topk_candidates=16)
    model = S.SSD300(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    return cfg, model, variables


def test_ssd_forward_shapes(tiny_ssd):
    cfg, model, variables = tiny_ssd
    x = jnp.zeros((2, 128, 128, 3))
    cls, reg, level_sizes = model.apply(variables, x, train=False)
    assert len(level_sizes) == 6
    total = sum(level_sizes)
    assert cls.shape == (2, total, 5)
    assert reg.shape == (2, total, 4)
    # anchor generator agrees with the head's level sizes
    grids = [(int(np.sqrt(ls / a)),) * 2 for ls, a in
             zip(level_sizes, (4, 6, 6, 6, 4, 4))]
    anchors = A.ssd_default_boxes((128, 128), grids)
    assert anchors.shape == (total, 4)


def test_ssd_loss_and_hard_negatives(tiny_ssd):
    cfg, model, variables = tiny_ssd
    rng = np.random.RandomState(0)
    x = jnp.zeros((2, 128, 128, 3))
    cls, reg, level_sizes = model.apply(variables, x, train=False)
    grids = [(int(np.sqrt(ls / a)),) * 2 for ls, a in
             zip(level_sizes, (4, 6, 6, 6, 4, 4))]
    anchors = jnp.asarray(A.ssd_default_boxes((128, 128), grids))
    gt = jnp.asarray([[[10, 10, 60, 60]], [[30, 30, 100, 100]]],
                     jnp.float32)
    gl = jnp.asarray([[2], [4]], jnp.int32)
    gv = jnp.ones((2, 1), bool)
    out = S.ssd_loss(cls.astype(jnp.float32), reg.astype(jnp.float32),
                     anchors, gt, gl, gv, cfg)
    assert np.isfinite(float(out["bbox_regression"]))
    assert np.isfinite(float(out["classification"]))
    assert float(out["classification"]) > 0


def test_ssd_loss_background_image(tiny_ssd):
    cfg, model, variables = tiny_ssd
    x = jnp.zeros((1, 128, 128, 3))
    cls, reg, level_sizes = model.apply(variables, x, train=False)
    grids = [(int(np.sqrt(ls / a)),) * 2 for ls, a in
             zip(level_sizes, (4, 6, 6, 6, 4, 4))]
    anchors = jnp.asarray(A.ssd_default_boxes((128, 128), grids))
    out = S.ssd_loss(cls.astype(jnp.float32), reg.astype(jnp.float32),
                     anchors, jnp.zeros((1, 1, 4)),
                     jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), bool),
                     cfg)
    assert np.isfinite(float(out["bbox_regression"]))
    assert np.isfinite(float(out["classification"]))


def test_ssd_postprocess_planted(tiny_ssd):
    cfg, model, variables = tiny_ssd
    x = jnp.zeros((1, 128, 128, 3))
    cls, reg, level_sizes = model.apply(variables, x, train=False)
    total = sum(level_sizes)
    grids = [(int(np.sqrt(ls / a)),) * 2 for ls, a in
             zip(level_sizes, (4, 6, 6, 6, 4, 4))]
    anchors = jnp.asarray(A.ssd_default_boxes((128, 128), grids))
    logits = np.full((1, total, 5), 0.0, np.float32)
    logits[0, :, 0] = 6.0  # background everywhere
    logits[0, 37, 3] = 12.0  # one confident class-3 anchor
    regs = np.zeros((1, total, 4), np.float32)
    boxes, scores, labels, valid = S.ssd_postprocess(
        jnp.asarray(logits), jnp.asarray(regs), anchors, (128, 128), cfg)
    v = np.asarray(valid)[0]
    assert v.any()
    assert int(np.asarray(labels)[0, 0]) == 3
    exp = np.asarray(anchors[37])
    exp = np.clip(exp, 0, 128)
    np.testing.assert_allclose(np.asarray(boxes)[0, 0], exp, atol=1e-2)
