"""tf-idf / CSL wiring through the two-stage stack and one-stage losses.

VERDICT r1 items 2+3: the reference threads tfidf through RoIHeads
(`tvision/roi_heads.py:569-576,723-729,801-827`), RetinaNet
(`retinanet.py:125-143`), SSD (`ssd.py:269-278`) and builds CSL weights
in `detection/train.py:121-135`. These tests prove the flags actually
flip losses/detections in our stack.
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from object_detectors_tpu.data import idf as idf_lib
from object_detectors_tpu.data import synthetic
from object_detectors_tpu.data import coco as D
from object_detectors_tpu.detection_main import (
    ModelAdapter, build_csl_weights, build_tfidf_vector, rcnn_batches)
from object_detectors_tpu.models import retinanet as RN
from object_detectors_tpu.models import yolo_criterion as YC
from object_detectors_tpu.models import anchors as anchor_lib


NUM_CLASSES = 5


@pytest.fixture(scope="module")
def ds():
    rng = np.random.RandomState(0)
    gt = synthetic.make_coco_dicts(rng, num_images=6, img_size=96,
                                   num_classes=4)
    imgs = {im["id"]: np.random.RandomState(im["id"]).randint(
        0, 255, (96, 96, 3)).astype(np.uint8) for im in gt["images"]}
    return D.CocoDetectionDataset(
        gt, label_mode="lvis0", image_loader=lambda i: imgs[i["id"]])


@pytest.fixture(scope="module")
def batch(ds):
    b = next(iter(rcnn_batches(ds, 2, canvas=128, max_boxes=8,
                               min_size=100, max_size=128)))
    return {k: jnp.asarray(v) for k, v in b.items()
            if k not in ("image_ids", "scale_factors")}


def _ns(**kw):
    base = dict(tfidf=None, tfidf_norm=0, csl=None)
    base.update(kw)
    return argparse.Namespace(**base)


def test_build_csl_weights_eff_samp(ds):
    w = build_csl_weights(_ns(csl="eff_samp"), ds.gt, NUM_CLASSES)
    w = np.asarray(w)
    assert w.shape == (NUM_CLASSES,)
    assert w[0] == 1.0  # background
    assert np.isfinite(w).all() and (w > 0).all()
    # rarer classes get larger weights
    tables = idf_lib.idf_tables(ds.gt)
    freq = np.zeros(NUM_CLASSES)
    for i, cid in enumerate(tables["_kept_category_ids"]):
        freq[cid] = tables["instance_freq"][i]
    present = freq > 0
    order_by_freq = np.argsort(freq[present])
    assert (np.diff(w[present][order_by_freq]) <= 1e-9).all()


def test_build_csl_weights_column(ds):
    w = build_csl_weights(_ns(csl="smooth"), ds.gt, NUM_CLASSES)
    vec = build_tfidf_vector(_ns(tfidf="smooth"), ds.gt, NUM_CLASSES)
    np.testing.assert_allclose(np.asarray(w), np.asarray(vec))


def test_frcnn_tfidf_flags_flip_losses_and_detections(ds, batch):
    """One small FasterRCNN; compare losses/detections across tfidf
    settings (roi_heads.py:723-729, 826-827)."""
    common = dict(num_classes=NUM_CLASSES, image_size=128,
                  resnet_layers=(1, 1, 1, 1), small=True)
    plain = ModelAdapter("fasterrcnn_resnet50_fpn", **common)
    variables = plain.init_variables(jax.random.key(0))

    tfidf_vec = jnp.asarray(
        np.linspace(0.5, 3.0, NUM_CLASSES).astype(np.float32))
    scaled = ModelAdapter("fasterrcnn_resnet50_fpn", tfidf=tfidf_vec,
                          **common)
    csl = ModelAdapter("fasterrcnn_resnet50_fpn",
                       class_weights=jnp.asarray(
                           np.linspace(1.0, 9.0, NUM_CLASSES)
                           .astype(np.float32)), **common)
    mini = ModelAdapter("fasterrcnn_resnet50_fpn", tfidf_mini_batch=True,
                        **common)

    rng = jax.random.key(1)
    l_plain = plain.losses(variables, batch, rng)
    l_scaled = scaled.losses(variables, batch, rng)
    l_csl = csl.losses(variables, batch, rng)
    l_mini = mini.losses(variables, batch, rng)
    for l in (l_plain, l_scaled, l_csl, l_mini):
        assert np.isfinite(float(l["loss_classifier"]))
    # tfidf logit scaling, CSL weights and the minibatch recompute all
    # change the classification loss but not the box loss
    assert float(l_scaled["loss_classifier"]) != pytest.approx(
        float(l_plain["loss_classifier"]))
    assert float(l_csl["loss_classifier"]) != pytest.approx(
        float(l_plain["loss_classifier"]))
    assert float(l_mini["loss_classifier"]) != pytest.approx(
        float(l_plain["loss_classifier"]))
    assert float(l_scaled["loss_box_reg"]) == pytest.approx(
        float(l_plain["loss_box_reg"]))

    # minibatch recompute == explicitly passing minibatch_idf as tfidf
    mb = idf_lib.minibatch_idf(batch["gt_labels"], batch["gt_valid"],
                               NUM_CLASSES)
    manual = ModelAdapter("fasterrcnn_resnet50_fpn", tfidf=mb, **common)
    l_manual = manual.losses(variables, batch, rng)
    assert float(l_manual["loss_classifier"]) == pytest.approx(
        float(l_mini["loss_classifier"]), rel=1e-5)

    # tfidf_post changes detection scores in eval
    d_plain = plain.detect(variables, batch["images"])
    d_scaled = scaled.detect(variables, batch["images"])
    s0 = np.asarray(d_plain[1])[np.asarray(d_plain[3])]
    s1 = np.asarray(d_scaled[1])[np.asarray(d_scaled[3])]
    if s0.size and s1.size:
        assert not np.allclose(s0[: min(len(s0), len(s1))],
                               s1[: min(len(s0), len(s1))])


def test_retinanet_minibatch_idf_matches_manual():
    rng = np.random.RandomState(7)
    a, k = 64, NUM_CLASSES
    anchors = anchor_lib.grid_anchors(
        (64, 64), [(4, 4)], ((32, 40.3, 50.8),), ((0.5, 1.0, 2.0),))
    anchors = jnp.asarray(anchors)[:a]
    cls = jnp.asarray(rng.randn(2, a, k).astype(np.float32))
    reg = jnp.asarray(rng.randn(2, a, 4).astype(np.float32) * 0.1)
    gt = jnp.asarray([[[5, 5, 30, 30]], [[10, 10, 50, 50]]], jnp.float32)
    gl = jnp.asarray([[1], [3]], jnp.int32)
    gv = jnp.ones((2, 1), bool)

    cfg_mb = RN.RetinaNetConfig(num_classes=k, tfidf_mini_batch=True)
    cfg = RN.RetinaNetConfig(num_classes=k)
    mb = idf_lib.minibatch_idf(gl, gv, k)
    l_mb = RN.retinanet_loss(cls, reg, anchors, gt, gl, gv, cfg_mb)
    l_manual = RN.retinanet_loss(cls, reg, anchors, gt, gl, gv, cfg,
                                 tfidf=mb)
    l_plain = RN.retinanet_loss(cls, reg, anchors, gt, gl, gv, cfg)
    assert float(l_mb["classification"]) == pytest.approx(
        float(l_manual["classification"]), rel=1e-6)
    assert float(l_mb["classification"]) != pytest.approx(
        float(l_plain["classification"]))


def test_yolo_tfidf_batch_matches_manual():
    rng = np.random.RandomState(9)
    cfg = YC.YoloLossConfig(num_classes=4, img_size=64,
                            anchors=(((20, 20),), ((10, 10),), ((5, 5),)))
    cfg_mb = YC.YoloLossConfig(num_classes=4, img_size=64,
                               anchors=cfg.anchors, tfidf_batch=True)
    priors, gw = YC.make_priors(cfg, (2, 4, 8))
    p = priors.shape[0]
    raw = jnp.asarray(rng.randn(2, p, 9).astype(np.float32))
    gt = jnp.asarray(rng.rand(2, 3, 4).astype(np.float32) * 0.4 + 0.2)
    gl = jnp.asarray(rng.randint(0, 4, (2, 3)), jnp.int32)
    gv = jnp.ones((2, 3), bool)

    mb = idf_lib.minibatch_idf(gl, gv, 4)
    l_mb, sub_mb, _ = YC.yolo_loss(raw, priors, gw, gt, gl, gv, cfg_mb)
    l_manual, sub_manual, _ = YC.yolo_loss(raw, priors, gw, gt, gl, gv,
                                           cfg, idf_logits=mb)
    l_plain, _, _ = YC.yolo_loss(raw, priors, gw, gt, gl, gv, cfg)
    assert float(l_mb) == pytest.approx(float(l_manual), rel=1e-6)
    assert float(sub_mb[5]) == pytest.approx(float(sub_manual[5]),
                                             rel=1e-6)
    assert float(l_mb) != pytest.approx(float(l_plain))
