"""rcnn batch pipeline + detection ModelAdapter smoke tests (small)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from object_detectors_tpu.data import coco as D
from object_detectors_tpu.data import synthetic
from object_detectors_tpu.detection_main import ModelAdapter, rcnn_batches


@pytest.fixture(scope="module")
def ds():
    rng = np.random.RandomState(0)
    gt = synthetic.make_coco_dicts(rng, num_images=6, img_size=96,
                                   num_classes=4)
    imgs = {im["id"]: np.random.RandomState(im["id"]).randint(
        0, 255, (96, 96, 3)).astype(np.uint8) for im in gt["images"]}
    return D.CocoDetectionDataset(
        gt, label_mode="lvis0", image_loader=lambda i: imgs[i["id"]])


def test_rcnn_batches_shapes_and_labels(ds):
    batches = list(rcnn_batches(ds, 2, canvas=128, max_boxes=8,
                                min_size=100, max_size=128))
    assert len(batches) == 3
    b = batches[0]
    assert b["images"].shape == (2, 128, 128, 3)
    assert b["gt_boxes"].shape == (2, 8, 4)
    # labels are 1-based (0 = background)
    lb = b["gt_labels"][b["gt_valid"]]
    assert lb.min() >= 1
    # boxes are xyxy inside the canvas
    bx = b["gt_boxes"][b["gt_valid"]]
    assert (bx[:, 2] >= bx[:, 0]).all() and (bx[:, 3] >= bx[:, 1]).all()
    assert bx.max() <= 128.0 + 1e-3


def test_rcnn_batches_hflip(ds):
    rng = np.random.RandomState(0)

    class AlwaysFlip:
        def rand(self):
            return 0.0

    b_flip = next(iter(rcnn_batches(ds, 1, canvas=128, max_boxes=8,
                                    min_size=100, max_size=128,
                                    hflip_rng=AlwaysFlip())))
    b_plain = next(iter(rcnn_batches(ds, 1, canvas=128, max_boxes=8,
                                     min_size=100, max_size=128)))
    assert not np.allclose(b_flip["images"], b_plain["images"])


def test_retinanet_adapter_loss_and_detect(ds):
    adapter = ModelAdapter("retinanet_resnet50_fpn", num_classes=5,
                           image_size=128, resnet_layers=(1, 1, 1, 1),
                           small=True)
    variables = adapter.init_variables(jax.random.key(0))
    batch = next(iter(rcnn_batches(ds, 2, canvas=128, max_boxes=8,
                                   min_size=100, max_size=128)))
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if k not in ("image_ids", "scale_factors")}
    losses = adapter.losses(variables, jb, jax.random.key(1))
    assert set(losses) == {"classification", "bbox_regression"}
    assert all(np.isfinite(float(v)) for v in losses.values())
    b, sc, lab, v = adapter.detect(variables, jb["images"])
    assert b.shape[0] == 2
    lb = np.asarray(lab)[np.asarray(v)]
    if lb.size:
        assert lb.min() >= 1  # evaluator gets 1-based labels


def test_ssd_adapter_loss(ds):
    adapter = ModelAdapter("ssd300_vgg16", num_classes=5,
                           image_size=128, small=True)
    variables = adapter.init_variables(jax.random.key(0))
    batch = next(iter(rcnn_batches(ds, 2, canvas=128, max_boxes=8,
                                   min_size=100, max_size=128)))
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if k not in ("image_ids", "scale_factors")}
    losses = adapter.losses(variables, jb, jax.random.key(1))
    assert all(np.isfinite(float(v)) for v in losses.values())
