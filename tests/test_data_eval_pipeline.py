"""Data pipeline + evaluator integration: synthetic COCO dataset ->
padded batches -> (fake perfect model) -> evaluator -> mAP 1.0.

This closes the loop the reference can only exercise with real COCO on
disk (SURVEY.md §4 fixture plan)."""

import numpy as np
import pytest

from object_detectors_tpu.data import coco as D
from object_detectors_tpu.data import idf as IDF
from object_detectors_tpu.data import synthetic
from object_detectors_tpu.data import transforms as T
from object_detectors_tpu.eval import evaluator as E


@pytest.fixture(scope="module")
def synth():
    rng = np.random.RandomState(0)
    gt = synthetic.make_coco_dicts(rng, num_images=10, img_size=96,
                                   num_classes=4)
    imgs = {im["id"]: (np.random.RandomState(im["id"])
                       .randint(0, 255, (im["height"], im["width"], 3))
                       .astype(np.uint8)) for im in gt["images"]}
    ds = D.CocoDetectionDataset(
        gt, label_mode="raw",
        image_loader=lambda info: imgs[info["id"]])
    return gt, ds


def test_dataset_basic(synth):
    gt, ds = synth
    assert len(ds) == 10
    image, tgt = ds[0]
    assert image.dtype == np.uint8
    assert tgt["boxes_xywh"].shape[1] == 4
    assert len(tgt["labels"]) == len(tgt["boxes_xywh"])


def test_yolo_batches_shapes(synth):
    gt, ds = synth
    batches = list(D.yolo_batches(ds, batch_size=4, inp_dim=64,
                                  max_boxes=8))
    assert len(batches) == 3  # ceil(10/4) with fill
    b = batches[0]
    assert b["images"].shape == (4, 64, 64, 3)
    assert b["gt_boxes"].shape == (4, 8, 4)
    assert b["gt_valid"].any()
    # boxes are relative cxcywh in [0, 1]
    valid_boxes = b["gt_boxes"][b["gt_valid"]]
    assert (valid_boxes >= 0).all() and (valid_boxes <= 1).all()
    # last batch padded entries are invalid with image_id -1
    last = batches[-1]
    assert (last["image_ids"] == -1).sum() == 2
    assert (~last["gt_valid"][last["image_ids"] == -1]).all()


def test_sharding_partitions_all_items(synth):
    gt, ds = synth
    seen = []
    for p in range(4):
        idx = D.shard_indices(len(ds), p, 4, shuffle=True, seed=1)
        seen.extend(idx.tolist())
    assert len(seen) == 12  # padded to multiple of 4
    assert set(seen) == set(range(10))


def test_abandoned_iterator_leaks_no_worker_threads(synth):
    """Breaking out of a batch iterator must cancel + join its prefetch
    worker (round-2 SIGABRT root cause: workers blocked forever in
    queue.put accumulated across the pytest process)."""
    import gc
    import threading

    gt, ds = synth
    before = threading.active_count()
    it = D.yolo_batches(ds, batch_size=2, inp_dim=64, max_boxes=8,
                        prefetch=1)
    next(it)  # worker is live and blocked on the depth-1 queue
    it.close()  # explicit close; same path as break / GC
    del it
    gc.collect()
    deadline = 5.0
    import time
    t0 = time.monotonic()
    while threading.active_count() > before:
        if time.monotonic() - t0 > deadline:
            break
        time.sleep(0.01)
    assert threading.active_count() <= before

    # Abandonment via plain GC (no explicit close) must also clean up.
    it2 = D.yolo_batches(ds, batch_size=2, inp_dim=64, max_boxes=8,
                         prefetch=1)
    next(it2)
    del it2
    gc.collect()
    t0 = time.monotonic()
    while threading.active_count() > before:
        if time.monotonic() - t0 > deadline:
            break
        time.sleep(0.01)
    assert threading.active_count() <= before


def test_prefetched_worker_error_propagates(synth):
    def boom(i0):
        if i0 >= 2:
            raise RuntimeError("worker failed")
        return i0

    out = []
    with pytest.raises(RuntimeError, match="worker failed"):
        for x in D._prefetched(boom, range(0, 6, 2), depth=1):
            out.append(x)
    assert out == [0]


def test_perfect_model_gets_map_one(synth):
    """Convert GT through the batch pipeline and back via the evaluator:
    the whole coordinate round-trip must preserve mAP = 1.0."""
    gt, ds = synth
    ev = E.DetectionEvaluator(gt)
    for b in D.yolo_batches(ds, batch_size=4, inp_dim=64, max_boxes=8):
        # fake detections = the padded GT converted to xyxy in inp space
        boxes_rel = b["gt_boxes"]
        cx, cy, w, h = [boxes_rel[..., i] for i in range(4)]
        xyxy = np.stack([(cx - w / 2) * 64, (cy - h / 2) * 64,
                         (cx + w / 2) * 64, (cy + h / 2) * 64], -1)
        keep = b["image_ids"] >= 0
        ev.update(b["image_ids"][keep], xyxy[keep],
                  np.full(xyxy.shape[:2], 0.9)[keep],
                  b["gt_labels"][keep], b["gt_valid"][keep],
                  b["scale_factors"][keep])
    stats = ev.summarize()
    assert stats[0] == pytest.approx(1.0, abs=1e-3)


def test_label_maps():
    assert T.COCO_91_TO_80[1] == 0
    assert T.COCO_91_TO_80[90] == 79
    assert E.COCO_80_TO_91[0] == 1
    assert len(E.COCO_80_TO_91) == 80


def test_idf_tables_synthetic():
    rng = np.random.RandomState(1)
    gt = synthetic.make_coco_dicts(rng, num_images=50, num_classes=5)
    t = IDF.idf_tables(gt)
    n_kept = len(t["_kept_category_ids"])
    for v in IDF.VARIANTS:
        assert t[v].shape == (n_kept,)
        assert np.isfinite(t[v]).all(), v
    # smooth = log((N+1)/(df+1)) + 1, hand-check one entry
    df0 = t["img_freq"][0]
    assert t["smooth"][0] == pytest.approx(
        np.log(51 / (df0 + 1)) + 1, rel=1e-6)
    # rarer class -> larger idf
    order = np.argsort(t["img_freq"])
    assert t["smooth"][order[0]] >= t["smooth"][order[-1]]


def test_idf_csv_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    gt = synthetic.make_coco_dicts(rng, num_images=20, num_classes=3)
    t = IDF.idf_tables(gt)
    path = str(tmp_path / "idf.csv")
    IDF.save_idf_csv(t, path)
    loaded = IDF.load_idf_csv(path)
    np.testing.assert_allclose(loaded["smooth"], t["smooth"], rtol=1e-9)
    np.testing.assert_allclose(loaded["instance_freq"],
                               t["instance_freq"], rtol=1e-9)


def test_minibatch_idf():
    import jax.numpy as jnp

    labels = jnp.asarray([[0, 1, 1], [1, 2, 0]])
    valid = jnp.asarray([[True, True, False], [True, True, False]])
    w = np.asarray(IDF.minibatch_idf(labels, valid, 4))
    # class 0: present in img0 only (img1's class-0 slot is invalid)
    # -> df=1 -> log(3/2)+1 ; class 1: both -> log(3/3)+1 = 1
    assert w[0] == pytest.approx(np.log(3 / 2) + 1, rel=1e-5)
    assert w[1] == pytest.approx(1.0, rel=1e-5)
    assert w[3] == pytest.approx(np.log(3 / 1) + 1, rel=1e-5)


def test_eq_rare_mask():
    mask = IDF.eq_rare_mask(np.array([1000.0, 1.0, 500.0]),
                            threshold=0.01)
    assert mask.tolist() == [0.0, 1.0, 0.0]


def test_rcnn_resize_and_hflip():
    img = np.random.RandomState(0).randint(0, 255, (60, 80, 3), np.uint8)
    boxes = np.array([[10, 10, 30, 40]], np.float32)
    out, b, true_size, scale = T.rcnn_resize(img, boxes, min_size=120,
                                             max_size=200)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert true_size == (120, 160)
    np.testing.assert_allclose(b, boxes * 2.0)
    img2, b2 = T.hflip(img, boxes)
    np.testing.assert_allclose(b2, [[80 - 30, 10, 80 - 10, 40]])


def test_yolo_augment_keeps_boxes():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    boxes = np.array([[10, 10, 50, 50]], np.float32)
    labels = np.array([1], np.int32)
    for _ in range(20):
        out_img, out_b, out_l = T.yolo_augment(rng, img, boxes, labels)
        assert out_img.shape == img.shape
        assert len(out_b) == len(out_l)


def test_uint8_batches_device_resize_roundtrip_map_one(synth):
    """Device-ingest pipeline (uint8 canvas + sizes): GT converted
    through the uint8 batch pipeline and the evaluator must round-trip
    to mAP 1.0 — the box-rescale contract is unchanged."""
    import jax.numpy as jnp
    from object_detectors_tpu.kernels.preprocess import (
        resize_normalize_from_canvas,
    )

    gt, ds = synth
    ev = E.DetectionEvaluator(gt)
    inp = 64
    for b in D.yolo_batches_uint8(ds, batch_size=4, inp_dim=inp,
                                  canvas_size=96, max_boxes=8):
        assert b["images"].dtype == np.uint8
        assert b["images"].shape[1:] == (96, 96, 3)
        assert b["sizes"].shape == (4, 2)
        # device resize runs (shape + finiteness; pixel parity vs torch
        # is covered in test_kernels)
        imgs = resize_normalize_from_canvas(
            jnp.asarray(b["images"]), jnp.asarray(b["sizes"]), inp)
        assert imgs.shape == (4, inp, inp, 3)
        assert bool(jnp.isfinite(imgs.astype(jnp.float32)).all())
        boxes_rel = b["gt_boxes"]
        cx, cy, w, h = [boxes_rel[..., i] for i in range(4)]
        xyxy = np.stack([(cx - w / 2) * inp, (cy - h / 2) * inp,
                         (cx + w / 2) * inp, (cy + h / 2) * inp], -1)
        scores = np.where(b["gt_valid"], 1.0, 0.0)
        keep = b["image_ids"] >= 0
        ev.update(b["image_ids"][keep], xyxy[keep], scores[keep],
                  b["gt_labels"][keep], b["gt_valid"][keep],
                  b["scale_factors"][keep])
    stats = ev.summarize()
    assert stats[0] == pytest.approx(1.0, abs=1e-6)
