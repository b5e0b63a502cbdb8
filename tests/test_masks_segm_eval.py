"""Polygon rasterization + segm-mode COCO evaluation tests."""

import numpy as np
import pytest

from object_detectors_tpu.data import masks as M
from object_detectors_tpu.eval import coco_map as CM


def test_rasterize_rectangle():
    poly = np.array([[2, 3], [10, 3], [10, 8], [2, 8]], np.float64)
    mask = M.rasterize_polygon(poly, 12, 12)
    # interior filled
    assert mask[5, 5] == 1
    assert mask[4, 3] == 1
    # outside empty
    assert mask[1, 1] == 0
    assert mask[10, 11] == 0
    # area close to 8*5
    assert abs(int(mask.sum()) - 40) <= 8


def test_rasterize_triangle():
    poly = np.array([[0, 0], [10, 0], [0, 10]], np.float64)
    mask = M.rasterize_polygon(poly, 12, 12)
    assert mask[1, 1] == 1
    assert mask[9, 9] == 0
    assert 35 <= mask.sum() <= 60  # ~half of 100


def test_segmentation_to_mask_multi_polygon():
    segm = [[0, 0, 4, 0, 4, 4, 0, 4], [6, 6, 10, 6, 10, 10, 6, 10]]
    mask = M.segmentation_to_mask(segm, 12, 12)
    assert mask[2, 2] == 1 and mask[8, 8] == 1
    assert mask[5, 5] == 0


def test_filter_degenerate():
    boxes = np.array([[0, 0, 5, 5], [3, 3, 3, 8], [1, 1, 0, 0]],
                     np.float64)
    keep = M.filter_degenerate(boxes)
    assert keep.tolist() == [True, False, False]


def make_segm_gt():
    images = [{"id": 1, "width": 32, "height": 32}]
    annotations = [{
        "id": 1, "image_id": 1, "category_id": 1,
        "bbox": [4, 4, 10, 10], "area": 100, "iscrowd": 0,
        "segmentation": [[4, 4, 14, 4, 14, 14, 4, 14]],
    }]
    categories = [{"id": 1, "name": "a"}]
    return {"images": images, "annotations": annotations,
            "categories": categories}


def test_segm_eval_perfect():
    gt = make_segm_gt()
    dts = [{"image_id": 1, "category_id": 1, "bbox": [4, 4, 10, 10],
            "score": 0.9,
            "segmentation": [[4, 4, 14, 4, 14, 14, 4, 14]]}]
    ev = CM.COCOEvalNP(gt, dts, iou_type="segm")
    stats = ev.evaluate_and_accumulate().summarize()
    assert stats[0] == pytest.approx(1.0)


def test_segm_eval_mismatched_mask_low_ap():
    gt = make_segm_gt()
    # same box but a mask only covering ~25% of the GT mask
    dts = [{"image_id": 1, "category_id": 1, "bbox": [4, 4, 10, 10],
            "score": 0.9,
            "segmentation": [[4, 4, 9, 4, 9, 9, 4, 9]]}]
    ev = CM.COCOEvalNP(gt, dts, iou_type="segm")
    stats = ev.evaluate_and_accumulate().summarize()
    assert stats[0] == pytest.approx(0.0)  # IoU ~0.25 < 0.5


def test_masks_for_annotations():
    gt = make_segm_gt()
    masks = M.masks_for_annotations(gt["annotations"], 32, 32)
    assert masks.shape == (1, 32, 32)
    assert masks.sum() > 50


# ---------------- VERDICT r1 item 5: the closed segm eval loop -------- #

def test_paste_mask_fills_box():
    mask = np.ones((28, 28), np.float32)
    out = M.paste_mask(mask, np.array([4.0, 4.0, 14.0, 14.0]), 32, 32)
    assert out.shape == (32, 32)
    # interior of the box is on, far outside is off
    assert out[9, 9] > 0.5
    assert out[2, 2] == 0.0 and out[20, 20] == 0.0
    on = out > 0.5
    box_area = 11 * 11  # int-truncated box + TO_REMOVE convention
    assert abs(int(on.sum()) - box_area) <= 30


def test_evaluator_segm_roundtrip_scores_one():
    """GT-as-detections with full-box masks through
    DetectionEvaluator.update(masks=...) -> segm mAP 1.0."""
    from object_detectors_tpu.data import synthetic
    from object_detectors_tpu.eval import evaluator as eval_lib

    gt = synthetic.make_coco_dicts(np.random.RandomState(0), 4, 64, 3,
                                   with_segmentation=True)
    ev = eval_lib.DetectionEvaluator(gt, label_map=lambda c: c)
    for im in gt["images"]:
        anns = [a for a in gt["annotations"]
                if a["image_id"] == im["id"]]
        boxes = np.array([[a["bbox"][0], a["bbox"][1],
                           a["bbox"][0] + a["bbox"][2],
                           a["bbox"][1] + a["bbox"][3]] for a in anns])
        labels = np.array([a["category_id"] for a in anns])
        d = len(anns)
        ev.update(np.array([im["id"]]), boxes[None],
                  np.full((1, d), 0.9), labels[None],
                  np.ones((1, d), bool),
                  masks=np.ones((1, d, 28, 28), np.float32))
    bbox_stats = ev.summarize()
    segm_stats = ev.summarize("segm")
    assert bbox_stats[0] == pytest.approx(1.0)
    # paste of an all-ones mask reproduces the rectangular GT mask up to
    # the 1px padding/rounding band -> IoU > 0.75 everywhere
    assert segm_stats[1] == pytest.approx(1.0)  # AP@0.5
    assert segm_stats[0] > 0.5
    # results are JSON-serializable (RLE counts arrays)
    import json
    from object_detectors_tpu.eval.evaluator import _jsonable
    json.dumps(ev.results, default=_jsonable)
