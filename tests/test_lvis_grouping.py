"""LVIS evaluator + aspect-ratio grouping tests."""

import numpy as np
import pytest

from object_detectors_tpu.data import grouping as G
from object_detectors_tpu.eval import lvis_map as L


def make_lvis_gt():
    images = [
        {"id": 1, "width": 100, "height": 100,
         "neg_category_ids": [2], "not_exhaustive_category_ids": []},
        {"id": 2, "width": 100, "height": 100,
         "neg_category_ids": [], "not_exhaustive_category_ids": [1]},
    ]
    annotations = [
        {"id": 1, "image_id": 1, "category_id": 1,
         "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0},
        {"id": 2, "image_id": 2, "category_id": 1,
         "bbox": [40, 40, 20, 20], "area": 400, "iscrowd": 0},
    ]
    categories = [{"id": 1, "name": "a", "image_count": 2},
                  {"id": 2, "name": "b", "image_count": 500},
                  {"id": 3, "name": "c", "image_count": 50}]
    return {"images": images, "annotations": annotations,
            "categories": categories}


def det(img, cat, box, score):
    return {"image_id": img, "category_id": cat, "bbox": list(box),
            "score": score}


def test_lvis_perfect_ap():
    gt = make_lvis_gt()
    dts = [det(1, 1, (10, 10, 20, 20), 0.9),
           det(2, 1, (40, 40, 20, 20), 0.9)]
    ev = L.LVISEvalNP(gt, dts).evaluate_and_accumulate()
    stats = ev.summarize()
    assert stats[0] == pytest.approx(1.0)
    # category 1 has image_count 2 -> rare group
    assert stats[6] == pytest.approx(1.0)   # APr
    assert stats[7] == -1.0                 # no common-cat results


def test_lvis_federated_fp_ignored():
    """A cat-3 FP on image 1: cat 3 is neither positive nor negative for
    that image -> the cell is not evaluated, so AP for cat 3 is
    unaffected (stays -1 / excluded)."""
    gt = make_lvis_gt()
    dts = [det(1, 1, (10, 10, 20, 20), 0.9),
           det(2, 1, (40, 40, 20, 20), 0.9),
           det(1, 3, (0, 0, 10, 10), 0.95)]
    stats = L.LVISEvalNP(gt, dts).evaluate_and_accumulate().summarize()
    assert stats[0] == pytest.approx(1.0)


def test_lvis_negative_image_fp_counts():
    """Cat 2 is explicitly negative on image 1 -> a cat-2 detection
    there is a real FP cell... with no GT anywhere cat 2 has npig=0 so
    AP stays excluded; but the mechanism must not crash."""
    gt = make_lvis_gt()
    dts = [det(1, 2, (0, 0, 10, 10), 0.9)]
    stats = L.LVISEvalNP(gt, dts).evaluate_and_accumulate().summarize()
    assert np.isfinite(stats[0]) or stats[0] == -1.0


def test_lvis_not_exhaustive_unmatched_ignored():
    """Image 2 is not exhaustive for cat 1: an extra unmatched cat-1
    detection there must NOT count as FP."""
    gt = make_lvis_gt()
    dts = [det(1, 1, (10, 10, 20, 20), 0.9),
           det(2, 1, (40, 40, 20, 20), 0.9),
           det(2, 1, (70, 70, 20, 20), 0.95)]  # unmatched, ne image
    stats = L.LVISEvalNP(gt, dts).evaluate_and_accumulate().summarize()
    assert stats[0] == pytest.approx(1.0)


def test_aspect_ratio_bins_and_groups():
    bins = G.aspect_ratio_bins(k=3)
    assert len(bins) == 7
    ars = [0.2, 0.9, 1.0, 1.4, 5.0]
    gids = G.group_ids(ars, bins)
    assert gids[0] == 0          # very tall -> first bin
    assert gids[-1] == len(bins)  # very wide -> last bin
    assert gids[1] != gids[3]


def test_grouped_batches_full_and_same_group():
    gid = np.array([0, 0, 0, 1, 1, 0, 1, 1, 1])
    batches = G.grouped_batch_indices(gid, 4, shuffle=False)
    for b in batches:
        assert len(b) == 4
        assert len({int(gid[i]) for i in b}) == 1
    # every item appears at least once
    seen = {i for b in batches for i in b}
    assert seen == set(range(9))
