"""Native C++ COCO-eval core tests: RLE ops vs numpy, matcher parity
with the Python path."""

import numpy as np
import pytest

from object_detectors_tpu.eval import coco_map as CM
from object_detectors_tpu.eval import native as N


pytestmark = pytest.mark.skipif(not N.available(),
                                reason="native lib unavailable")


def test_rle_roundtrip_random():
    rng = np.random.RandomState(0)
    for shape in [(16, 16), (37, 23), (1, 5), (64, 3)]:
        mask = (rng.rand(*shape) > 0.5).astype(np.uint8)
        rle = N.rle_encode(mask)
        np.testing.assert_array_equal(N.rle_decode(rle), mask)
        assert N.rle_area(rle) == mask.sum()


def test_rle_fortran_order_convention():
    # mask with a single pixel at (y=1, x=0) in a 3x2 mask:
    # F-order flat index = x*h + y = 1 -> counts [1, 1, 4]
    mask = np.zeros((3, 2), np.uint8)
    mask[1, 0] = 1
    rle = N.rle_encode(mask)
    np.testing.assert_array_equal(rle["counts"], [1, 1, 4])


def test_rle_iou_matches_dense():
    rng = np.random.RandomState(1)
    a = (rng.rand(20, 30) > 0.6).astype(np.uint8)
    b = (rng.rand(20, 30) > 0.6).astype(np.uint8)
    ra, rb = N.rle_encode(a), N.rle_encode(b)
    got = N.rle_iou(ra, rb)
    ref = (a & b).sum() / (a | b).sum()
    assert got == pytest.approx(ref, abs=1e-12)
    # crowd: union = area of b
    got_c = N.rle_iou(ra, rb, a_crowd=True)
    assert got_c == pytest.approx((a & b).sum() / b.sum(), abs=1e-12)


def test_native_matcher_matches_python():
    rng = np.random.RandomState(2)
    from object_detectors_tpu.data import synthetic

    gt = synthetic.make_coco_dicts(rng, num_images=20, num_classes=5)
    dts = []
    for a in gt["annotations"]:
        b = list(a["bbox"])
        b[0] += rng.randn() * 3
        dts.append({"image_id": a["image_id"],
                    "category_id": a["category_id"],
                    "bbox": b, "score": float(rng.rand())})
    s_native = CM.evaluate_detections(gt, dts)
    # force python path
    lib, tried = N._lib, N._tried
    N._lib, N._tried = None, True
    try:
        s_python = CM.evaluate_detections(gt, dts)
    finally:
        N._lib, N._tried = lib, tried
    np.testing.assert_allclose(s_native, s_python, atol=1e-12)
