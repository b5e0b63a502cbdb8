"""Detection evaluator orchestration — the CocoEvaluator equivalent.

Parity with `torchvision_models/detection/coco_eval.py:20-211` and
`yolo/procedures/eval_results.py`:
* per-batch ``update`` converts padded device detections into COCO result
  dicts (xyxy -> xywh, rescale to original image size, optional label
  remap like COCO 80->91, `yolo/procedures/test_one_epoch.py:41-66`);
* multihost merge uses `multihost_utils.process_allgather` instead of the
  reference's pickle-tensor all_gather (`detection/utils.py:75-115`) or
  rank files on disk (`eval_results.py:12-31` — whose stale-file hazard,
  SURVEY.md §5.2, disappears entirely);
* ``summarize`` runs the hermetic numpy COCOeval and returns the 12
  stats; ``save_detections`` dumps the standard JSON.
"""

from __future__ import annotations

import json
import os
from typing import Callable

import numpy as np

from object_detectors_tpu.eval import coco_map


# COCO 80-class contiguous -> 91-id mapping (the reference ships this as
# coco_files/coco_80_91.json; derived from the standard category list).
COCO_80_TO_91 = [
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40,
    41, 42, 43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79,
    80, 81, 82, 84, 85, 86, 87, 88, 89, 90,
]


class DetectionEvaluator:
    def __init__(self, gt: dict,
                 label_map: Callable[[int], int] | None = None):
        """gt: COCO dict. label_map: contiguous model label -> dataset
        category id (e.g. ``lambda c: COCO_80_TO_91[c]`` for COCO-80
        models, ``lambda c: c + 1`` for LVIS 0-based)."""
        self.gt = gt
        self.label_map = label_map or (lambda c: c)
        self.results: list[dict] = []
        self._img_hw = {im["id"]: (im["height"], im["width"])
                        for im in gt["images"]}

    def update(self, image_ids, boxes, scores, labels, valid,
               scale_factors=None, masks=None, keypoints=None):
        """Add one batch of padded detections.

        image_ids: [B] ints; boxes [B, D, 4] xyxy in model input coords;
        scores/labels/valid [B, D]; scale_factors: optional [B, 2]
        (sx, sy) multipliers back to original image coordinates.
        masks: optional [B, D, m, m] probability maps (Mask R-CNN) —
        pasted into the ORIGINAL image canvas, thresholded at 0.5 and
        RLE-encoded like `detection/coco_eval.py:107-140` +
        `transform.py:228-240` (postprocess mask rescale).
        keypoints: optional [B, D, K, 3] (x, y, vis) in model input
        coords — rescaled and stored flattened
        (coco_eval.py:142-166 prepare_for_coco_keypoint).
        """
        boxes = np.asarray(boxes, np.float64)
        scores = np.asarray(scores, np.float64)
        labels = np.asarray(labels)
        valid = np.asarray(valid, bool)
        if masks is not None:
            from object_detectors_tpu.data import masks as mask_lib
            from object_detectors_tpu.eval import native

            masks = np.asarray(masks, np.float32)
        if keypoints is not None:
            keypoints = np.asarray(keypoints, np.float64)
        for b, img_id in enumerate(np.asarray(image_ids).tolist()):
            bx = boxes[b]
            sx = sy = 1.0
            if scale_factors is not None:
                sx, sy = np.asarray(scale_factors)[b]
                bx = bx * np.array([sx, sy, sx, sy])
            for d in range(bx.shape[0]):
                if not valid[b, d]:
                    continue
                x1, y1, x2, y2 = bx[d]
                res = {
                    "image_id": int(img_id),
                    "category_id": int(self.label_map(int(labels[b, d]))),
                    "bbox": [float(x1), float(y1),
                             float(x2 - x1), float(y2 - y1)],
                    "score": float(scores[b, d]),
                }
                if keypoints is not None:
                    kp = keypoints[b, d].copy()
                    kp[:, 0] *= sx
                    kp[:, 1] *= sy
                    res["keypoints"] = kp.reshape(-1).tolist()
                if masks is not None:
                    h0, w0 = self._img_hw[int(img_id)]
                    pasted = mask_lib.paste_mask(masks[b, d], bx[d],
                                                 h0, w0)
                    rle = native.rle_encode(
                        (pasted > 0.5).astype(np.uint8))
                    res["segmentation"] = rle
                    # segm area-range binning must use the MASK area
                    # (pycocotools loadRes: area = maskUtils.area(rle))
                    res["area"] = float(native.rle_area(rle))
                self.results.append(res)

    def synchronize_between_processes(self, _allgather=None):
        """Gather result lists from all hosts (SPMD multihost). No-op for
        a single process. ``_allgather`` is injectable so the pad-gather
        merge is unit-testable without a real multihost runtime."""
        if _allgather is None:
            import jax

            if jax.process_count() == 1:
                return
            from jax.experimental import multihost_utils

            _allgather = multihost_utils.process_allgather

        payload = json.dumps(self.results, default=_jsonable)
        arr = np.frombuffer(payload.encode(), dtype=np.uint8)
        # pad-gather: lengths first, then bytes
        n = np.array([arr.size], np.int32)
        all_n = _allgather(n)
        maxn = int(all_n.max())
        padded = np.zeros(maxn, np.uint8)
        padded[: arr.size] = arr
        gathered = _allgather(padded)
        merged = []
        for i, ln in enumerate(np.asarray(all_n).reshape(-1).tolist()):
            chunk = bytes(np.asarray(gathered)[i][:ln]).decode()
            merged.extend(json.loads(chunk))
        self.results = merged

    def summarize(self, iou_type: str = "bbox"):
        ev = coco_map.COCOEvalNP(self.gt, self.results, iou_type=iou_type)
        ev.evaluate_and_accumulate()
        return ev.summarize()

    def per_category_ap(self, iou_type: str = "bbox"):
        ev = coco_map.COCOEvalNP(self.gt, self.results, iou_type=iou_type)
        ev.evaluate_and_accumulate()
        return ev.per_category_ap()

    def save_detections(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.results, f, default=_jsonable)


def _jsonable(obj):
    """JSON fallback for numpy payloads (RLE counts arrays etc.)."""
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, np.generic):
        return obj.item()
    raise TypeError(f"not JSON serializable: {type(obj)}")
