"""Evaluation: hermetic COCO-style mAP (no pycocotools dependency),
evaluator orchestration with multihost gather, detection JSON dumps."""
