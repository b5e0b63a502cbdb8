"""Deterministic trained-weight artifacts for the accuracy harnesses.

Round-2 verdict: every end-to-end accuracy artifact used *random*
weights (protocol CSV mAP 0.0, parity matched-tails unproven). The
environment has no pretrained checkpoints and zero egress, so the
hermetic fallback is to TRAIN on the renderable synthetic set (the r1
convergence recipe: tiny YOLO, 64 images, 60 epochs, mAP 0 -> ~0.1+)
and check the resulting weights in as msgpack artifacts consumed by:

* ``bench.py --protocol``  -> benchmark_res.csv with real non-zero mAP
  (the reference protocol scores mAP per batch size,
  yolo/benchmark.py:128-143);
* ``parity/run_parity.py`` -> trained-weight parity rows (separated
  scores instead of random-weight ties).

Usage:
  python -m object_detectors_tpu.analysis.make_artifacts [--yolo]
      [--frcnn] [--epochs N]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
ARTIFACTS = os.path.join(ROOT, "artifacts")

YOLO_OVERRIDES = [
    "dataset=synthetic", "backbone=tiny", "dataset.num_images=64",
    "dataset.tr_batch_size=8", "dataset.ts_batch_size=8",
    "epochs=60", "metric=mAP", "optimizer=adam", "optimizer.lr=1e-3",
    "scheduler=multistep", "scheduler.milestones=[40,52]",
    "experiment.name=artifact_yolo", "seed=0",
]


def train_yolo(epochs: int | None = None):
    import jax

    from object_detectors_tpu import main as pipeline
    from object_detectors_tpu.train import checkpoint as ckpt_lib
    from object_detectors_tpu.train import trainer
    from object_detectors_tpu.utils.config import load_config
    from flax import serialization

    overrides = list(YOLO_OVERRIDES)
    if epochs:
        overrides = [o for o in overrides if not o.startswith("epochs=")]
        overrides.append(f"epochs={epochs}")
    cfg = load_config(os.path.join(ROOT, "configs"), overrides)
    state, best = pipeline.train_pipeline(cfg)

    # restore the best checkpoint (train_pipeline returns the LAST state)
    out_dir = str(cfg.get_path("output_dir", "output/default"))
    ckpt = ckpt_lib.CheckpointManager(
        os.path.join(out_dir, str(cfg.experiment.cp)))
    restored = ckpt.restore("best", state)
    if restored:
        state = restored[0]

    os.makedirs(ARTIFACTS, exist_ok=True)
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    path = os.path.join(ARTIFACTS, "synthetic_yolo.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    meta = {
        "model": "yolo_tiny", "num_classes": 4, "img_size": 64,
        "backbone_layers": [1, 1, 1, 1, 1], "best_map": float(best),
        "overrides": overrides,
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"saved {path} (best mAP {best:.4f})")
    return best


def load_yolo_artifact():
    """-> (variables dict, meta) or (None, None) if absent/stale."""
    from flax import serialization

    path = os.path.join(ARTIFACTS, "synthetic_yolo.msgpack")
    if not (os.path.exists(path) and os.path.exists(path + ".json")):
        return None, None
    try:
        with open(path + ".json") as f:
            meta = json.load(f)
        import jax
        import jax.numpy as jnp

        from object_detectors_tpu.models.yolo import YoloHead

        model = YoloHead(num_classes=meta["num_classes"],
                         backbone_layers=tuple(meta["backbone_layers"]))
        x0 = jnp.zeros((1, meta["img_size"], meta["img_size"], 3))
        template = model.init(jax.random.key(0), x0, train=False)
        payload = {"params": template["params"],
                   "batch_stats": template.get("batch_stats", {})}
        with open(path, "rb") as f:
            restored = serialization.from_bytes(payload, f.read())
    except (KeyError, ValueError, OSError) as e:
        # stale/partial artifact (sidecar-msgpack mismatch): fall back
        # to the random-weight protocol branch instead of aborting
        print(f"load_yolo_artifact: stale artifact ignored ({e})")
        return None, None
    variables = {"params": restored["params"]}
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]
    return variables, meta


def train_frcnn(epochs: int = 40):
    """Small Faster R-CNN on the renderable synthetic set via the
    torchvision-style CLI; artifact consumed by parity/run_parity.py."""
    import jax

    from object_detectors_tpu import detection_main as DM
    from flax import serialization

    out = os.path.join(ROOT, "output", "artifact_frcnn")
    # FULL R50-FPN architecture (not --small): the parity harness runs
    # the reference's own fasterrcnn_resnet50_fpn graph, so the trained
    # weights must fit its layout (weights_io.flax_fasterrcnn_to_torch).
    ts = DM.main([
        "--dataset", "synthetic", "--model", "fasterrcnn_resnet50_fpn",
        "--renderable", "--epochs", str(epochs),
        "--batch-size", "4", "--image-size", "96", "--lr", "2e-3",
        "--lr-steps", str(int(epochs * 0.7)), str(int(epochs * 0.85)),
        "--output-dir", out, "--seed", "0",
    ])
    if ts is None:
        raise RuntimeError("frcnn artifact training aborted (NaN loss)")
    os.makedirs(ARTIFACTS, exist_ok=True)
    # the frozen-BN collection is deterministic from init (never
    # updated), so params alone reproduce the model with seed 0
    payload = {"params": jax.device_get(ts["params"])}
    path = os.path.join(ARTIFACTS, "synthetic_frcnn.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    with open(path + ".json", "w") as f:
        json.dump({"model": "fasterrcnn_resnet50_fpn", "num_classes": 5,
                   "image_size": 96, "epochs": epochs}, f, indent=1)
    print(f"saved {path}")


def train_maskrcnn(epochs: int = 24):
    """Mask R-CNN on the renderable synthetic set (rectangle masks =
    the box interiors, synthetic.make_coco_dicts with_segmentation);
    artifact consumed by run_parity.py maskrcnn_trained. Kept shorter
    than the FRCNN run: its mAP plateaued by ~epoch 20."""
    import jax

    from object_detectors_tpu import detection_main as DM
    from flax import serialization

    out = os.path.join(ROOT, "output", "artifact_maskrcnn")
    ts = DM.main([
        "--dataset", "synthetic", "--model", "maskrcnn_resnet50_fpn",
        "--renderable", "--epochs", str(epochs),
        "--batch-size", "4", "--image-size", "96", "--lr", "2e-3",
        "--lr-steps", str(int(epochs * 0.7)), str(int(epochs * 0.85)),
        "--output-dir", out, "--seed", "0",
    ])
    if ts is None:
        raise RuntimeError("maskrcnn artifact training aborted (NaN)")
    os.makedirs(ARTIFACTS, exist_ok=True)
    payload = {"params": jax.device_get(ts["params"])}
    path = os.path.join(ARTIFACTS, "synthetic_maskrcnn.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    with open(path + ".json", "w") as f:
        json.dump({"model": "maskrcnn_resnet50_fpn", "num_classes": 5,
                   "image_size": 96, "epochs": epochs}, f, indent=1)
    print(f"saved {path}")


def train_keypointrcnn(epochs: int = 24):
    """Keypoint R-CNN on the synthetic person-only set (coco_kp
    analogue: make_coco_dicts with_keypoints). Artifact for trained
    keypoint-branch parity."""
    import jax

    from object_detectors_tpu import detection_main as DM
    from flax import serialization

    out = os.path.join(ROOT, "output", "artifact_kprcnn")
    ts = DM.main([
        "--dataset", "synthetic", "--model", "keypointrcnn_resnet50_fpn",
        "--renderable", "--epochs", str(epochs),
        "--batch-size", "4", "--image-size", "96", "--lr", "2e-3",
        "--lr-steps", str(int(epochs * 0.7)), str(int(epochs * 0.85)),
        "--output-dir", out, "--seed", "0",
    ])
    if ts is None:
        raise RuntimeError("keypointrcnn artifact training aborted (NaN)")
    os.makedirs(ARTIFACTS, exist_ok=True)
    payload = {"params": jax.device_get(ts["params"])}
    path = os.path.join(ARTIFACTS, "synthetic_kprcnn.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    with open(path + ".json", "w") as f:
        json.dump({"model": "keypointrcnn_resnet50_fpn",
                   "num_classes": 2, "image_size": 96,
                   "epochs": epochs}, f, indent=1)
    print(f"saved {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--yolo", action="store_true")
    ap.add_argument("--frcnn", action="store_true")
    ap.add_argument("--maskrcnn", action="store_true")
    ap.add_argument("--kprcnn", action="store_true")
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()
    explicit = args.yolo or args.frcnn or args.maskrcnn or args.kprcnn
    if args.yolo or not explicit:
        train_yolo(args.epochs)
    if args.frcnn:
        train_frcnn(args.epochs or 40)
    if args.maskrcnn:
        train_maskrcnn(args.epochs or 24)
    if args.kprcnn:
        train_keypointrcnn(args.epochs or 24)


if __name__ == "__main__":
    main()
