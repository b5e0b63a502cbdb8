"""Analysis tooling tests: per-category comparison, McNemar, k-means
anchors, telemetry maps, Grad-CAM, sweep candidate generation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from object_detectors_tpu.analysis import compare as C
from object_detectors_tpu.analysis import telemetry as TEL
from object_detectors_tpu.data import synthetic


def det(img, cat, box, score):
    return {"image_id": img, "category_id": cat, "bbox": list(box),
            "score": score}


@pytest.fixture(scope="module")
def gt():
    rng = np.random.RandomState(0)
    return synthetic.make_coco_dicts(rng, num_images=6, num_classes=3)


def test_per_category_table(gt):
    perfect = [det(a["image_id"], a["category_id"], a["bbox"], 0.9)
               for a in gt["annotations"]]
    rows = C.per_category_table(gt, {"perfect": perfect, "empty": []})
    assert all(r["perfect"] == pytest.approx(1.0) for r in rows
               if r["instances"] > 0)
    assert all(r["empty"] == pytest.approx(0.0) for r in rows
               if r["instances"] > 0)
    # sorted by instance count descending
    counts = [r["instances"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_mcnemar_identical_models(gt):
    dts = [det(a["image_id"], a["category_id"], a["bbox"], 0.9)
           for a in gt["annotations"]]
    out = C.mcnemar_disagreement(gt, dts, dts)
    assert out["pvalue"] == pytest.approx(1.0)
    assert out["table"][0][1] == 0 and out["table"][1][0] == 0
    assert out["recall_a"] == pytest.approx(1.0)


def test_mcnemar_disjoint_models(gt):
    anns = gt["annotations"]
    half = len(anns) // 2
    dts_a = [det(a["image_id"], a["category_id"], a["bbox"], 0.9)
             for a in anns[:half]]
    dts_b = [det(a["image_id"], a["category_id"], a["bbox"], 0.9)
             for a in anns[half:]]
    out = C.mcnemar_disagreement(gt, dts_a, dts_b)
    assert out["table"][0][0] == 0  # no shared hits
    assert out["table"][0][1] == half
    assert 0 <= out["pvalue"] <= 1


def test_kmeans_anchors(gt):
    anchors = C.kmeans_anchors(gt, num_anchors=9, img_size=416, seed=0)
    assert len(anchors) == 3 and all(len(s) == 3 for s in anchors)
    flat = [a for s in anchors for a in s]
    areas = [a[0] * a[1] for a in flat]
    assert areas == sorted(areas, reverse=True)
    assert all(0 < a[0] <= 416 and 0 < a[1] <= 416 for a in flat)


def test_telemetry_denormalize_roundtrip():
    from object_detectors_tpu.data import transforms as T

    img = np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    norm, _ = T.resize_to_tensor(img, np.zeros((0, 4)), 32)
    back = TEL.denormalize_image(norm)
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 3


def test_telemetry_heatmaps():
    # decoded [P, 5+C] with P = (2^2 + 4^2) * 3 priors
    grid_sizes = (2, 4)
    p = (4 + 16) * 3
    decoded = np.zeros((p, 5 + 3), np.float32)
    decoded[0, 4] = 0.9  # conf at scale-0 cell (0,0)
    maps = TEL.attribute_heatmap(decoded, 4, grid_sizes)
    assert maps[0].shape == (2, 2) and maps[1].shape == (4, 4)
    assert maps[0][0, 0] == pytest.approx(0.9)
    cls_maps = TEL.class_heatmap(decoded, 1, grid_sizes)
    assert cls_maps[0].shape == (2, 2)


def test_telemetry_iou_and_performance_maps():
    grid_sizes = (2,)
    p = 4 * 3
    decoded = np.zeros((p, 5 + 3), np.float32)
    decoded[:3, :4] = [16, 16, 32, 32]  # cell(0,0) anchors on the GT
    decoded[:3, 4] = 1.0
    decoded[:3, 5] = 9.0  # class 0 logit-ish (argmax -> 0)
    gt_boxes = np.array([[16, 16, 32, 32]], np.float32)
    maps = TEL.iou_heatmap(decoded, gt_boxes, grid_sizes)
    assert maps[0][0, 0] == pytest.approx(1.0, abs=1e-5)
    perf = TEL.performance_heatmap(decoded, gt_boxes, np.array([0]),
                                   grid_sizes)
    assert perf[0][0, 0] == pytest.approx(1.0, abs=1e-5)
    perf_wrong = TEL.performance_heatmap(decoded, gt_boxes, np.array([2]),
                                         grid_sizes)
    assert perf_wrong[0][0, 0] == 0.0


def test_draw_boxes_runs():
    img = np.zeros((64, 64, 3), np.uint8)
    out = TEL.draw_boxes(img, [[8, 8, 30, 30]], labels=[1], scores=[0.7])
    assert out.shape == img.shape
    assert out.sum() > 0  # something was drawn


def test_gradcam_shapes():
    from object_detectors_tpu.analysis.gradcam import yolo_gradcam
    from object_detectors_tpu.models.yolo import YoloHead

    model = YoloHead(num_classes=4, backbone_layers=(1, 1, 1, 1, 1))
    x = jnp.ones((1, 64, 64, 3)) * 0.4
    variables = model.init(jax.random.key(0), x, train=False)
    cam = yolo_gradcam(model, variables, x, class_id=2)
    assert cam.shape == (2, 2)  # C5 at stride 32
    assert np.isfinite(cam).all()
    assert cam.min() >= 0.0 and cam.max() <= 1.0


def test_sweep_candidates_and_perturb():
    from object_detectors_tpu import sweep as S

    space = {"params": {
        "yolo.lambda_xy": {"type": "range", "bounds": [0.1, 5.0]},
        "yolo.iou_type": {"type": "choice", "values": [0, 1, 2, 3]},
    }}
    cands = S.sobol_candidates(space, 8, seed=0)
    assert len(cands) == 8
    for c in cands:
        assert 0.1 <= c["yolo.lambda_xy"] <= 5.0
        assert c["yolo.iou_type"] in (0, 1, 2, 3)
    rng = np.random.RandomState(0)
    p = S.perturb(cands[0], space, rng)
    assert 0.1 <= p["yolo.lambda_xy"] <= 5.0


def test_sweep_loop_with_fake_objective(tmp_path):
    from object_detectors_tpu import sweep as S

    calls = []

    def fake_objective(cfg):
        v = float(cfg.yolo.lambda_xy)
        calls.append(v)
        return -(v - 2.0) ** 2  # max at lambda_xy = 2

    config_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    best_params, best_score, rows = S.run_sweep(
        config_dir, ["dataset=synthetic", "backbone=tiny"],
        max_trials=6, out_csv=str(tmp_path / "sweep.csv"),
        objective=fake_objective)
    assert len(rows) == 6
    assert best_score == max(r["score"] for r in rows)
    assert (tmp_path / "sweep.csv").exists()


def test_gp_proposer_beats_sobol_on_toy_objective(tmp_path):
    """VERDICT r2 item 9: model-based proposer (GP-EI, the Ax loop of
    yolo/test.py) must beat plain Sobol at equal trial count on a toy
    objective over the real opt1 space."""
    from object_detectors_tpu import sweep as S

    config_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")

    target = {"yolo.lambda_xy": 1.7, "yolo.lambda_iou": 3.3,
              "yolo.gamma": 1.1}

    def objective(cfg):
        return -sum((float(getattr(cfg.yolo, k.split(".")[1])) - v) ** 2
                    for k, v in target.items())

    gp, sobol = [], []
    for seed in (0, 1):
        common = dict(max_trials=18, out_csv=None, objective=objective,
                      seed=seed)
        _, best_gp, _ = S.run_sweep(
            config_dir, ["dataset=synthetic", "backbone=tiny"],
            proposer="gp", **common)
        _, best_sobol, _ = S.run_sweep(
            config_dir, ["dataset=synthetic", "backbone=tiny"],
            proposer="sobol", **common)
        gp.append(best_gp)
        sobol.append(best_sobol)
    assert np.isfinite(gp).all()
    assert np.mean(gp) > np.mean(sobol)


def test_gp_propose_unit():
    from object_detectors_tpu import sweep as S

    space = {"params": {
        "a": {"type": "range", "bounds": [0.0, 1.0]},
        "c": {"type": "choice", "values": [0, 1, 2]},
    }}
    rng = np.random.RandomState(0)
    hist = [{"params": {"a": x, "c": 0}, "score": -(x - 0.6) ** 2}
            for x in (0.0, 0.25, 0.5, 0.9)]
    hist.append({"params": {"a": 0.1, "c": 1}, "score": -1e7})  # failed
    cand = S.gp_propose(hist, space, rng)
    assert cand is not None
    assert 0.0 <= cand["a"] <= 1.0 and cand["c"] in (0, 1, 2)


import os  # noqa: E402
