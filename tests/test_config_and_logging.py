"""Config composition/override/interpolation + logging utilities +
checkpoint round-trip."""

import os

import numpy as np
import pytest

from object_detectors_tpu.utils import logging as L
from object_detectors_tpu.utils.config import load_config

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


def test_default_composition():
    cfg = load_config(CONFIG_DIR)
    assert cfg.dataset.dset_name == "coco"
    assert cfg.backbone.layers == [1, 2, 8, 8, 4]
    assert cfg.yolo.lambda_xy == 2.5
    # interpolation: yolo.img_size = ${dataset.inp_dim}
    assert cfg.yolo.img_size == 416
    assert cfg.yolo.classes == 80


def test_group_swap_and_override():
    cfg = load_config(CONFIG_DIR, ["dataset=lvis", "yolo.lambda_xy=0.411",
                                   "epochs=7"])
    assert cfg.dataset.dset_name == "lvis"
    assert cfg.dataset.num_classes == 1203
    assert cfg.yolo.classes == 1203  # interpolation follows the swap
    assert cfg.yolo.lambda_xy == 0.411
    assert cfg.epochs == 7


def test_nested_override_types():
    cfg = load_config(CONFIG_DIR, ["neck.spp=true",
                                   "multiscaler.bounds=[0.7,1.2]"])
    assert cfg.neck.spp is True
    assert cfg.multiscaler.bounds == [0.7, 1.2]


def test_output_dir_interpolation():
    cfg = load_config(CONFIG_DIR, ["experiment.name=exp42"])
    assert cfg.output_dir == "output/exp42"


def test_smoothed_value_and_metric_logger():
    v = L.SmoothedValue(window_size=3)
    for x in [1.0, 2.0, 3.0, 4.0]:
        v.update(x)
    assert v.value == 4.0
    assert v.avg == pytest.approx(3.0)
    assert v.global_avg == pytest.approx(2.5)
    ml = L.MetricLogger()
    ml.update(loss=1.5)
    assert "loss" in str(ml)
    out = list(ml.log_every(range(5), 2, "hdr", printer=lambda s: None))
    assert out == list(range(5))


def test_progress_csv(tmp_path):
    path = str(tmp_path / "progress.csv")
    L.write_progress_stats(path, 0, np.arange(6.0), np.arange(5.0), 0.5)
    L.write_progress_stats(path, 1, np.arange(6.0), np.arange(5.0), 0.6)
    lines = open(path).read().strip().split("\n")
    assert len(lines) == 3
    assert lines[0].startswith("epoch,")


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from object_detectors_tpu.models.yolo import YoloHead
    from object_detectors_tpu.train import checkpoint as C
    from object_detectors_tpu.train import optim as O
    from object_detectors_tpu.train import trainer as T

    model = YoloHead(num_classes=4, backbone_layers=(1, 1, 1, 1, 1))
    tx = O.make_optimizer(O.OptimizerConfig(), O.SchedulerConfig(), 10)
    state = T.create_yolo_train_state(model, tx, 64, jax.random.key(0))
    mgr = C.CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save("last", state, epoch=3, metrics={"metric": 0.42})

    state2 = T.create_yolo_train_state(model, tx, 64, jax.random.key(9))
    restored, epoch, metrics = mgr.restore("last", state2)
    assert epoch == 3
    assert metrics["metric"] == pytest.approx(0.42)
    l1 = jax.tree_util.tree_leaves(state.params)[0]
    l2 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_checkpoint_best_logic(tmp_path):
    import jax
    from object_detectors_tpu.models.yolo import YoloHead
    from object_detectors_tpu.train import checkpoint as C
    from object_detectors_tpu.train import optim as O
    from object_detectors_tpu.train import trainer as T

    model = YoloHead(num_classes=4, backbone_layers=(1, 1, 1, 1, 1))
    tx = O.make_optimizer(O.OptimizerConfig(), O.SchedulerConfig(), 10)
    state = T.create_yolo_train_state(model, tx, 64, jax.random.key(0))
    mgr = C.CheckpointManager(str(tmp_path / "ckpt"))
    best = mgr.save_epoch(state, 0, {"m": 0.3}, 0.3, -np.inf, "max")
    assert best == 0.3
    assert os.path.exists(str(tmp_path / "ckpt" / "best"))
    best = mgr.save_epoch(state, 1, {"m": 0.2}, 0.2, best, "max")
    assert best == 0.3  # no new best
