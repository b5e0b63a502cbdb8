"""Unit tests for main.py's config builders (tfidf wiring, loss config,
label maps) — the yolo_forw.py:50-77 semantics."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from object_detectors_tpu import main as M
from object_detectors_tpu.data import synthetic
from object_detectors_tpu.utils.config import load_config

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


@pytest.fixture(scope="module")
def gt():
    rng = np.random.RandomState(0)
    return synthetic.make_coco_dicts(rng, 20, 96, 4)


def _cfg(overrides):
    return load_config(CONFIG_DIR, ["dataset=synthetic"] + overrides)


def test_tfidf_off(gt):
    cfg = _cfg(["yolo.tfidf=[0,0]"])
    w, il, rare = M.build_tfidf(cfg, gt)
    assert w is None and il == 1.0 and rare is None


def test_tfidf_logit_scaling(gt):
    cfg = _cfg(["yolo.tfidf=[0,1]"])
    w, il, _ = M.build_tfidf(cfg, gt)
    assert w is None
    assert il.shape == (4,)
    assert np.isfinite(np.asarray(il)).all()


def test_tfidf_class_weights_and_norm(gt):
    cfg = _cfg(["yolo.tfidf=[1,0]", "yolo.tfidf_norm=2"])
    w, il, _ = M.build_tfidf(cfg, gt)
    assert w.shape == (4,)
    np.testing.assert_allclose(float(jnp.linalg.norm(w)), 1.0, rtol=1e-5)


def test_tfidf_effective_number(gt):
    cfg = _cfg(["yolo.tfidf=[2,0]"])
    w, _, _ = M.build_tfidf(cfg, gt)
    np.testing.assert_allclose(float(jnp.sum(w)), 4.0, rtol=1e-4)


def test_eq_rare_mask_built_for_class_loss_2(gt):
    cfg = _cfg(["yolo.class_loss=2"])
    _, _, rare = M.build_tfidf(cfg, gt)
    assert rare is not None and rare.shape == (4,)


def test_loss_config_mapping():
    cfg = _cfg(["yolo.iou_type=3", "yolo.lambda_xy=0.411"])
    lc = M.build_loss_config(cfg)
    assert lc.iou_type == 3
    assert lc.lambda_xy == pytest.approx(0.411)
    assert lc.num_classes == 4
    assert lc.img_size == 64  # synthetic inp_dim


def test_label_maps():
    coco_cfg = load_config(CONFIG_DIR, [])
    lm = M.label_map_for(coco_cfg)
    assert lm(0) == 1 and lm(79) == 90  # 80-class -> 91 ids
    syn = _cfg([])
    lm2 = M.label_map_for(syn)
    assert lm2(0) == 1  # contiguous -> 1-based
