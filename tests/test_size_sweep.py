"""Multi-size shape/anchor/decode consistency net (VERDICT r4 item 5).

The r4 RetinaNet ceil-grid anchor bug (`388ac1f`) was latent for three
rounds because everything tested at 640: `fpn_grid_sizes` floor-divided
while the conv chain ceil-halves, so anchor tables went short at sizes
like 320. This file sweeps the CLASS of bug — static anchor/grid
helpers vs the models' actual feature dims — across {160, 320, 512,
640, 800} for every anchor-based model family, using jax.eval_shape
(pure shape tracing, no FLOPs) so the sweep stays cheap on the 1-core
CPU rig.

Parity targets: torchvision AnchorGenerator grid consistency
(`torchvision_models/tvision/anchor_utils.py:98-142`) and
GeneralizedRCNNTransform size handling (`transform.py:150-173`);
SSD's DefaultBoxGenerator stays at its fixed 300 input (`ssd.py`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from object_detectors_tpu.models import anchors as A
from object_detectors_tpu.models import retinanet as R
from object_detectors_tpu.models import rpn as RPN
from object_detectors_tpu.models import faster_rcnn as F
from object_detectors_tpu.models import ssd as SSD
from object_detectors_tpu.models import yolo_criterion as YC
from object_detectors_tpu.models.yolo import YoloHead
from object_detectors_tpu.models.resnet import BackboneWithFPN, ResNet

SIZES = [160, 320, 512, 640, 800]


def _assert_eq(got, expect):
    assert got == expect, f"{got} != {expect}"


def _shape_init_apply(model, x, check=None):
    """(param shapes, output shapes) without running any compute.

    x (a ShapeDtypeStruct) must be an eval_shape ARGUMENT — a closure
    capture would reach the model as the raw struct, not a tracer.

    ``check(outs)``: optional assertion callback run INSIDE the traced
    apply, where static aux outputs (e.g. level_sizes, which are Python
    ints computed from tracer shapes) are still concrete — eval_shape
    wraps every returned leaf, ints included, into ShapeDtypeStructs."""
    params = jax.eval_shape(
        lambda k, xx: model.init(k, xx, train=False),
        jax.random.key(0), x)

    def apply(p, xx):
        outs = model.apply(p, xx, train=False)
        if check is not None:
            check(outs)
        return outs

    outs = jax.eval_shape(apply, params, x)
    return params, outs


@pytest.mark.parametrize("size", SIZES)
def test_retinanet_grids_match_features(size):
    """fpn_grid_sizes == the model's actual per-level dims, the anchor
    table covers exactly sum(level_sizes), and BOTH postprocess decode
    paths trace (the grids= path asserts level_sizes == grid products
    internally — the exact r4 failure)."""
    grids = A.fpn_grid_sizes((size, size))
    expect = tuple(gh * gw * 9 for gh, gw in grids)
    model = R.RetinaNet(num_classes=5, resnet_layers=(1, 1, 1, 1))
    x = jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32)
    _, (cls, reg, ls_structs) = _shape_init_apply(
        model, x, check=lambda o: _assert_eq(tuple(o[2]), expect))
    level_sizes = expect

    sizes_c, ars = A.retinanet_anchor_config()
    anchors = A.grid_anchors((size, size), grids, sizes_c, ars)
    assert anchors.shape[0] == sum(level_sizes) == cls.shape[1]

    cfg = R.RetinaNetConfig(num_classes=5)
    an = jax.ShapeDtypeStruct(anchors.shape, jnp.float32)
    cls32 = jax.ShapeDtypeStruct(cls.shape, jnp.float32)
    reg32 = jax.ShapeDtypeStruct(reg.shape, jnp.float32)
    for g in (None, tuple(grids)):
        out = jax.eval_shape(
            lambda c, rg, a, g=g: R.retinanet_postprocess(
                c, rg, a, tuple(level_sizes), (size, size), cfg,
                grids=g), cls32, reg32, an)
        assert out[0].shape == (1, cfg.detections_per_img, 4)


@pytest.mark.parametrize("size", SIZES)
def test_rpn_anchors_match_backbone_features(size):
    """Faster/Mask/Keypoint R-CNN RPN path: the anchor table built from
    the backbone's REAL feature dims covers every head output, and
    filter_proposals traces with those level sizes."""
    bb = BackboneWithFPN(ResNet((1, 1, 1, 1), "bottleneck", "frozen"),
                         out_channels=32, extra_blocks="pool",
                         returned_layers=(1, 2, 3, 4))
    x = jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32)
    params = jax.eval_shape(lambda k, xx: bb.init(k, xx, False),
                            jax.random.key(0), x)
    feats = jax.eval_shape(lambda p, xx: bb.apply(p, xx, False),
                           params, x)
    grid_sizes = tuple((f.shape[1], f.shape[2]) for f in feats)
    sizes_c, ars = A.rpn_anchor_config()
    anchors = A.grid_anchors((size, size), grid_sizes,
                             sizes_c[:len(grid_sizes)],
                             ars[:len(grid_sizes)])
    level_sizes = tuple(gh * gw * 3 for gh, gw in grid_sizes)
    assert anchors.shape[0] == sum(level_sizes)

    cfg = RPN.RPNConfig(pre_nms_top_n_test=32, post_nms_top_n_test=16)
    props = jax.ShapeDtypeStruct((1, anchors.shape[0], 4), jnp.float32)
    obj = jax.ShapeDtypeStruct((1, anchors.shape[0]), jnp.float32)
    pb, ps, pv = jax.eval_shape(
        lambda p, o: RPN.filter_proposals(
            p, o, level_sizes, (size, size), cfg, training=False),
        props, obj)
    assert pb.shape == (1, 16, 4)


@pytest.mark.parametrize("size", SIZES)
def test_faster_rcnn_full_traces(size):
    """The single-jit FasterRCNN graph (anchors from feature shapes,
    RPN filter, pooler level assignment, per-class NMS) shape-checks
    at every sweep size."""
    cfg = F.FasterRCNNConfig(num_classes=5)
    model = F.FasterRCNN(cfg, dtype=jnp.float32)
    x = jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32)
    params = jax.eval_shape(
        lambda k, xx: model.init({"params": k}, xx, train=False),
        jax.random.key(0), x)
    out = jax.eval_shape(
        lambda p, xx: model.apply(p, xx, train=False), params, x)
    assert out[0].shape == (1, cfg.roi.detections_per_img, 4)


@pytest.mark.parametrize("size", SIZES)
def test_yolo_priors_match_head(size):
    """YOLO decode priors cover exactly the head's three grids."""
    model = YoloHead(num_classes=5, dtype=jnp.float32)
    x = jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32)
    _, outs = _shape_init_apply(model, x)
    cfg = YC.YoloLossConfig(num_classes=5, img_size=size)
    priors, gw = YC.make_priors(cfg, tuple(o.shape[1] for o in outs))
    total = sum(o.shape[1] * o.shape[2] * 3 for o in outs)
    assert priors.shape[0] == total == gw.shape[0]


def test_ssd_default_boxes_match_features():
    """SSD300: default-box table covers exactly the head maps at the
    model's fixed 300 input (explicit reference scales — r3 parity
    fix)."""
    model = SSD.SSD300(cfg=SSD.SSDConfig(num_classes=5))
    x = jax.ShapeDtypeStruct((1, 300, 300, 3), jnp.float32)
    grid_sizes = [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    boxes = A.ssd_default_boxes((300, 300), grid_sizes)
    # level_sizes are static ints only INSIDE the trace (eval_shape
    # wraps returned leaves) — assert via the check callback
    _, outs = _shape_init_apply(
        model, x,
        check=lambda o: _assert_eq(sum(o[2]), boxes.shape[0]))
    assert outs[0].shape[1] == boxes.shape[0]
