"""Exactness bound of the pre-NMS candidate caps (VERDICT r3 item 6).

``RetinaNetConfig.pre_nms_candidates`` / ``RoIHeadsConfig.
pre_nms_candidates`` keep only the top-K (box, class) pairs before NMS.
The documented bound (stated in both configs):

* greedy NMS keeps boxes in score order and a lower-scored box never
  suppresses a higher-scored one, so the kept set RESTRICTED TO the
  top-K prefix is identical with or without the tail;
* therefore the capped result is EXACT whenever >= detections_per_img
  survivors land inside the prefix;
* under starvation (< detections_per_img survivors in the prefix while
  more candidates existed above the score threshold) the degradation is
  one-sided: every capped detection also appears, with the same score
  rank, in the uncapped result — the cap can only TRUNCATE the tail of
  the detection list, never invent or reorder detections.

These tests construct both regimes explicitly for RetinaNet's
postprocess (`tvision/retinanet.py:458-470` parity path) and RoIHeads'
(`tvision/roi_heads.py:757-771`).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from object_detectors_tpu.models import retinanet as R
from object_detectors_tpu.models import roi_heads as RH


def _disjoint_boxes(n, size=8.0, per_row=16):
    """n pairwise-disjoint axis-aligned boxes on a grid."""
    idx = np.arange(n)
    x = (idx % per_row) * (size + 4)
    y = (idx // per_row) * (size + 4)
    return np.stack([x, y, x + size, y + size], -1).astype(np.float32)


def _sorted_valid(boxes, scores, labels, valid):
    """(score-desc sorted [k, 6] array of the valid detections)."""
    b = np.asarray(boxes)[np.asarray(valid)]
    s = np.asarray(scores)[np.asarray(valid)]
    l = np.asarray(labels)[np.asarray(valid)]
    order = np.argsort(-s, kind="stable")
    return np.concatenate([b[order], s[order, None],
                           l[order, None].astype(np.float32)], -1)


class TestRetinaNetCap:
    A, K = 64, 2
    IMAGE = (512, 512)

    def _run(self, anchors, logits, cap, det_per_img=5):
        cfg = R.RetinaNetConfig(
            num_classes=self.K, topk_candidates=self.A * self.K,
            detections_per_img=det_per_img, pre_nms_candidates=cap)
        cls = jnp.asarray(logits)[None]                 # [1, A, K]
        reg = jnp.zeros((1, self.A, 4), jnp.float32)    # decode -> anchors
        return R.retinanet_postprocess(
            cls, reg, jnp.asarray(anchors), (self.A,), self.IMAGE, cfg)

    def _make(self, n_cluster):
        """First n_cluster anchors identical (one NMS survivor), the rest
        disjoint; scores strictly descending cluster-first, all above
        the 0.05 score threshold, all class 1."""
        anchors = _disjoint_boxes(self.A)
        anchors[:n_cluster] = [0.0, 0.0, 10.0, 10.0]
        logits = np.full((self.A, self.K), -10.0, np.float32)
        logits[:, 1] = np.linspace(5.0, 2.0, self.A)    # descending
        return anchors, logits

    def test_cap_exact_when_prefix_has_enough_survivors(self):
        # all candidates disjoint -> every prefix member survives NMS:
        # cap=16 >= detections_per_img=5 survivors -> exact vs uncapped
        anchors, logits = self._make(n_cluster=0)
        capped = self._run(anchors, logits, cap=16)
        uncapped = self._run(anchors, logits, cap=0)
        np.testing.assert_allclose(
            _sorted_valid(*[x[0] for x in capped]),
            _sorted_valid(*[x[0] for x in uncapped]), rtol=1e-6)
        assert int(np.sum(np.asarray(capped[3]))) == 5

    def test_starvation_truncates_never_invents(self):
        # top-10 candidates are one identical cluster (1 survivor); the
        # cap=10 prefix therefore starves (< 5 survivors) while 54
        # disjoint above-threshold candidates sit below the prefix.
        anchors, logits = self._make(n_cluster=10)
        capped = self._run(anchors, logits, cap=10)
        uncapped = self._run(anchors, logits, cap=0)
        got = _sorted_valid(*[x[0] for x in capped])
        want = _sorted_valid(*[x[0] for x in uncapped])
        assert want.shape[0] == 5          # uncapped fills all 5 slots
        assert got.shape[0] == 1           # starved: only the cluster top
        # one-sided degradation: capped result is a PREFIX of uncapped
        np.testing.assert_allclose(got, want[: got.shape[0]], rtol=1e-6)


class TestRoIHeadsCap:
    P, C = 64, 3  # proposals, classes incl. background

    def _run(self, proposals, logits, cap, det_per_img=5):
        cfg = RH.RoIHeadsConfig(
            num_classes=self.C, detections_per_img=det_per_img,
            pre_nms_candidates=cap if cap else self.P * (self.C - 1))
        cls = jnp.asarray(logits)[None]                  # [1, P, C]
        reg = jnp.zeros((1, self.P, self.C * 4), jnp.float32)
        pv = jnp.ones((1, self.P), bool)
        return RH.postprocess_detections(
            cls, reg, jnp.asarray(proposals)[None], pv, (512, 512), cfg)

    def _make(self, n_cluster):
        props = _disjoint_boxes(self.P)
        props[:n_cluster] = [0.0, 0.0, 10.0, 10.0]
        logits = np.zeros((self.P, self.C), np.float32)
        logits[:, 1] = np.linspace(8.0, 5.0, self.P)  # softmax ~> 0.95
        return props, logits

    def test_cap_exact_when_prefix_has_enough_survivors(self):
        props, logits = self._make(n_cluster=0)
        capped = self._run(props, logits, cap=16)
        uncapped = self._run(props, logits, cap=0)
        np.testing.assert_allclose(
            _sorted_valid(*[x[0] for x in capped]),
            _sorted_valid(*[x[0] for x in uncapped]), rtol=1e-6)
        assert int(np.sum(np.asarray(capped[3]))) == 5

    def test_starvation_truncates_never_invents(self):
        props, logits = self._make(n_cluster=10)
        capped = self._run(props, logits, cap=10)
        uncapped = self._run(props, logits, cap=0)
        got = _sorted_valid(*[x[0] for x in capped])
        want = _sorted_valid(*[x[0] for x in uncapped])
        assert want.shape[0] == 5 and got.shape[0] == 1
        np.testing.assert_allclose(got, want[: got.shape[0]], rtol=1e-6)

    def test_production_cap_holds_at_coco_scale_shapes(self):
        # the production cap (1000) vs the flatten size at COCO scale
        # (1000 proposals x 90 classes): the prefix must cover
        # detections_per_img=100 -- sanity on the configured margin
        cfg = RH.RoIHeadsConfig()
        assert cfg.pre_nms_candidates >= 10 * cfg.detections_per_img
        rcfg = R.RetinaNetConfig()
        assert rcfg.pre_nms_candidates >= 6 * rcfg.detections_per_img
