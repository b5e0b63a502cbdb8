"""Cross-validation of the parity shim's torch kernels against our JAX
ops — the two implementations are written independently, so agreement
checks both (tvshim backs the reference-graph parity runs in
parity/run_parity.py; see PARITY.md 'Numerical parity')."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "parity")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import tvshim  # noqa: E402
from object_detectors_tpu.ops import nms as N  # noqa: E402
from object_detectors_tpu.ops import losses as L  # noqa: E402
from object_detectors_tpu.ops.roi_align import roi_align  # noqa: E402


def _random_boxes(rng, n, size=100.0):
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * size * 0.4 + 2
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def test_shim_nms_matches_jax_nms():
    rng = np.random.RandomState(0)
    boxes = _random_boxes(rng, 64)
    scores = rng.rand(64).astype(np.float32)
    keep_t = tvshim.nms(torch.from_numpy(boxes),
                        torch.from_numpy(scores), 0.5).numpy()
    ob, osc, _, oidx, ovalid = N.batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores),
        jnp.zeros(64, jnp.int32), 0.5, 64,
        jnp.ones(64, bool))
    kept_mine = np.asarray(oidx)[np.asarray(ovalid)]
    np.testing.assert_array_equal(np.sort(keep_t), np.sort(kept_mine))
    # survivor ORDER (score-desc) matches too
    np.testing.assert_array_equal(keep_t, kept_mine)


def test_shim_batched_nms_class_aware():
    rng = np.random.RandomState(1)
    boxes = _random_boxes(rng, 48)
    scores = rng.rand(48).astype(np.float32)
    idxs = rng.randint(0, 3, 48).astype(np.int64)
    keep_t = tvshim.batched_nms(torch.from_numpy(boxes),
                                torch.from_numpy(scores),
                                torch.from_numpy(idxs), 0.4).numpy()
    _, _, _, oidx, ovalid = N.batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores),
        jnp.asarray(idxs.astype(np.int32)), 0.4, 48,
        jnp.ones(48, bool))
    kept_mine = np.asarray(oidx)[np.asarray(ovalid)]
    np.testing.assert_array_equal(keep_t, kept_mine)


@pytest.mark.parametrize("sampling_ratio", [2, -1])
def test_shim_roi_align_matches_jax(sampling_ratio):
    rng = np.random.RandomState(2)
    feat = rng.randn(16, 16, 8).astype(np.float32)
    boxes = _random_boxes(rng, 5, size=14.0)
    out_j = roi_align(jnp.asarray(feat), jnp.asarray(boxes), (7, 7),
                      0.5, sampling_ratio if sampling_ratio > 0 else 2)
    rois = torch.cat([torch.zeros(5, 1), torch.from_numpy(boxes)], 1)
    out_t = tvshim.roi_align(
        torch.from_numpy(feat.transpose(2, 0, 1))[None], rois, (7, 7),
        0.5, sampling_ratio if sampling_ratio > 0 else 2)
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy().transpose(0, 2, 3, 1),
        rtol=1e-5, atol=1e-5)


def test_shim_focal_loss_matches_jax():
    rng = np.random.RandomState(3)
    logits = rng.randn(32, 5).astype(np.float32)
    targets = (rng.rand(32, 5) > 0.8).astype(np.float32)
    lt = tvshim.sigmoid_focal_loss(
        torch.from_numpy(logits), torch.from_numpy(targets)).numpy()
    lj = L.sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(np.asarray(lj), lt, rtol=1e-5, atol=1e-6)


def test_shim_frozen_bn_matches_flax_frozen_bn():
    from object_detectors_tpu.models.resnet import ResNet  # noqa: F401

    rng = np.random.RandomState(4)
    x = rng.randn(2, 6, 6, 8).astype(np.float32)
    fbn = tvshim.FrozenBatchNorm2d(8)
    fbn.weight.copy_(torch.from_numpy(rng.rand(8).astype(np.float32)))
    fbn.bias.copy_(torch.from_numpy(rng.rand(8).astype(np.float32)))
    fbn.running_mean.copy_(
        torch.from_numpy(rng.randn(8).astype(np.float32)))
    fbn.running_var.copy_(
        torch.from_numpy(rng.rand(8).astype(np.float32) + 0.5))
    with torch.no_grad():
        yt = fbn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    w = fbn.weight.numpy()
    b = fbn.bias.numpy()
    m = fbn.running_mean.numpy()
    v = fbn.running_var.numpy()
    yj = x * (w / np.sqrt(v + 0.0)) + (b - m * w / np.sqrt(v + 0.0))
    np.testing.assert_allclose(yt.transpose(0, 2, 3, 1), yj,
                               rtol=1e-4, atol=1e-5)
