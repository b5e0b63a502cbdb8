"""RoIAlign tests vs hand-computed bilinear values and an independent
numpy implementation of the torchvision sampling grid."""

import numpy as np
import jax.numpy as jnp

from object_detectors_tpu.ops import roi_align as RA


def np_roi_align(feat_hwc, boxes, output_size, spatial_scale, sampling_ratio):
    """Independent numpy transcription of torchvision roi_align
    (aligned=False)."""
    oh, ow = output_size
    s = sampling_ratio
    h, w, c = feat_hwc.shape
    out = np.zeros((len(boxes), oh, ow, c), np.float32)

    def bilinear(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c, np.float32)
        y = min(max(y, 0), h - 1)
        x = min(max(x, 0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, x - x0
        return ((1 - ly) * (1 - lx) * feat_hwc[y0, x0]
                + (1 - ly) * lx * feat_hwc[y0, x1]
                + ly * (1 - lx) * feat_hwc[y1, x0]
                + ly * lx * feat_hwc[y1, x1])

    for n, box in enumerate(boxes):
        x1, y1, x2, y2 = box * spatial_scale
        roi_w = max(x2 - x1, 1.0)
        roi_h = max(y2 - y1, 1.0)
        bin_w, bin_h = roi_w / ow, roi_h / oh
        for i in range(oh):
            for j in range(ow):
                acc = np.zeros(c, np.float32)
                for ky in range(s):
                    for kx in range(s):
                        y = y1 + (i + (ky + 0.5) / s) * bin_h
                        x = x1 + (j + (kx + 0.5) / s) * bin_w
                        acc += bilinear(y, x)
                out[n, i, j] = acc / (s * s)
    return out


def test_roi_align_matches_numpy():
    rng = np.random.RandomState(0)
    feat = rng.rand(16, 16, 3).astype(np.float32)
    boxes = np.array(
        [[0, 0, 8, 8], [2.5, 3.5, 12.0, 9.0], [10, 10, 30, 30]], np.float32)
    ref = np_roi_align(feat, boxes, (7, 7), 0.5, 2)
    got = np.asarray(RA.roi_align(
        jnp.asarray(feat), jnp.asarray(boxes), (7, 7), 0.5, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_roi_align_constant_feature():
    """Constant feature map -> every bin equals the constant."""
    feat = jnp.full((8, 8, 2), 3.5)
    boxes = jnp.array([[1.0, 1.0, 6.0, 6.0]])
    out = np.asarray(RA.roi_align(feat, boxes, (4, 4), 1.0, 2))
    np.testing.assert_allclose(out, 3.5, rtol=1e-5)


def test_assign_fpn_levels():
    # area 224^2 -> canonical level 4 -> index 2 (with min_level=2)
    boxes = jnp.array([
        [0, 0, 224, 224],
        [0, 0, 56, 56],     # sqrt area 56 -> k = 4 + log2(0.25) = 2 -> idx 0
        [0, 0, 448, 448],   # k = 5 -> idx 3
        [0, 0, 10000, 10000],  # clamps to top
    ], jnp.float32)
    lv = np.asarray(RA.assign_fpn_levels(boxes, num_levels=4))
    assert lv.tolist() == [2, 0, 3, 3]


def test_multiscale_selects_level():
    """Give each level a distinct constant; the pooled value identifies
    which level was used."""
    feats = [jnp.full((64, 64, 1), 1.0), jnp.full((32, 32, 1), 2.0),
             jnp.full((16, 16, 1), 3.0), jnp.full((8, 8, 1), 4.0)]
    image_size = (256, 256)
    boxes = jnp.array([
        [0, 0, 30, 30],     # sqrt area 30 -> k=1 -> clamped level 0
        [10, 10, 122, 122],  # sqrt area 112 -> k=3 -> level 1
        [0, 0, 250, 250],   # sqrt area 250 -> k=4 -> level 2
    ], jnp.float32)
    out = np.asarray(RA.multiscale_roi_align(feats, boxes, image_size,
                                             (2, 2)))
    np.testing.assert_allclose(out[0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[1], 2.0, rtol=1e-5)
    np.testing.assert_allclose(out[2], 3.0, rtol=1e-5)


def test_flat_multiscale_matches_per_level():
    """multiscale_roi_align_flat (single flattened-pyramid gather) is
    exactly the per-level compute+select implementation."""
    rng = np.random.RandomState(3)
    feats = [jnp.asarray(rng.rand(64 // k, 64 // k, 8).astype(np.float32))
             for k in (1, 2, 4, 8)]
    boxes = np.concatenate(
        [rng.rand(32, 2) * 200, rng.rand(32, 2) * 200 + 40], 1
    ).astype(np.float32)
    boxes[:, 2:] = np.maximum(boxes[:, 2:], boxes[:, :2] + 4)
    a = np.asarray(RA.multiscale_roi_align(
        feats, jnp.asarray(boxes), (256, 256), (7, 7)))
    b = np.asarray(RA.multiscale_roi_align_flat(
        feats, jnp.asarray(boxes), (256, 256), (7, 7)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_canvas_multiscale_matches_flat():
    """multiscale_roi_align_canvas (contiguous pair-slice gathers on one
    padded canvas — the production pooler) is numerically identical to
    the flat variant, including image-edge and degenerate boxes."""
    rng = np.random.RandomState(5)
    feats = [jnp.asarray(rng.rand(64 // k, 64 // k, 8).astype(np.float32))
             for k in (1, 2, 4, 8)]
    xy = rng.rand(64, 2) * 220
    wh = rng.rand(64, 2) * ((rng.rand(64, 1) > 0.5) * 200 + 10)
    boxes = np.clip(np.concatenate([xy, xy + wh], 1), 0,
                    256).astype(np.float32)
    boxes[:3] = [[0, 0, 256, 256], [255, 255, 256, 256], [0, 0, 1, 256]]
    a = np.asarray(RA.multiscale_roi_align_flat(
        feats, jnp.asarray(boxes), (256, 256), (7, 7)))
    b = np.asarray(RA.multiscale_roi_align_canvas(
        feats, jnp.asarray(boxes), (256, 256), (7, 7)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
