"""Pallas kernel tests (interpret mode on CPU; real-TPU parity was
verified on-chip during development)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from object_detectors_tpu.kernels import preprocess as P
from object_detectors_tpu.kernels.nms_pallas import nms_pallas
from object_detectors_tpu.ops.nms import _select_max_nms


def test_preprocess_xla_matches_formula():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    out = np.asarray(P.preprocess_images_xla(jnp.asarray(imgs),
                                             jnp.float32))
    ref = (imgs / 255.0 - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_preprocess_dispatch_runs():
    imgs = jnp.zeros((1, 32, 32, 3), jnp.uint8)
    out = P.preprocess_images(imgs, jnp.float32)
    assert out.shape == (1, 32, 32, 3)
    # all-zero uint8 -> (-mean/std)
    np.testing.assert_allclose(
        np.asarray(out)[0, 0, 0], -np.array([0.485, 0.456, 0.406])
        / np.array([0.229, 0.224, 0.225]), rtol=1e-4)


@pytest.mark.parametrize("n,k", [(64, 16), (128, 100)])
def test_nms_pallas_interpret_parity(n, k):
    rng = np.random.RandomState(1)
    xy = rng.rand(n, 2).astype(np.float32) * 80
    wh = rng.rand(n, 2).astype(np.float32) * 30 + 2
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1))
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    ki_ref, v_ref = _select_max_nms(boxes, scores, 0.5, k)
    ki_p, v_p = nms_pallas(boxes, scores, 0.5, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_p))
    np.testing.assert_array_equal(
        np.asarray(ki_ref)[np.asarray(v_ref)],
        np.asarray(ki_p)[np.asarray(v_p)])


def test_nms_pallas_respects_valid_mask():
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10],
                         [30, 30, 40, 40]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    valid = jnp.asarray([False, True, True])
    ki, v = nms_pallas(boxes, scores, 0.5, 3, valid=valid,
                       interpret=True)
    kept = np.asarray(ki)[np.asarray(v)].tolist()
    assert kept == [1, 2]


def test_resize_normalize_images_matches_host_pipeline():
    """On-device fused resize+normalize == host cv2-style resize followed
    by normalize (within bilinear tolerance)."""
    import numpy as np
    import jax.numpy as jnp
    from object_detectors_tpu.kernels.preprocess import (
        resize_normalize_images)
    from object_detectors_tpu.data.transforms import (
        IMAGENET_MEAN, IMAGENET_STD)

    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 255, (2, 64, 48, 3), dtype=np.uint8)
    out = np.asarray(resize_normalize_images(
        jnp.asarray(u8), (32, 24), jnp.float32))
    assert out.shape == (2, 32, 24, 3)
    # reference path: jax.image.resize on floats then normalize
    import jax
    ref = np.asarray(jax.image.resize(
        jnp.asarray(u8, jnp.float32), (2, 32, 24, 3), "bilinear",
        antialias=False))  # cv2 INTER_LINEAR semantics: no antialias
    ref = (ref / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    assert np.isfinite(out).all()


def test_resize_normalize_from_canvas_matches_torch_bicubic():
    """Device ingest resize (VERDICT r2 item 6): per-image bicubic from
    native size inside a padded canvas must equal torch's bicubic resize
    (a=-0.75, the reference's cv2 INTER_CUBIC semantics) + normalize."""
    import torch
    import torch.nn.functional as F
    from object_detectors_tpu.data.transforms import (
        IMAGENET_MEAN, IMAGENET_STD,
    )
    from object_detectors_tpu.kernels.preprocess import (
        resize_normalize_from_canvas,
    )

    rng = np.random.RandomState(0)
    out_dim, cs = 32, 48
    sizes = [(48, 36), (20, 48), (7, 5)]
    canvas = np.zeros((len(sizes), cs, cs, 3), np.uint8)
    for i, (h, w) in enumerate(sizes):
        canvas[i, :h, :w] = rng.randint(0, 255, (h, w, 3), np.uint8)

    out = np.asarray(resize_normalize_from_canvas(
        jnp.asarray(canvas), jnp.asarray(sizes, jnp.int32), out_dim,
        jnp.float32))

    for i, (h, w) in enumerate(sizes):
        img = torch.from_numpy(
            canvas[i, :h, :w].astype(np.float32).transpose(2, 0, 1))
        ref = F.interpolate(img[None], size=(out_dim, out_dim),
                            mode="bicubic", align_corners=False)[0]
        ref = ref.numpy().transpose(1, 2, 0) / 255.0
        ref = (ref - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_allclose(out[i], ref, rtol=1e-4, atol=1e-4)
