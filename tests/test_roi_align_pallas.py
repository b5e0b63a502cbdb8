"""Pallas RoIAlign kernel vs the XLA reference pooler (interpret mode).

The kernel itself is exercised on CPU via pallas interpret; the real
Mosaic compile is covered by analysis/roialign_bench.py on the chip.
"""

import numpy as np
import jax
import jax.numpy as jnp

from object_detectors_tpu.kernels.roi_align_pallas import (
    multiscale_roi_align_hybrid, multiscale_roi_align_pallas,
)
from object_detectors_tpu.ops.roi_align import multiscale_roi_align_flat


def _setup(seed=0, b=2, n=40, size=256, c=8):
    rng = np.random.RandomState(seed)
    feats = tuple(
        jnp.asarray(rng.randn(b, size // s, size // s, c)
                    .astype(np.float32))
        for s in (4, 8, 16, 32))
    xy = rng.rand(b, n, 2) * (size - 30)
    wh = rng.rand(b, n, 2) * ((rng.rand(b, n, 1) > 0.5) * 200 + 8)
    boxes = np.clip(np.concatenate([xy, xy + wh], -1), 0,
                    size).astype(np.float32)
    return feats, boxes


def test_pallas_pooler_matches_reference_in_window():
    """Non-overflow RoIs must match the XLA pooler exactly."""
    feats, boxes = _setup()
    # keep aspect mild so every RoI fits the 32-cell window
    boxes[..., 2] = np.minimum(boxes[..., 2], boxes[..., 0] + 100)
    boxes[..., 3] = np.minimum(boxes[..., 3], boxes[..., 1] + 100)
    bj = jnp.asarray(boxes)
    ref = jax.vmap(lambda f, bx: multiscale_roi_align_flat(
        f, bx, (256, 256), (7, 7)))(feats, bj)
    out = multiscale_roi_align_pallas(feats, bj, (256, 256), (7, 7),
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


def test_hybrid_pooler_exact_with_extreme_aspects():
    """Window-overflow (extreme aspect) RoIs are repooled exactly by the
    hybrid's gather fix-up."""
    feats, boxes = _setup(seed=3)
    boxes[0, :4] = [[0, 0, 256, 256], [250, 250, 256, 256],
                    [0, 0, 256, 6], [3, 0, 9, 256]]
    bj = jnp.asarray(boxes)
    ref = jax.vmap(lambda f, bx: multiscale_roi_align_flat(
        f, bx, (256, 256), (7, 7)))(feats, bj)
    out = multiscale_roi_align_hybrid(feats, bj, (256, 256), (7, 7),
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


def test_pallas_pooler_is_differentiable_via_canvas_vjp():
    """ADVICE r2 (high): R-CNN training differentiates through the
    pooler; the Pallas path must carry a custom VJP (canvas backward)
    instead of raising NotImplementedError."""
    from object_detectors_tpu.ops.roi_align import (
        _pool_pallas, _pool_canvas_batched,
    )

    feats, boxes = _setup(seed=7, b=1, n=8, size=64, c=4)
    bj = jnp.asarray(boxes)

    def loss_pallas(fs):
        out = _pool_pallas(fs, bj, (64, 64), (7, 7), 2, True)
        return jnp.sum(out * out)

    def loss_canvas(fs):
        out = _pool_canvas_batched(fs, bj, (64, 64), (7, 7), 2)
        return jnp.sum(out * out)

    g_p = jax.grad(loss_pallas)(feats)
    g_c = jax.grad(loss_canvas)(feats)
    for a, b in zip(g_p, g_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
