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


def test_mm2_fold_matches_rows_fold():
    """The two-matmul compute (fold='mm2') must equal the per-row fold
    and the XLA reference on in-window RoIs."""
    feats, boxes = _setup(seed=5)
    boxes[..., 2] = np.minimum(boxes[..., 2], boxes[..., 0] + 100)
    boxes[..., 3] = np.minimum(boxes[..., 3], boxes[..., 1] + 100)
    bj = jnp.asarray(boxes)
    ref = jax.vmap(lambda f, bx: multiscale_roi_align_flat(
        f, bx, (256, 256), (7, 7)))(feats, bj)
    out = multiscale_roi_align_pallas(feats, bj, (256, 256), (7, 7),
                                      interpret=True, fold="mm2")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


def test_tiled_pooler_matches_reference():
    """Tile-sorted pooler must match the XLA pooler exactly on every
    RoI the window tiers cover (incl. tall/wide aspect extremes)."""
    from object_detectors_tpu.kernels.roi_align_pallas import (
        multiscale_roi_align_tiled,
    )

    feats, boxes = _setup(seed=7)
    boxes[..., 2] = np.minimum(boxes[..., 2], boxes[..., 0] + 100)
    boxes[..., 3] = np.minimum(boxes[..., 3], boxes[..., 1] + 100)
    # a few aspect-extreme (tall/wide tier) RoIs
    boxes[0, :2] = [[5, 5, 40, 200], [10, 10, 200, 40]]
    bj = jnp.asarray(boxes)
    ref = jax.vmap(lambda f, bx: multiscale_roi_align_flat(
        f, bx, (256, 256), (7, 7)))(feats, bj)
    for fold in ("rows", "mm2"):
        out = multiscale_roi_align_tiled(
            feats, bj, (256, 256), (7, 7), interpret=True, fold=fold)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-4, atol=1e-5, err_msg=fold)


def test_hybrid_tiled_exact_with_extreme_aspects():
    """hybrid(mode='tiled') repools true-overflow RoIs exactly."""
    feats, boxes = _setup(seed=3)
    boxes[0, :4] = [[0, 0, 256, 256], [250, 250, 256, 256],
                    [0, 0, 256, 6], [3, 0, 9, 256]]
    bj = jnp.asarray(boxes)
    ref = jax.vmap(lambda f, bx: multiscale_roi_align_flat(
        f, bx, (256, 256), (7, 7)))(feats, bj)
    out = multiscale_roi_align_hybrid(feats, bj, (256, 256), (7, 7),
                                      interpret=True, mode="tiled")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


def test_tiled_pooler_single_tile_and_single_roi():
    """Degenerate tile bookkeeping: one RoI, and all RoIs in one tile."""
    from object_detectors_tpu.kernels.roi_align_pallas import (
        multiscale_roi_align_tiled,
    )

    rng = np.random.RandomState(11)
    feats = tuple(
        jnp.asarray(rng.randn(1, 256 // s, 256 // s, 8)
                    .astype(np.float32))
        for s in (4, 8, 16, 32))
    # single RoI
    b1 = jnp.asarray([[[10.0, 12.0, 60.0, 70.0]]])
    ref = jax.vmap(lambda f, bx: multiscale_roi_align_flat(
        f, bx, (256, 256), (7, 7)))(feats, b1)
    out = multiscale_roi_align_tiled(feats, b1, (256, 256), (7, 7),
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)
    # many RoIs, all in the same small neighborhood (one tile)
    base = np.tile(np.asarray([[20, 20, 70, 72.0]], np.float32), (16, 1))
    base += rng.rand(16, 4).astype(np.float32) * 3
    bm = jnp.asarray(base[None])
    ref = jax.vmap(lambda f, bx: multiscale_roi_align_flat(
        f, bx, (256, 256), (7, 7)))(feats, bm)
    out = multiscale_roi_align_tiled(feats, bm, (256, 256), (7, 7),
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


def test_tiled_pooler_14x14_output():
    """Mask-head pooling (14x14 output) through the tiled kernel."""
    from object_detectors_tpu.kernels.roi_align_pallas import (
        multiscale_roi_align_tiled,
    )

    feats, boxes = _setup(seed=9, n=12)
    boxes[..., 2] = np.minimum(boxes[..., 2], boxes[..., 0] + 100)
    boxes[..., 3] = np.minimum(boxes[..., 3], boxes[..., 1] + 100)
    bj = jnp.asarray(boxes)
    ref = jax.vmap(lambda f, bx: multiscale_roi_align_flat(
        f, bx, (256, 256), (14, 14)))(feats, bj)
    out = multiscale_roi_align_tiled(feats, bj, (256, 256), (14, 14),
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


def test_band_pooler_matches_reference():
    """Band-sorted pooler (full-width row bands, per-RoI column slices)
    must match the XLA pooler exactly on every covered RoI."""
    from object_detectors_tpu.kernels.roi_align_pallas import (
        multiscale_roi_align_bands,
    )

    feats, boxes = _setup(seed=13)
    boxes[..., 2] = np.minimum(boxes[..., 2], boxes[..., 0] + 100)
    boxes[..., 3] = np.minimum(boxes[..., 3], boxes[..., 1] + 100)
    # tall/wide tier RoIs (the tall tier uses the 16-row band stride)
    boxes[0, :2] = [[5, 5, 40, 200], [10, 10, 200, 40]]
    bj = jnp.asarray(boxes)
    ref = jax.vmap(lambda f, bx: multiscale_roi_align_flat(
        f, bx, (256, 256), (7, 7)))(feats, bj)
    out = multiscale_roi_align_bands(
        feats, bj, (256, 256), (7, 7), interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


def test_hybrid_bands_exact_with_extreme_aspects():
    """hybrid(mode='bands') repools true-overflow RoIs exactly."""
    feats, boxes = _setup(seed=5)
    boxes[0, :4] = [[0, 0, 256, 256], [250, 250, 256, 256],
                    [0, 0, 256, 6], [3, 0, 9, 256]]
    bj = jnp.asarray(boxes)
    ref = jax.vmap(lambda f, bx: multiscale_roi_align_flat(
        f, bx, (256, 256), (7, 7)))(feats, bj)
    out = multiscale_roi_align_hybrid(feats, bj, (256, 256), (7, 7),
                                      interpret=True, mode="bands")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


def test_band_pooler_single_roi_and_14x14():
    """Degenerate band bookkeeping + mask-head output size."""
    from object_detectors_tpu.kernels.roi_align_pallas import (
        multiscale_roi_align_bands,
    )

    rng = np.random.RandomState(21)
    feats = tuple(
        jnp.asarray(rng.randn(1, 256 // s, 256 // s, 8)
                    .astype(np.float32))
        for s in (4, 8, 16, 32))
    b1 = jnp.asarray([[[10.0, 12.0, 60.0, 70.0]]])
    ref = jax.vmap(lambda f, bx: multiscale_roi_align_flat(
        f, bx, (256, 256), (7, 7)))(feats, b1)
    out = multiscale_roi_align_bands(feats, b1, (256, 256), (7, 7),
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)

    feats2, boxes = _setup(seed=9, n=12)
    boxes[..., 2] = np.minimum(boxes[..., 2], boxes[..., 0] + 100)
    boxes[..., 3] = np.minimum(boxes[..., 3], boxes[..., 1] + 100)
    bj = jnp.asarray(boxes)
    ref = jax.vmap(lambda f, bx: multiscale_roi_align_flat(
        f, bx, (256, 256), (14, 14)))(feats2, bj)
    out = multiscale_roi_align_bands(feats2, bj, (256, 256), (14, 14),
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


def test_grouped_band_pooler_matches_reference():
    """Grouped band-sorted pooler (GROUP RoIs per grid step, band-run
    padding, mm2 window compute) must match the XLA pooler exactly on
    every covered RoI, including tall/wide tiers."""
    from object_detectors_tpu.kernels.roi_align_pallas import (
        multiscale_roi_align_bands_grouped,
    )

    feats, boxes = _setup(seed=17)
    boxes[..., 2] = np.minimum(boxes[..., 2], boxes[..., 0] + 100)
    boxes[..., 3] = np.minimum(boxes[..., 3], boxes[..., 1] + 100)
    boxes[0, :2] = [[5, 5, 40, 200], [10, 10, 200, 40]]
    bj = jnp.asarray(boxes)
    ref = jax.vmap(lambda f, bx: multiscale_roi_align_flat(
        f, bx, (256, 256), (7, 7)))(feats, bj)
    out = multiscale_roi_align_bands_grouped(
        feats, bj, (256, 256), (7, 7), interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)
    # fold="wide" (one [ow,tw]x[tw,oh*c] dot per RoI) is an exact
    # reformulation of the per-row fold
    wide = multiscale_roi_align_bands_grouped(
        feats, bj, (256, 256), (7, 7), interpret=True, fold="wide")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(wide),
                               rtol=1e-4, atol=1e-5)
    # xalign=16 (bf16-tile-aligned window reads, +8-wide tiers) reads a
    # wider window at a coarser-aligned origin — same samples, same
    # result
    a16 = multiscale_roi_align_bands_grouped(
        feats, bj, (256, 256), (7, 7), interpret=True, fold="rows",
        xalign=16)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(a16),
                               rtol=1e-4, atol=1e-5)
    # fold="pair" (one span-2 read per bilinear tap, weights routed by
    # scalar compares incl. every clamp case) is an exact
    # reformulation of the per-row fold
    pair = multiscale_roi_align_bands_grouped(
        feats, bj, (256, 256), (7, 7), interpret=True, fold="pair")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(pair),
                               rtol=1e-4, atol=1e-5)
    # sortlite prep (2-operand sort + row gather) must produce
    # byte-identical descriptors to the multi-operand sort
    from object_detectors_tpu.kernels.roi_align_pallas import (
        _prep_bands_grouped,
    )
    p0 = _prep_bands_grouped(feats, bj, (256, 256), 7, 7, 2)
    p1 = _prep_bands_grouped(feats, bj, (256, 256), 7, 7, 2, lite=True)
    for a, b, nm in zip(p0, p1, ("canvas", "gdesc", "rdesc", "geom",
                                 "dest_of_orig", "ovr")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=nm)


def test_hybrid_grouped_exact_with_extreme_aspects():
    """hybrid(mode='bands_grouped') repools true-overflow RoIs
    exactly."""
    feats, boxes = _setup(seed=7)
    boxes[0, :4] = [[0, 0, 256, 256], [250, 250, 256, 256],
                    [0, 0, 256, 6], [3, 0, 9, 256]]
    bj = jnp.asarray(boxes)
    ref = jax.vmap(lambda f, bx: multiscale_roi_align_flat(
        f, bx, (256, 256), (7, 7)))(feats, bj)
    out = multiscale_roi_align_hybrid(feats, bj, (256, 256), (7, 7),
                                      interpret=True,
                                      mode="bands_grouped")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


def test_grouped_band_pooler_single_roi_and_14x14():
    """Degenerate grouping (1 RoI, all-hole tail groups) + the
    mask-head 14x14 output size."""
    from object_detectors_tpu.kernels.roi_align_pallas import (
        multiscale_roi_align_bands_grouped,
    )

    rng = np.random.RandomState(23)
    feats = tuple(
        jnp.asarray(rng.randn(1, 256 // s, 256 // s, 8)
                    .astype(np.float32))
        for s in (4, 8, 16, 32))
    b1 = jnp.asarray([[[10.0, 12.0, 60.0, 70.0]]])
    ref = jax.vmap(lambda f, bx: multiscale_roi_align_flat(
        f, bx, (256, 256), (7, 7)))(feats, b1)
    out = multiscale_roi_align_bands_grouped(
        feats, b1, (256, 256), (7, 7), interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)

    feats2, boxes = _setup(seed=11, n=12)
    boxes[..., 2] = np.minimum(boxes[..., 2], boxes[..., 0] + 100)
    boxes[..., 3] = np.minimum(boxes[..., 3], boxes[..., 1] + 100)
    bj = jnp.asarray(boxes)
    ref = jax.vmap(lambda f, bx: multiscale_roi_align_flat(
        f, bx, (256, 256), (14, 14)))(feats2, bj)
    out = multiscale_roi_align_bands_grouped(
        feats2, bj, (256, 256), (14, 14), interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


def test_sortfree_prep_matches_legacy():
    """The r5 scatter-free grouped prep (compare-sum band histogram +
    hole-minting multi-operand sort) must emit EXACTLY the legacy
    argsort+scatter descriptors: same canvas, group/RoI descriptors,
    geometry, inverse permutation, and overflow flags — including
    hole rows and the static BIG tail."""
    from object_detectors_tpu.kernels.roi_align_pallas import (
        _prep_bands_grouped,
    )

    rng = np.random.RandomState(42)
    for bs, n, hw in ((2, 37, 64), (1, 130, 96), (3, 16, 32)):
        feats = [jnp.asarray(rng.rand(bs, hw // (2**i), hw // (2**i), 8),
                             jnp.float32) for i in range(4)]
        raw = rng.rand(bs, n, 4).astype(np.float32) * (hw * 4)
        bx = np.concatenate([np.minimum(raw[..., :2], raw[..., 2:]),
                             np.maximum(raw[..., :2], raw[..., 2:])], -1)
        # a few degenerate / huge / extreme-aspect boxes
        bx[:, 0] = [1.0, 1.0, 1.5, 1.5]
        bx[:, 1] = [0.0, 0.0, hw * 4 - 1, 12.0]
        bj = jnp.asarray(bx)
        new = _prep_bands_grouped(feats, bj, (hw * 4, hw * 4), 7, 7, 2)
        old = _prep_bands_grouped(feats, bj, (hw * 4, hw * 4), 7, 7, 2,
                                  legacy=True)
        names = ("canvas", "gdesc", "rdesc", "geom", "dest_of_orig",
                 "ovr")
        for a, b, name in zip(new, old, names):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)
