"""Pallas multiscale RoIAlign — per-RoI window DMA + on-core bilinear.

Replaces the XLA gather formulation (`ops/roi_align.py`) for the hot
Faster/Mask R-CNN pooling path. XLA lowers the bilinear sampling to
~200 row-gathers per RoI; the TPU gather engine issues those at ~30ns
per index row, so pooling 8x1000 RoIs costs ~50-100ms. This kernel
instead DMAs ONE contiguous [WIN, WINX, C] feature window per RoI into
VMEM (double-buffered, column origin 8-aligned for the sublane tiling)
and interpolates on the VPU with weights computed on the scalar core
from 6 prefetched floats per RoI.

Window coverage: the FPN level mapper bounds sqrt(cell area) by 28, so
only aspect-extreme RoIs can span more than WIN-2 cells on one axis
(never both). Those overflow RoIs are repooled EXACTLY outside the
kernel by :func:`multiscale_roi_align_hybrid` via the XLA canvas gather
on a static per-image capacity (beyond capacity they degrade to
window-edge-clamped sampling — a documented approximation for >4:1
degenerate boxes past the per-image fix-up budget).

Semantics match torchvision MultiScaleRoIAlign (aligned=False,
sampling_ratio=2, canonical 224/level-4 mapper) — parity with
`torchvision_models/tvision/roi_heads.py:149` / `frcnn.py:207-211`.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from object_detectors_tpu.ops.roi_align import (
    _infer_scale, assign_fpn_levels, multiscale_roi_align_canvas,
)

# Window tiers (rows x cols; cols carry +8 slack for the 8-aligned
# origin). The canonical FPN mapper puts square-ish RoI spans
# log-uniformly in ~[14, 28) cells, so the kernel is DMA-bandwidth-bound
# (measured ~80% of HBM peak at the big tier); tiers cut the moved bytes
# to the smallest window covering each RoI's span. The tall/wide tiers
# cover aspect-extreme RoIs (the mapper bounds sqrt(cell area) by ~28,
# so a >30-cell span on one axis forces <=26 on the other; at 640^2 the
# clamped boundary levels stay within 46x30 / 30x46) — they replace the
# XLA canvas-gather fix-up for virtually every real RoI. KROI groups
# RoIs per grid step (measured neutral — bandwidth-bound, not
# step-overhead-bound — kept at 1).
WIN = 32    # tier 0 big: spans <= 30 cells
WINX = 40
MWIN = 24   # tier 1 mid: spans <= 22 cells
MWINX = 32
SWIN = 16   # tier 2 small: spans <= 14 cells
SWINX = 24
TWIN = 48   # tier 3 tall: span_y <= 46, span_x <= 30
TWINX = 40
WWIN = 32   # tier 4 wide: span_y <= 30, span_x <= 46
WWINX = 56
TIERS = ((WIN, WINX), (MWIN, MWINX), (SWIN, SWINX), (TWIN, TWINX),
         (WWIN, WWINX))
BUF_ROWS = max(h for h, _ in TIERS)
BUF_COLS = max(w for _, w in TIERS)
NSLOTS = 6  # DMA pipeline depth in RoI groups (prefetch NSLOTS-1)
            # VMEM: 6 x 48x56x256 bf16 = 8.3 MB of ~16 MB
KROI = 1    # RoIs per grid step


def _axis_sample(k, origin, bin_sz, limit, srat):
    """Sample k (of oh*srat) along one axis, ABSOLUTE level coords ->
    (a, b, wa, wb): corner cells (f32) + bilinear weights, zeroed for
    outside-image samples (torchvision bilinear_interpolate)."""
    i = k // srat
    r = (k % srat + 0.5) / srat
    pos = origin + (i + r) * bin_sz
    inside = jnp.where((pos >= -1.0) & (pos <= limit), 1.0, 0.0)
    p = jnp.clip(pos, 0.0, limit - 1.0)
    a = jnp.floor(p)
    frac = p - a
    b = jnp.minimum(a + 1.0, limit - 1.0)
    return a, b, (1.0 - frac) * inside, frac * inside


def _roi_align_kernel(wins_ref, geom_ref, canvas_ref, out_ref,
                      win_buf, sems, *, n_rois, c, oh, ow, srat,
                      debug="full", fold="rows", nslots=NSLOTS):
    """One grid step = KROI RoIs. wins_ref [N*3] i32 SMEM (canvas window
    row, 8-aligned window col, tier index into TIERS: 0=big 1=mid
    2=small 3=tall 4=wide); geom_ref [N*8] f32
    SMEM (y1, x1, bin_h, bin_w, H_l, W_l, win_row_rel,
    win_col_rel_aligned) — flattened 1D because SMEM pads the minor dim
    of 2D arrays to 128 lanes. N is padded to a multiple of KROI.

    Compute structure (v4): for each output row i the srat y-samples are
    folded into ONE [win_cols, C] row read-modify pass on the VPU, then
    the whole x-interpolation + bin average collapses into a single
    [ow, win_cols] x [win_cols, C] MXU matmul against a weight matrix
    built from iota comparisons — no scratch buffer, no strided sublane
    writes (the round-2 kernel's dominant cost), no transpose. KROI
    windows per grid step amortize the per-step grid/scalar overhead
    that dominated the per-RoI kernel (measured ~0.8 us/step against a
    ~0.24 us small-window DMA floor)."""
    n = pl.program_id(0)               # group index
    slot = jax.lax.rem(n, nslots)
    n_groups = n_rois // KROI

    def dma(i, s, j):
        """Window copy for RoI i into group-slot s lane j; the tier flag
        selects the smallest window covering the RoI's span — the
        sampling indices never leave the fresh region, so compute only
        branches on the row/column slice."""
        row = wins_ref[3 * i]
        col = pl.multiple_of(wins_ref[3 * i + 1], 8)
        tier = wins_ref[3 * i + 2]

        def make(h, w):
            return pltpu.make_async_copy(
                canvas_ref.at[pl.ds(row, h), pl.ds(col, w), :],
                win_buf.at[s, j, :h, :w, :], sems.at[s, j])

        return tier, tuple(make(h, w) for h, w in TIERS)

    def start(g, s):
        for j in range(KROI):
            tier, copies = dma(g * KROI + j, s, j)
            for t, cp in enumerate(copies):
                @pl.when(tier == t)
                def _(cp=cp):
                    cp.start()

    def wait(g, s):
        for j in range(KROI):
            tier, copies = dma(g * KROI + j, s, j)
            for t, cp in enumerate(copies):
                @pl.when(tier == t)
                def _(cp=cp):
                    cp.wait()

    @pl.when(n == 0)
    def _():
        # one-time zero fill: reads past a tier's DMA'd extent hit
        # finite (zero/stale-window) data whose wx weight is exactly
        # zero — NaN-from-uninitialized would break that (0*NaN=NaN).
        win_buf[...] = jnp.zeros(win_buf.shape, win_buf.dtype)

    if debug != "compute_only":
        @pl.when(n == 0)
        def _():
            for g in range(min(nslots - 1, n_groups)):
                start(g, g % nslots)

        @pl.when(n + nslots - 1 < n_groups)
        def _():
            start(n + nslots - 1, jax.lax.rem(n + nslots - 1, nslots))

        wait(n, slot)

    if debug == "dma_only":
        out_ref[...] = jnp.zeros((KROI, oh, ow, c), out_ref.dtype)
        return

    def rel(k, origin, bin_sz, limit, worigin, boundm1):
        a_abs, b_abs, wa, wb = _axis_sample(k, origin, bin_sz, limit,
                                            srat)
        a = jnp.clip(a_abs - worigin, 0.0, boundm1).astype(jnp.int32)
        b = jnp.clip(b_abs - worigin, 0.0, boundm1).astype(jnp.int32)
        return a, b, wa, wb

    def tier_dim(tier, dims):
        out = jnp.float32(dims[0])
        for t in range(1, len(dims)):
            out = jnp.where(tier == t, jnp.float32(dims[t]), out)
        return out

    for j in range(KROI):
        m = n * KROI + j
        y1 = geom_ref[8 * m]
        x1 = geom_ref[8 * m + 1]
        bin_h = geom_ref[8 * m + 2]
        bin_w = geom_ref[8 * m + 3]
        hl = geom_ref[8 * m + 4]
        wl = geom_ref[8 * m + 5]
        wr = geom_ref[8 * m + 6]
        wc = geom_ref[8 * m + 7]
        tier = wins_ref[3 * m + 2]
        # per-RoI scalar window bounds: samples clip to the DMA'd tier
        # extent, so wx is zero past the tier's columns and any stale
        # buffer tail multiplies by zero in the matmul.
        rowsm1 = tier_dim(tier, [h for h, _ in TIERS]) - 1.0
        colsm1 = tier_dim(tier, [w for _, w in TIERS]) - 1.0

        # x-interpolation + bin-average as ONE weight matrix
        # [ow, BUF_COLS]: Wx[j, x] = 1/srat^2 * sum_r (wa_k (x==xa_k) +
        # wb_k (x==xb_k)) for k = j*srat + r — iota compares on the VPU.
        inv = 1.0 / (srat * srat)
        xs = jax.lax.broadcasted_iota(
            jnp.int32, (ow, BUF_COLS), 1).astype(jnp.float32)
        js = jax.lax.broadcasted_iota(
            jnp.int32, (ow, BUF_COLS), 0).astype(jnp.float32)
        wx = jnp.zeros((ow, BUF_COLS), jnp.float32)
        for r in range(srat):
            frac = (r + 0.5) / srat
            pos = x1 + (js + frac) * bin_w
            inside = jnp.where((pos >= -1.0) & (pos <= wl), 1.0, 0.0)
            p = jnp.clip(pos, 0.0, wl - 1.0)
            a_abs = jnp.floor(p)
            fr = p - a_abs
            b_abs = jnp.minimum(a_abs + 1.0, wl - 1.0)
            a_rel = jnp.clip(a_abs - wc, 0.0, colsm1)
            b_rel = jnp.clip(b_abs - wc, 0.0, colsm1)
            wx = (wx + (1.0 - fr) * inside * (xs == a_rel)
                  + fr * inside * (xs == b_rel))
        wx = wx * inv

        if fold == "mm2":
            # whole-RoI compute as TWO MXU matmuls (no per-output-row
            # loop): (1) Wy [oh, ROWS] @ F [ROWS, COLS*C] folds the y
            # interpolation+average, (2) wx [ow, COLS] @ A' [COLS, oh*C]
            # folds x — A' is a sublane relayout of A. Wy zeros past the
            # tier's row extent (same zero-tail argument as wx), so the
            # full-buffer matmul is exact regardless of tier.
            ys = jax.lax.broadcasted_iota(
                jnp.int32, (oh, BUF_ROWS), 1).astype(jnp.float32)
            iis = jax.lax.broadcasted_iota(
                jnp.int32, (oh, BUF_ROWS), 0).astype(jnp.float32)
            wy = jnp.zeros((oh, BUF_ROWS), jnp.float32)
            for r in range(srat):
                frac = (r + 0.5) / srat
                pos = y1 + (iis + frac) * bin_h
                inside = jnp.where((pos >= -1.0) & (pos <= hl), 1.0, 0.0)
                p = jnp.clip(pos, 0.0, hl - 1.0)
                a_abs = jnp.floor(p)
                fr = p - a_abs
                b_abs = jnp.minimum(a_abs + 1.0, hl - 1.0)
                a_rel = jnp.clip(a_abs - wr, 0.0, rowsm1)
                b_rel = jnp.clip(b_abs - wr, 0.0, rowsm1)
                wy = (wy + (1.0 - fr) * inside * (ys == a_rel)
                      + fr * inside * (ys == b_rel))
            f2d = win_buf[slot, j].reshape(
                BUF_ROWS, BUF_COLS * c).astype(jnp.float32)
            a = jnp.dot(wy, f2d, preferred_element_type=jnp.float32)
            a2 = jnp.swapaxes(a.reshape(oh, BUF_COLS, c), 0, 1)
            out2 = jnp.dot(wx, a2.reshape(BUF_COLS, oh * c),
                           preferred_element_type=jnp.float32)
            out_ref[j] = jnp.swapaxes(
                out2.reshape(ow, oh, c), 0, 1).astype(out_ref.dtype)
            continue

        # per output row i: fold the srat y-samples into one [cols, C]
        # row on the VPU (contiguous reads, no scratch), then ONE MXU
        # matmul [ow, cols] @ [cols, C] — the result lands [j, C] so
        # out[i] needs no transpose. Two width branches: narrow
        # (small/mid tiers, 32 cols) and full (56); within a branch the
        # zero tail of wx makes any wider read harmless.
        narrow = (tier == 1) | (tier == 2)
        for i in range(oh):
            taps = [rel(i * srat + r, y1, bin_h, hl, wr, rowsm1)
                    for r in range(srat)]

            for is_narrow, cols in ((True, MWINX), (False, BUF_COLS)):
                pred = narrow if is_narrow else jnp.logical_not(narrow)

                @pl.when(pred)
                def _(i=i, taps=taps, j=j, wx=wx, cols=cols):
                    rows = jnp.zeros((cols, c), jnp.float32)
                    for ya, yb, wa, wb in taps:
                        rows = (rows
                                + win_buf[slot, j, ya, :cols]
                                .astype(jnp.float32) * wa
                                + win_buf[slot, j, yb, :cols]
                                .astype(jnp.float32) * wb)
                    out_ref[j, i] = jnp.dot(
                        wx[:, :cols], rows,
                        preferred_element_type=jnp.float32
                    ).astype(out_ref.dtype)


def _prep(features, boxes, image_size, oh, ow, s, xalign=8):
    """Shared geometry: canvas + per-roi window descriptors.

    Returns (canvas, wins [M,2] i32, geom [M,8] f32, overflow [M] bool)
    with M = B*N rois flattened.

    ``xalign``: column-origin alignment. 8 matches the HBM DMA sublane
    constraint; 16 additionally aligns the in-VMEM window reads to the
    bf16 (16, 128) tile grid (each tier reads xalign-8 extra columns) —
    dynamically-indexed bf16 sublane slices at half-tile offsets pay a
    (2,1)-packing relayout (the r3 scratch-dtype gotcha, read side)."""
    bsz = boxes.shape[0]
    n = boxes.shape[1]
    num_levels = len(features)
    c = features[0].shape[-1]
    xtra = xalign - 8
    # +xtra width: a 16-aligned-down origin at the right edge reads
    # xtra columns past the level width — keep it inside the canvas
    w_max = max(max(f.shape[2] for f in features) + xtra,
                BUF_COLS + xtra)

    per_img_rows = sum(f.shape[1] for f in features)
    canvas = jnp.concatenate([
        jnp.pad(f, ((0, 0), (0, 0), (0, w_max - f.shape[2]), (0, 0)))
        for f in features], axis=1)                    # [B, R, Wmax, C]
    canvas = canvas.reshape(bsz * per_img_rows, w_max, c)
    canvas = jnp.pad(canvas, ((0, BUF_ROWS), (0, 0), (0, 0)))

    heights = jnp.asarray([f.shape[1] for f in features], jnp.float32)
    widths = jnp.asarray([f.shape[2] for f in features], jnp.float32)
    row_off = jnp.asarray(
        np.cumsum([0] + [f.shape[1] for f in features])[:-1], jnp.int32)
    scales = jnp.asarray(
        [_infer_scale(f.shape[1:3], image_size) for f in features],
        jnp.float32)

    flat_boxes = boxes.reshape(-1, 4)
    levels = assign_fpn_levels(flat_boxes, num_levels)
    hl = heights[levels]
    wl = widths[levels]
    scale = scales[levels]
    img_of = (jnp.arange(bsz * n, dtype=jnp.int32) // n) * per_img_rows
    base_row = row_off[levels] + img_of

    b = flat_boxes * scale[:, None]
    x1, y1 = b[:, 0], b[:, 1]
    roi_w = jnp.maximum(b[:, 2] - x1, 1.0)
    roi_h = jnp.maximum(b[:, 3] - y1, 1.0)
    bin_h = roi_h / oh
    bin_w = roi_w / ow

    first_y = y1 + (0.5 / s) * bin_h
    first_x = x1 + (0.5 / s) * bin_w
    f0y = jnp.floor(jnp.clip(first_y, 0.0, hl - 1.0))
    f0x = jnp.floor(jnp.clip(first_x, 0.0, wl - 1.0))

    def origin(f0, lim, h, w_aligned):
        o = jnp.clip(f0, 0.0, jnp.maximum(lim - h, 0.0))
        if w_aligned:  # column origins align DOWN to the sublane tile
            o = jnp.floor(o / xalign) * xalign
        return o

    span = (oh - 1 + (s - 0.5) / s - 0.5 / s)  # sample span in bins

    def overflow(first, o_rel, bin_sz, lim, width):
        last = first + span * bin_sz
        b_last = jnp.minimum(
            jnp.floor(jnp.clip(last, 0.0, lim - 1.0)) + 1.0, lim - 1.0)
        return b_last - o_rel > width - 1.0

    rows_c, cols_c, fits = [], [], []
    for th, tw in TIERS:
        r_t = origin(f0y, hl, th, False)
        c_t = origin(f0x, wl, tw, True)
        rows_c.append(r_t)
        cols_c.append(c_t)
        fits.append(~(overflow(first_y, r_t, bin_h, hl, th)
                      | overflow(first_x, c_t, bin_w, wl, tw + xtra)))
    ovr = ~(fits[0] | fits[1] | fits[2] | fits[3] | fits[4])

    # smallest covering tier: small(2) < mid(1) < big(0) < tall(3)/
    # wide(4); non-fitting RoIs take tall/wide clamped (by long axis)
    # and are exactly repooled by the hybrid fix-up.
    taller = bin_h >= bin_w
    fallback = jnp.where(taller, 3, 4)
    tier = jnp.where(
        fits[2], 2, jnp.where(
            fits[1], 1, jnp.where(
                fits[0], 0, jnp.where(
                    fits[3] & ~fits[4], 3, jnp.where(
                        fits[4] & ~fits[3], 4, fallback)))))
    tier_rows = jnp.stack(rows_c, -1)
    tier_cols = jnp.stack(cols_c, -1)
    win_row = jnp.take_along_axis(tier_rows, tier[:, None], -1)[:, 0]
    win_col = jnp.take_along_axis(tier_cols, tier[:, None], -1)[:, 0]

    # 1D-flattened descriptors: 2D SMEM prefetch arrays are lane-padded
    # to 128 columns (v5e SMEM is only 1 MiB)
    wins = jnp.stack([base_row + win_row.astype(jnp.int32),
                      win_col.astype(jnp.int32),
                      tier.astype(jnp.int32)], axis=-1).reshape(-1)
    geom = jnp.stack([y1, x1, bin_h, bin_w, hl, wl, win_row, win_col],
                     axis=-1).reshape(-1)
    return canvas, wins, geom, ovr


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                   "image_size", "interpret", "debug",
                                   "fold"))
def multiscale_roi_align_pallas(
    features: Sequence[jnp.ndarray],   # per level [B, H_l, W_l, C]
    boxes: jnp.ndarray,                # [B, N, 4] xyxy image coords
    image_size: tuple,
    output_size: tuple = (7, 7),
    sampling_ratio: int = 2,
    interpret: bool = False,
    prep=None,
    debug: str = "full",
    fold: str = "rows",
) -> jnp.ndarray:
    """-> [B, N, oh, ow, C] f32. Window-clamped for overflow RoIs (use
    :func:`multiscale_roi_align_hybrid` for exact handling)."""
    bsz, n = boxes.shape[:2]
    c = features[0].shape[-1]
    oh, ow = output_size
    s = sampling_ratio
    if prep is None:
        prep = _prep(features, boxes, image_size, oh, ow, s)
    canvas, wins, geom, _ = prep

    n_rois = bsz * n
    n_pad = -n_rois % KROI
    if n_pad:  # pad descriptors with safe dummies (small window at 0,0)
        wins = jnp.concatenate([
            wins, jnp.tile(jnp.asarray([0, 0, 2], wins.dtype), n_pad)])
        geom = jnp.concatenate([geom, jnp.zeros((8 * n_pad,), geom.dtype)])
    n_total = n_rois + n_pad
    # pipeline depth scales with dtype: the f32 train-path canvas
    # (Mask/Keypoint R-CNN train steps pool f32 features) doubles the
    # slot footprint — 6 x 48x56x256 f32 = 16.5 MB would overflow the
    # 16 MB scoped-VMEM stack (observed at maskrcnn train compile).
    nslots = NSLOTS if canvas.dtype.itemsize <= 2 else NSLOTS // 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_total // KROI,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (KROI, oh, ow, c), lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((nslots, KROI, BUF_ROWS, BUF_COLS, c),
                       canvas.dtype),
            pltpu.SemaphoreType.DMA((nslots, KROI)),
        ],
    )
    kernel = partial(_roi_align_kernel, n_rois=n_total, c=c, oh=oh, ow=ow,
                     srat=s, debug=debug, fold=fold, nslots=nslots)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_total, oh, ow, c),
                                       canvas.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(wins, geom, canvas)
    return out[:n_rois].reshape(bsz, n, oh, ow, c)


TILE_R = 64   # tile rows; window rows <= 32 (48 tall) fit via the
TILE_C = 80   # 32 (16 tall) row-stride; cols <= 40 (56 wide) via the
              # 40 (24 wide) col-stride. Tile = 64x80x256 bf16 = 2.6 MB.


def _tiled_kernel(tdesc_ref, geom_ref, canvas_ref, out_ref,
                  tile_buf, sems, *, c, oh, ow, srat, debug="full",
                  fold="rows"):
    """One grid step = one RoI, SORTED by canvas tile. A tile is DMA'd
    ONCE when its first RoI arrives (the next tile prefetches into the
    other slot at the same moment), and every RoI in the tile samples
    from VMEM. Windows average ~26 strided HBM segments per RoI in the
    per-RoI kernel; tiles amortize that to ~4 (64 x 40KB segments per
    ~18 RoIs) and cut moved bytes ~2.6x (tile overlap factor ~4 of the
    unique canvas vs ~10 for per-RoI windows).

    tdesc [N*7] i32 SMEM: (tile_row, tile_col_8aligned, slot, first,
    start_next, next_row, next_col). geom [N*8] f32 SMEM: (y1, x1,
    bin_h, bin_w, H_l, W_l, tile_row_base, tile_col_base) where
    row/col_base are the tile origin in LEVEL coords (so sample cell -
    base indexes the tile buffer)."""
    i = pl.program_id(0)
    trow = tdesc_ref[7 * i]
    tcol = pl.multiple_of(tdesc_ref[7 * i + 1], 8)
    slot = tdesc_ref[7 * i + 2]
    first = tdesc_ref[7 * i + 3] > 0
    startn = tdesc_ref[7 * i + 4] > 0
    nrow = tdesc_ref[7 * i + 5]
    ncol = pl.multiple_of(tdesc_ref[7 * i + 6], 8)

    def copy(r, cc, s):
        return pltpu.make_async_copy(
            canvas_ref.at[pl.ds(r, TILE_R), pl.ds(cc, TILE_C), :],
            tile_buf.at[s], sems.at[s])

    if debug != "compute_only":
        @pl.when(first & (i == 0))
        def _():
            copy(trow, tcol, slot).start()

        @pl.when(first)
        def _():
            copy(trow, tcol, slot).wait()

        @pl.when(startn)
        def _():
            copy(nrow, ncol, 1 - slot).start()

    if debug == "dma_only":
        out_ref[...] = jnp.zeros((1, oh, ow, c), out_ref.dtype)
        return

    y1 = geom_ref[8 * i]
    x1 = geom_ref[8 * i + 1]
    bin_h = geom_ref[8 * i + 2]
    bin_w = geom_ref[8 * i + 3]
    hl = geom_ref[8 * i + 4]
    wl = geom_ref[8 * i + 5]
    rbase = geom_ref[8 * i + 6]
    cbase = geom_ref[8 * i + 7]

    def axis_w(n_out, n_buf, origin, bin_sz, limit, base):
        """[n_out, n_buf] interpolation+average weight matrix via iota
        compares; zero where the sample is outside the image, so reads
        of non-level tile data multiply by exactly zero."""
        xs = jax.lax.broadcasted_iota(
            jnp.int32, (n_out, n_buf), 1).astype(jnp.float32)
        js = jax.lax.broadcasted_iota(
            jnp.int32, (n_out, n_buf), 0).astype(jnp.float32)
        w = jnp.zeros((n_out, n_buf), jnp.float32)
        for r in range(srat):
            frac = (r + 0.5) / srat
            pos = origin + (js + frac) * bin_sz
            inside = jnp.where((pos >= -1.0) & (pos <= limit), 1.0, 0.0)
            p = jnp.clip(pos, 0.0, limit - 1.0)
            a_abs = jnp.floor(p)
            fr = p - a_abs
            b_abs = jnp.minimum(a_abs + 1.0, limit - 1.0)
            a_rel = jnp.clip(a_abs - base, 0.0, float(n_buf - 1))
            b_rel = jnp.clip(b_abs - base, 0.0, float(n_buf - 1))
            w = (w + (1.0 - fr) * inside * (xs == a_rel)
                 + fr * inside * (xs == b_rel))
        return w

    wx = axis_w(ow, TILE_C, x1, bin_w, wl, cbase) / (srat * srat)

    if fold == "mm2":
        wy = axis_w(oh, TILE_R, y1, bin_h, hl, rbase)
        f2d = tile_buf[slot].reshape(TILE_R, TILE_C * c).astype(
            jnp.float32)
        a = jnp.dot(wy, f2d, preferred_element_type=jnp.float32)
        a2 = jnp.swapaxes(a.reshape(oh, TILE_C, c), 0, 1)
        out2 = jnp.dot(wx, a2.reshape(TILE_C, oh * c),
                       preferred_element_type=jnp.float32)
        out_ref[0] = jnp.swapaxes(
            out2.reshape(ow, oh, c), 0, 1).astype(out_ref.dtype)
        return

    for irow in range(oh):
        taps = []
        for r in range(srat):
            a_abs, b_abs, wa, wb = _axis_sample(
                irow * srat + r, y1, bin_h, hl, srat)
            ya = jnp.clip(a_abs - rbase, 0.0,
                          float(TILE_R - 1)).astype(jnp.int32)
            yb = jnp.clip(b_abs - rbase, 0.0,
                          float(TILE_R - 1)).astype(jnp.int32)
            taps.append((ya, yb, wa, wb))
        rows = jnp.zeros((TILE_C, c), jnp.float32)
        for ya, yb, wa, wb in taps:
            rows = (rows
                    + tile_buf[slot, ya].astype(jnp.float32) * wa
                    + tile_buf[slot, yb].astype(jnp.float32) * wb)
        out_ref[0, irow] = jnp.dot(
            wx, rows, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


def _prep_tiled(features, boxes, image_size, oh, ow, s):
    """Tile descriptors on top of :func:`_prep`: assign each RoI's
    window to a 64x80 canvas tile (row stride 32 / col stride 40; the
    tall/wide tiers use 16 / 24 so their larger windows still fit),
    sort RoIs by tile, and emit first/prefetch bookkeeping."""
    prep = _prep(features, boxes, image_size, oh, ow, s)
    canvas, wins, geom, ovr = prep
    n = ovr.shape[0]
    wins2 = wins.reshape(n, 3)
    geom2 = geom.reshape(n, 8)
    crow = wins2[:, 0]
    wcol = wins2[:, 1]
    tier = wins2[:, 2]

    # width >= TILE_C (tiny test configs) and 64-row tail for tile reads
    pad_w = max(0, TILE_C - canvas.shape[1])
    pad_w += -(canvas.shape[1] + pad_w) % 8
    canvas = jnp.pad(canvas, ((0, TILE_R - BUF_ROWS), (0, pad_w),
                              (0, 0)))
    rtot, wmax = canvas.shape[0], canvas.shape[1]

    # overflow RoIs pool garbage from tile 0 and are replaced by the
    # exact fix-up — park them at (0, 0) so they don't mint tiles.
    crow0 = jnp.where(ovr, 0, crow)
    wcol0 = jnp.where(ovr, 0, wcol)
    sr = jnp.where(tier == 3, 16, 32)
    sc = jnp.where(tier == 4, 24, 40)
    trow = jnp.minimum(crow0 // sr * sr, rtot - TILE_R)
    tcol = jnp.minimum(wcol0 // sc * sc, wmax - TILE_C)

    key = trow * wmax + tcol
    perm = jnp.argsort(key)
    inv = jnp.argsort(perm)
    ks = key[perm]
    trs = trow[perm]
    tcs = tcol[perm]
    first = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    dix = jnp.cumsum(first.astype(jnp.int32)) - 1
    slot = dix % 2
    fp = jnp.zeros((n,), jnp.int32).at[
        jnp.where(first, dix, n)].set(jnp.arange(n, dtype=jnp.int32),
                                      mode="drop")
    has_next = dix < dix[-1]
    npos = fp[jnp.clip(dix + 1, 0, n - 1)]
    tdesc = jnp.stack([
        trs, tcs, slot, first.astype(jnp.int32),
        (first & has_next).astype(jnp.int32), trs[npos], tcs[npos],
    ], axis=-1).astype(jnp.int32).reshape(-1)

    gs = geom2[perm]
    base_row = (crow[perm] - gs[:, 6]).astype(jnp.float32)
    geom_t = jnp.concatenate([
        gs[:, :6],
        (trs.astype(jnp.float32) - base_row)[:, None],
        tcs.astype(jnp.float32)[:, None],
    ], axis=-1).reshape(-1)
    return canvas, tdesc, geom_t, inv, ovr


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                   "image_size", "interpret", "debug",
                                   "fold"))
def multiscale_roi_align_tiled(
    features: Sequence[jnp.ndarray],   # per level [B, H_l, W_l, C]
    boxes: jnp.ndarray,                # [B, N, 4] xyxy image coords
    image_size: tuple,
    output_size: tuple = (7, 7),
    sampling_ratio: int = 2,
    interpret: bool = False,
    prep=None,
    debug: str = "full",
    fold: str = "rows",
) -> jnp.ndarray:
    """Tile-sorted pooler: -> [B, N, oh, ow, C]. Same coverage as the
    per-RoI window kernel (tall/wide in-kernel; true overflow RoIs
    produce garbage here and need the hybrid fix-up)."""
    bsz, n = boxes.shape[:2]
    c = features[0].shape[-1]
    oh, ow = output_size
    if prep is None:
        prep = _prep_tiled(features, boxes, image_size, oh, ow,
                           sampling_ratio)
    canvas, tdesc, geom_t, inv, _ = prep
    n_rois = bsz * n
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_rois,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, oh, ow, c), lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, TILE_R, TILE_C, c), canvas.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = partial(_tiled_kernel, c=c, oh=oh, ow=ow,
                     srat=sampling_ratio, debug=debug, fold=fold)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rois, oh, ow, c),
                                       canvas.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tdesc, geom_t, canvas)
    return out[inv].reshape(bsz, n, oh, ow, c)


BAND_R = 64   # band rows; assignment stride 32 (16 for the tall tier)
              # guarantees every tier window (<= 48 rows) fits its band


def _band_kernel(tdesc_ref, geom_ref, canvas_ref, out_ref, band_buf,
                 sems, *, c, oh, ow, srat, band_w, debug="full"):
    """One grid step = one RoI, SORTED by full-width canvas row band.

    The tiled kernel amortizes window DMA across the RoIs of a 64x80
    tile but still re-reads a tile per COLUMN stripe — measured
    dma_only floor 6.17 ms for 8k RoIs at 640² (~17x the unique canvas
    bytes). A band is the full canvas width, so each canvas row range
    is DMA'd once per ~32-row stride (<= 2x the unique canvas), and
    every RoI samples a dynamic 8-aligned COLUMN SLICE of the resident
    band — per-RoI compute stays window-sized, identical math to the
    window kernel.

    tdesc [N*7] i32 SMEM: (band_row, wcol_8aligned, tier, slot, first,
    start_next, next_band_row). geom [N*8] f32 SMEM: (y1, x1, bin_h,
    bin_w, H_l, W_l, band_row_base_level, wcol_level)."""
    i = pl.program_id(0)
    trow = tdesc_ref[7 * i]
    wcol = pl.multiple_of(tdesc_ref[7 * i + 1], 8)
    tier = tdesc_ref[7 * i + 2]
    slot = tdesc_ref[7 * i + 3]
    first = tdesc_ref[7 * i + 4] > 0
    startn = tdesc_ref[7 * i + 5] > 0
    nrow = tdesc_ref[7 * i + 6]

    def copy(r, s_):
        return pltpu.make_async_copy(
            canvas_ref.at[pl.ds(r, BAND_R), pl.ds(0, band_w), :],
            band_buf.at[s_], sems.at[s_])

    if debug != "compute_only":
        @pl.when(first & (i == 0))
        def _():
            copy(trow, slot).start()

        @pl.when(first)
        def _():
            copy(trow, slot).wait()

        @pl.when(startn)
        def _():
            copy(nrow, 1 - slot).start()

    if debug == "dma_only":
        out_ref[...] = jnp.zeros((1, oh, ow, c), out_ref.dtype)
        return

    y1 = geom_ref[8 * i]
    x1 = geom_ref[8 * i + 1]
    bin_h = geom_ref[8 * i + 2]
    bin_w = geom_ref[8 * i + 3]
    hl = geom_ref[8 * i + 4]
    wl = geom_ref[8 * i + 5]
    rbase = geom_ref[8 * i + 6]
    cbase = geom_ref[8 * i + 7]

    # column width groups (dedup over tiers): big/tall 40, mid 32,
    # small 24, wide 56 — compute branches per group, everything else
    # is shared. Sample rows clip to the band (always fresh, full
    # width); sample cols clip to the window slice exactly like the
    # window kernel (outside-image weights are zero).
    groups = {}
    for t, (_, tw) in enumerate(TIERS):
        groups.setdefault(tw, []).append(t)

    def rel_row(k):
        a_abs, b_abs, wa, wb = _axis_sample(k, y1, bin_h, hl, srat)
        ya = jnp.clip(a_abs - rbase, 0.0,
                      float(BAND_R - 1)).astype(jnp.int32)
        yb = jnp.clip(b_abs - rbase, 0.0,
                      float(BAND_R - 1)).astype(jnp.int32)
        return ya, yb, wa, wb

    taps = [[rel_row(irow * srat + r) for r in range(srat)]
            for irow in range(oh)]

    for tw, tiers in groups.items():
        pred = tier == tiers[0]
        for t in tiers[1:]:
            pred = pred | (tier == t)

        @pl.when(pred)
        def _(tw=tw):
            inv = 1.0 / (srat * srat)
            xs = jax.lax.broadcasted_iota(
                jnp.int32, (ow, tw), 1).astype(jnp.float32)
            js = jax.lax.broadcasted_iota(
                jnp.int32, (ow, tw), 0).astype(jnp.float32)
            wx = jnp.zeros((ow, tw), jnp.float32)
            for r in range(srat):
                frac = (r + 0.5) / srat
                pos = x1 + (js + frac) * bin_w
                inside = jnp.where((pos >= -1.0) & (pos <= wl), 1.0, 0.0)
                p = jnp.clip(pos, 0.0, wl - 1.0)
                a_abs = jnp.floor(p)
                fr = p - a_abs
                b_abs = jnp.minimum(a_abs + 1.0, wl - 1.0)
                a_rel = jnp.clip(a_abs - cbase, 0.0, float(tw - 1))
                b_rel = jnp.clip(b_abs - cbase, 0.0, float(tw - 1))
                wx = (wx + (1.0 - fr) * inside * (xs == a_rel)
                      + fr * inside * (xs == b_rel))
            wx = wx * inv
            for irow in range(oh):
                rows = jnp.zeros((tw, c), jnp.float32)
                for ya, yb, wa, wb in taps[irow]:
                    rows = (rows
                            + band_buf[slot, ya, pl.ds(wcol, tw)]
                            .astype(jnp.float32) * wa
                            + band_buf[slot, yb, pl.ds(wcol, tw)]
                            .astype(jnp.float32) * wb)
                out_ref[0, irow] = jnp.dot(
                    wx, rows, preferred_element_type=jnp.float32
                ).astype(out_ref.dtype)


def _prep_bands(features, boxes, image_size, oh, ow, s):
    """Band descriptors on top of :func:`_prep`: each RoI's window goes
    to the full-width 64-row band at stride 32 (16 for the tall tier,
    whose 48-row windows need the finer grid), RoIs sort by band, and
    the first RoI of a band DMAs it (prefetching the next band)."""
    prep = _prep(features, boxes, image_size, oh, ow, s)
    canvas, wins, geom, ovr = prep
    n = ovr.shape[0]
    wins2 = wins.reshape(n, 3)
    geom2 = geom.reshape(n, 8)
    crow = wins2[:, 0]
    wcol = wins2[:, 1]
    tier = wins2[:, 2]

    pad_w = -canvas.shape[1] % 8
    canvas = jnp.pad(canvas, ((0, BAND_R - BUF_ROWS), (0, pad_w),
                              (0, 0)))
    rtot = canvas.shape[0]

    # overflow RoIs pool garbage from band 0 and are replaced by the
    # exact fix-up — park them at row 0 so they don't mint bands.
    crow0 = jnp.where(ovr, 0, crow)
    sr = jnp.where(tier == 3, 16, 32)
    trow = jnp.minimum(crow0 // sr * sr, rtot - BAND_R)

    perm = jnp.argsort(trow)
    inv = jnp.argsort(perm)
    ks = trow[perm]
    trs = ks
    first = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    dix = jnp.cumsum(first.astype(jnp.int32)) - 1
    slot = dix % 2
    fp = jnp.zeros((n,), jnp.int32).at[
        jnp.where(first, dix, n)].set(jnp.arange(n, dtype=jnp.int32),
                                      mode="drop")
    has_next = dix < dix[-1]
    npos = fp[jnp.clip(dix + 1, 0, n - 1)]
    tdesc = jnp.stack([
        trs, wcol[perm], tier[perm], slot, first.astype(jnp.int32),
        (first & has_next).astype(jnp.int32), trs[npos],
    ], axis=-1).astype(jnp.int32).reshape(-1)

    gs = geom2[perm]
    level_off = (crow[perm].astype(jnp.float32) - gs[:, 6])
    geom_t = jnp.concatenate([
        gs[:, :6],
        (trs.astype(jnp.float32) - level_off)[:, None],
        gs[:, 7:8],                      # wcol in level coords
    ], axis=-1).reshape(-1)
    return canvas, tdesc, geom_t, inv, ovr


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                   "image_size", "interpret", "debug",
                                   "return_overflow"))
def multiscale_roi_align_bands(
    features: Sequence[jnp.ndarray],   # per level [B, H_l, W_l, C]
    boxes: jnp.ndarray,                # [B, N, 4] xyxy image coords
    image_size: tuple,
    output_size: tuple = (7, 7),
    sampling_ratio: int = 2,
    interpret: bool = False,
    prep=None,
    debug: str = "full",
    return_overflow: bool = False,
) -> jnp.ndarray:
    """Band-sorted pooler: -> [B, N, oh, ow, C]. Overflow RoIs (window
    wider than every tier) pool GARBAGE band-0 data — callers must
    route through :func:`multiscale_roi_align_hybrid` for the exact
    fix-up, or pass ``return_overflow=True`` to also get the [B, N]
    bool mask of uncovered RoIs and handle them (ADVICE r3)."""
    bsz, n = boxes.shape[:2]
    c = features[0].shape[-1]
    oh, ow = output_size
    if prep is None:
        prep = _prep_bands(features, boxes, image_size, oh, ow,
                           sampling_ratio)
    canvas, tdesc, geom_t, inv, ovr = prep
    band_w = canvas.shape[1]
    n_rois = bsz * n
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_rois,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, oh, ow, c), lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, BAND_R, band_w, c), canvas.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = partial(_band_kernel, c=c, oh=oh, ow=ow,
                     srat=sampling_ratio, band_w=band_w, debug=debug)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rois, oh, ow, c),
                                       canvas.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tdesc, geom_t, canvas)
    pooled = out[inv].reshape(bsz, n, oh, ow, c)
    if return_overflow:
        return pooled, ovr.reshape(bsz, n)
    return pooled


GROUP = 8     # RoIs per grid step in the grouped-bands kernel
NSPLIT = 4    # parallel sub-copies per band DMA (a single in-flight
              # copy measured ~72 GB/s — far under HBM peak; splitting
              # each band into 4 row stripes keeps 4 DMA streams hot
              # without growing the 2-slot VMEM footprint)
SUBR = BAND_R // NSPLIT


def _band_group_kernel(gdesc_ref, rdesc_ref, geom_ref, canvas_ref,
                       out_ref, band_buf, sems, *, c, oh, ow, srat,
                       band_w, debug="full", fold="rows",
                       g_rois=GROUP, xalign=8):
    """One grid step = GROUP RoIs of ONE band (prep pads each band's
    RoI list to a multiple of GROUP, so steps never straddle bands).

    Two measured floors of the per-RoI band kernel motivate this
    variant: (1) ~0.7 us Mosaic grid-step overhead — grouping
    amortizes it 8x; (2) band DMA at ~72 GB/s because only one copy is
    ever in flight — each band copy is split into NSPLIT parallel row
    stripes. Compute per RoI is the band kernel's rows fold;
    ``fold='quad'`` replaces the 4 per-tap dynamic row reads of each
    output row with ONE [4, tw, C] slice (the srat=2 taps of a row
    span <= 4 window rows because the FPN mapper bounds bins to <= 4
    cells) and folds with 4 scalar weights — 7 dynamic reads per RoI
    instead of 28.

    gdesc [NG*5] i32 SMEM: (band_row, slot, first, start_next,
    next_band_row) per GROUP. rdesc [NP*3] i32 SMEM: (tier,
    wcol_8aligned, row_off_in_band) per RoI. geom [NP*8] f32 SMEM:
    identical layout to :func:`_prep` (y1, x1, bin_h, bin_w, H_l, W_l,
    win_row_level, win_col_level)."""
    g = pl.program_id(0)
    trow = gdesc_ref[5 * g]
    slot = gdesc_ref[5 * g + 1]
    first = gdesc_ref[5 * g + 2] > 0
    startn = gdesc_ref[5 * g + 3] > 0
    nrow = gdesc_ref[5 * g + 4]

    def copies(r, s_):
        return [pltpu.make_async_copy(
            canvas_ref.at[pl.ds(r + k * SUBR, SUBR),
                          pl.ds(0, band_w), :],
            band_buf.at[s_, pl.ds(k * SUBR, SUBR)], sems.at[s_, k])
            for k in range(NSPLIT)]

    if debug != "compute_only":
        @pl.when(first & (g == 0))
        def _():
            for cp in copies(trow, slot):
                cp.start()

        @pl.when(first)
        def _():
            for cp in copies(trow, slot):
                cp.wait()

        @pl.when(startn)
        def _():
            for cp in copies(nrow, 1 - slot):
                cp.start()

    if debug == "dma_only":
        out_ref[...] = jnp.zeros((g_rois, oh, ow, c), out_ref.dtype)
        return

    xtra = xalign - 8
    for j in range(g_rois):
        i = g * g_rois + j
        tier = rdesc_ref[3 * i]
        wcol = pl.multiple_of(rdesc_ref[3 * i + 1], xalign)
        roff = rdesc_ref[3 * i + 2]
        y1 = geom_ref[8 * i]
        x1 = geom_ref[8 * i + 1]
        bin_h = geom_ref[8 * i + 2]
        bin_w = geom_ref[8 * i + 3]
        hl = geom_ref[8 * i + 4]
        wl = geom_ref[8 * i + 5]
        rbase = geom_ref[8 * i + 6]
        cbase = geom_ref[8 * i + 7]

        def row_taps(irow):
            return [_axis_sample(irow * srat + r, y1, bin_h, hl, srat)
                    for r in range(srat)]

        groups = {}
        for t, (_, twd) in enumerate(TIERS):
            groups.setdefault(twd + xtra, []).append(t)

        for twd, tiers in groups.items():
            pred = tier == tiers[0]
            for t in tiers[1:]:
                pred = pred | (tier == t)

            @pl.when(pred)
            def _(tw=twd, j=j):
                inv = 1.0 / (srat * srat)
                xs = jax.lax.broadcasted_iota(
                    jnp.int32, (ow, tw), 1).astype(jnp.float32)
                js = jax.lax.broadcasted_iota(
                    jnp.int32, (ow, tw), 0).astype(jnp.float32)
                wx = jnp.zeros((ow, tw), jnp.float32)
                for r in range(srat):
                    frac = (r + 0.5) / srat
                    pos = x1 + (js + frac) * bin_w
                    inside = jnp.where((pos >= -1.0) & (pos <= wl),
                                       1.0, 0.0)
                    p = jnp.clip(pos, 0.0, wl - 1.0)
                    a_abs = jnp.floor(p)
                    fr = p - a_abs
                    b_abs = jnp.minimum(a_abs + 1.0, wl - 1.0)
                    a_rel = jnp.clip(a_abs - cbase, 0.0, float(tw - 1))
                    b_rel = jnp.clip(b_abs - cbase, 0.0, float(tw - 1))
                    wx = (wx + (1.0 - fr) * inside * (xs == a_rel)
                          + fr * inside * (xs == b_rel))
                wx = wx * inv

                if fold == "wide":
                    # ONE [ow, tw] x [tw, oh*c] matmul per RoI: the oh
                    # per-row [ow,tw]x[tw,c] dots all share wx, so
                    # lane-concatenating the folded row blocks lets a
                    # single wide dot replace them (the rows fold
                    # issues oh small matmuls per RoI and Mosaic
                    # issue latency, not FLOPs, bounds the kernel).
                    # Writeback slices lanes at static c offsets — no
                    # transpose.
                    blocks = []
                    for irow in range(oh):
                        rows = jnp.zeros((tw, c), jnp.float32)
                        for (ya, yb, wa, wb) in row_taps(irow):
                            ra = jnp.clip(
                                (ya - rbase).astype(jnp.int32) + roff,
                                0, BAND_R - 1)
                            rb = jnp.clip(
                                (yb - rbase).astype(jnp.int32) + roff,
                                0, BAND_R - 1)
                            rows = (rows
                                    + band_buf[slot, ra,
                                               pl.ds(wcol, tw)]
                                    .astype(jnp.float32) * wa
                                    + band_buf[slot, rb,
                                               pl.ds(wcol, tw)]
                                    .astype(jnp.float32) * wb)
                        blocks.append(rows)
                    res = jnp.dot(wx, jnp.concatenate(blocks, -1),
                                  preferred_element_type=jnp.float32)
                    for irow in range(oh):
                        out_ref[j, irow] = res[
                            :, irow * c:(irow + 1) * c
                        ].astype(out_ref.dtype)
                    return

                for irow in range(oh):
                    taps = row_taps(irow)
                    if fold == "pair":
                        # each tap's two bilinear rows are adjacent
                        # (rb <= ra + 1 by construction, equal only at
                        # clamps), so ONE span-2 read at
                        # rp = min(ra, BAND_R-2) covers both: 14
                        # dynamic band reads per RoI instead of 28.
                        # The grouped compute is read-ISSUE-bound on
                        # the dynamic row reads (BASELINE.md r4), so
                        # the read count, not bytes or FLOPs, is the
                        # lever; the two tap weights route onto the
                        # span rows by scalar compares (every clamp
                        # case lands in {rp, rp+1} — see inline).
                        rows = jnp.zeros((tw, c), jnp.float32)
                        for (ya, yb, wa, wb) in taps:
                            ra = jnp.clip(
                                (ya - rbase).astype(jnp.int32) + roff,
                                0, BAND_R - 1)
                            rb = jnp.clip(
                                (yb - rbase).astype(jnp.int32) + roff,
                                0, BAND_R - 1)
                            # ra <= rb <= ra+1; rp+1 <= BAND_R-1, and
                            # when ra == BAND_R-1, ra == rb == rp+1.
                            rp = jnp.minimum(ra, BAND_R - 2)
                            w0 = (jnp.where(ra == rp, wa, 0.0)
                                  + jnp.where(rb == rp, wb, 0.0))
                            w1 = (jnp.where(ra == rp + 1, wa, 0.0)
                                  + jnp.where(rb == rp + 1, wb, 0.0))
                            duo = band_buf[
                                slot, pl.ds(rp, 2),
                                pl.ds(wcol, tw)].astype(jnp.float32)
                            rows = rows + duo[0] * w0 + duo[1] * w1
                    elif fold == "quad":
                        # all srat*2 taps of one output row live in 8
                        # consecutive window rows starting at the first
                        # tap's floor (worst tier: tall, span_y <= 46
                        # cells -> bin_h <= 6.6 -> 6 tap rows): one
                        # [8, tw, C] read + 8 scalar-weighted FMAs
                        # replaces the 4 dynamic per-tap row reads.
                        a0 = taps[0][0]            # smallest tap row
                        base0 = (a0 - rbase).astype(jnp.int32) + roff
                        base_in_band = jnp.minimum(base0, BAND_R - 8)
                        # window-fit guarantees every tap lands within
                        # [base_in_band, base_in_band+8) even when the
                        # read is clamped at the band edge (taps <=
                        # BAND_R-1 and span <= 7 - shift).
                        sh = base0 - base_in_band
                        oct_ = band_buf[
                            slot, pl.ds(base_in_band, 8),
                            pl.ds(wcol, tw)].astype(jnp.float32)
                        rows = jnp.zeros((tw, c), jnp.float32)
                        for rr in range(8):
                            wgt = jnp.float32(0.0)
                            for (ya, yb, wa, wb) in taps:
                                da = (ya - a0).astype(jnp.int32) + sh
                                db = (yb - a0).astype(jnp.int32) + sh
                                wgt = (wgt
                                       + jnp.where(da == rr, wa, 0.0)
                                       + jnp.where(db == rr, wb, 0.0))
                            rows = rows + oct_[rr] * wgt
                    else:
                        rows = jnp.zeros((tw, c), jnp.float32)
                        for (ya, yb, wa, wb) in taps:
                            ra = jnp.clip(
                                (ya - rbase).astype(jnp.int32) + roff,
                                0, BAND_R - 1)
                            rb = jnp.clip(
                                (yb - rbase).astype(jnp.int32) + roff,
                                0, BAND_R - 1)
                            rows = (rows
                                    + band_buf[slot, ra,
                                               pl.ds(wcol, tw)]
                                    .astype(jnp.float32) * wa
                                    + band_buf[slot, rb,
                                               pl.ds(wcol, tw)]
                                    .astype(jnp.float32) * wb)
                    out_ref[j, irow] = jnp.dot(
                        wx, rows, preferred_element_type=jnp.float32
                    ).astype(out_ref.dtype)


def _prep_bands_grouped(features, boxes, image_size, oh, ow, s,
                        g_rois=GROUP, xalign=8, legacy=False,
                        lite=False):
    """Grouped-band descriptors: RoIs sort by 64-row canvas band
    (stride 32; 16 for the tall tier), each band's run is padded to a
    multiple of ``g_rois`` so every grid step lives in one band, and
    per-GROUP descriptors carry the DMA bookkeeping.

    r5: the padded-position layout is built SCATTER-FREE — TPU
    scatters/gathers serialize per row (~30ns+), and the in-graph prep
    marginal measured 6.2 ms at bs16 512 RoIs (queue_r5e
    full_prep_only), dominating the pooler's non-kernel cost. Band
    counts come from one [nbs, n] compare-sum instead of scatter-adds,
    and the hole padding comes from sorting the n real RoIs together
    with explicitly-minted per-band hole rows (band b mints
    padded_b - counts_b holes keyed just after its reals), so ONE
    stable multi-operand lax.sort emits every field already at its
    padded position. ``legacy=True`` keeps the r4 argsort+scatter
    path for the chip A/B record.

    Returns (canvas, gdesc, rdesc, geom, dest_of_orig, ovr)."""
    prep = _prep(features, boxes, image_size, oh, ow, s, xalign=xalign)
    canvas, wins, geom, ovr = prep
    n = ovr.shape[0]
    wins2 = wins.reshape(n, 3)
    geom2 = geom.reshape(n, 8)
    crow = wins2[:, 0]
    wcol = wins2[:, 1]
    tier = wins2[:, 2]

    pad_w = -canvas.shape[1] % 8
    canvas = jnp.pad(canvas, ((0, BAND_R - BUF_ROWS), (0, pad_w),
                              (0, 0)))
    rtot = canvas.shape[0]

    # overflow RoIs are repooled exactly by the hybrid fix-up — park
    # them in band 0 so they don't mint extra bands.
    crow0 = jnp.where(ovr, 0, crow)
    sr = jnp.where(tier == 3, 16, 32)
    trow = jnp.minimum(crow0 // sr * sr, rtot - BAND_R)
    roff = crow0 - trow                     # window start within band

    # band "slot" index on the static 16-row grid (trow is always a
    # multiple of 16) bounds the number of distinct bands.
    nbs = rtot // 16 + 1
    np_total = (n + nbs * (g_rois - 1) + g_rois - 1) // g_rois * g_rois
    ng = np_total // g_rois

    if not legacy:
        bslot = trow // 16                                  # [n]
        iota_b = jnp.arange(nbs, dtype=jnp.int32)
        # one vectorized [nbs, n] compare-sum replaces the scatter-add
        counts = jnp.sum(
            (bslot[None, :] == iota_b[:, None]).astype(jnp.int32),
            axis=1)
        padded = (counts + g_rois - 1) // g_rois * g_rois
        # mint padded_b - counts_b (< g_rois) hole rows per band, keyed
        # 2*b+1 (after band b's reals at 2*b); non-existent holes and
        # the static tail sort to the end with key BIG and trow -1, so
        # their groups drop out of the per-group max below — exactly
        # the legacy hole semantics.
        big = jnp.int32(2 ** 30)
        hgrid = jnp.arange(g_rois - 1, dtype=jnp.int32)[None, :]
        hole_live = hgrid < (padded - counts)[:, None]      # [nbs, g-1]
        hole_key = jnp.where(hole_live, iota_b[:, None] * 2 + 1,
                             big).reshape(-1)
        tail = np_total - n - hole_key.shape[0]
        assert tail >= 0
        key = jnp.concatenate([
            bslot * 2, hole_key, jnp.full((tail,), big, jnp.int32)])
        nh = np_total - n

        def ext(x, fill, dt):
            return jnp.concatenate(
                [x.astype(dt), jnp.full((nh,), fill, dt)])

        if lite:
            # "@sortlite": sort only (key, source-iota) — the sort's
            # compare-exchange passes move EVERY operand, so cutting
            # the payload from 14 lanes to 2 cuts the sort bytes 7x —
            # then place the 12 descriptor fields with ONE [np, 12]
            # row gather by the sorted source index (~30 ns/row).
            # Field values, hole fills and tie order are identical to
            # the multi-operand sort below (stability + unique iota).
            _, src = jax.lax.sort(
                [key, jnp.arange(np_total, dtype=jnp.int32)],
                num_keys=1, is_stable=True)
            table = jnp.concatenate([
                jnp.stack([tier, wcol, roff], -1).astype(jnp.float32),
                geom2.astype(jnp.float32),
                trow[:, None].astype(jnp.float32)], -1)   # [n, 12]
            hole_row = jnp.concatenate([
                jnp.zeros((11,), jnp.float32),
                jnp.full((1,), -1.0, jnp.float32)])
            table = jnp.concatenate(
                [table, jnp.broadcast_to(hole_row, (nh, 12))])
            packed = table[src]                           # [np, 12]
            rdesc = packed[:, :3].astype(jnp.int32)
            geom_p = packed[:, 3:11].astype(geom2.dtype)
            pos_trow = packed[:, 11].astype(jnp.int32)
            # inverse permutation: reals carry src < n, holes >= n, so
            # sorting (src, iota) puts dest-of-real-i at position i
            _, positions = jax.lax.sort(
                [src, jnp.arange(np_total, dtype=jnp.int32)],
                num_keys=1, is_stable=True)
            dest_of_orig = positions[:n]
        else:
            sorted_ops = jax.lax.sort(
                [key,
                 ext(tier, 0, jnp.int32), ext(wcol, 0, jnp.int32),
                 ext(roff, 0, jnp.int32)]
                + [ext(geom2[:, k], 0.0, geom2.dtype) for k in range(8)]
                + [ext(trow, -1, jnp.int32),
                   ext(jnp.arange(n, dtype=jnp.int32), big, jnp.int32)],
                num_keys=1, is_stable=True)
            rdesc = jnp.stack(sorted_ops[1:4], -1)          # [np, 3] i32
            geom_p = jnp.stack(sorted_ops[4:12], -1)        # [np, 8] f32
            pos_trow = sorted_ops[12]
            orig_s = sorted_ops[13]
            # inverse permutation (original RoI -> padded position) via a
            # second 2-operand sort instead of a [n]-row scatter
            _, positions = jax.lax.sort(
                [orig_s, jnp.arange(np_total, dtype=jnp.int32)],
                num_keys=1, is_stable=True)
            dest_of_orig = positions[:n]

        g_trow = jnp.max(pos_trow.reshape(ng, g_rois), axis=1)
        g_valid = g_trow >= 0
        g_first = jnp.concatenate([
            g_valid[:1],
            (g_trow[1:] != g_trow[:-1]) & g_valid[1:]])
        dix = jnp.cumsum(g_first.astype(jnp.int32)) - 1
        slot = jnp.maximum(dix, 0) % 2
        fpg = jnp.zeros((ng,), jnp.int32).at[
            jnp.where(g_first, dix, ng)].set(
                jnp.arange(ng, dtype=jnp.int32), mode="drop")
        has_next = dix < dix[-1]
        npos = fpg[jnp.clip(dix + 1, 0, ng - 1)]
        g_trow0 = jnp.maximum(g_trow, 0)
        gdesc = jnp.stack([
            g_trow0, slot, g_first.astype(jnp.int32),
            (g_first & has_next).astype(jnp.int32), g_trow0[npos],
        ], axis=-1).astype(jnp.int32).reshape(-1)
        return (canvas, gdesc, rdesc.reshape(-1), geom_p.reshape(-1),
                dest_of_orig, ovr)

    perm = jnp.argsort(trow)                # band-sorted RoIs
    ks = trow[perm]

    bslot = ks // 16                                        # [n]
    counts = jnp.zeros((nbs,), jnp.int32).at[bslot].add(1)
    padded = (counts + g_rois - 1) // g_rois * g_rois
    starts = jnp.cumsum(padded) - padded                    # exclusive
    bstart = jnp.full((nbs,), n, jnp.int32).at[bslot].min(
        jnp.arange(n, dtype=jnp.int32))     # first sorted pos per band
    dest = starts[bslot] + (jnp.arange(n, dtype=jnp.int32)
                            - bstart[bslot])                # [n]

    # per-RoI fields at padded positions (holes: tier 0 window at
    # (0, 0) of the resident band — finite garbage, sliced off below).
    # ONE packed [n, 12] f32 scatter instead of three (rdesc, geom,
    # pos_trow): TPU scatters serialize per ROW regardless of width,
    # so packing the columns cuts the prep's scatter latency ~3x. The
    # int fields (tier, wcol, roff, trow) are < 2^24 and round-trip
    # f32 exactly. Hole rows: cols 0..10 zero, col 11 (trow) -1 so
    # hole-only groups drop out of the per-group max below.
    packed_src = jnp.concatenate([
        jnp.stack([tier, wcol, roff], -1)[perm].astype(jnp.float32),
        geom2[perm].astype(jnp.float32),
        ks[:, None].astype(jnp.float32)], -1)            # [n, 12]
    packed = jnp.concatenate([
        jnp.zeros((np_total, 11), jnp.float32),
        jnp.full((np_total, 1), -1.0, jnp.float32)], -1)
    packed = packed.at[dest].set(packed_src)
    rdesc = packed[:, :3].astype(jnp.int32)
    geom_p = packed[:, 3:11].astype(geom2.dtype)

    # per-GROUP band bookkeeping (holes contribute -1 and drop out of
    # the max; fully-empty tail groups get first=0 -> no DMA)
    pos_trow = packed[:, 11].astype(jnp.int32)
    g_trow = jnp.max(pos_trow.reshape(ng, g_rois), axis=1)
    g_valid = g_trow >= 0
    g_first = jnp.concatenate([
        g_valid[:1],
        (g_trow[1:] != g_trow[:-1]) & g_valid[1:]])
    dix = jnp.cumsum(g_first.astype(jnp.int32)) - 1
    slot = jnp.maximum(dix, 0) % 2
    fpg = jnp.zeros((ng,), jnp.int32).at[
        jnp.where(g_first, dix, ng)].set(
            jnp.arange(ng, dtype=jnp.int32), mode="drop")
    has_next = dix < dix[-1]
    npos = fpg[jnp.clip(dix + 1, 0, ng - 1)]
    g_trow0 = jnp.maximum(g_trow, 0)
    gdesc = jnp.stack([
        g_trow0, slot, g_first.astype(jnp.int32),
        (g_first & has_next).astype(jnp.int32), g_trow0[npos],
    ], axis=-1).astype(jnp.int32).reshape(-1)

    dest_of_orig = jnp.zeros((n,), jnp.int32).at[perm].set(dest)
    return (canvas, gdesc, rdesc.reshape(-1), geom_p.reshape(-1),
            dest_of_orig, ovr)


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                   "image_size", "interpret", "debug",
                                   "fold", "return_overflow", "xalign"))
def multiscale_roi_align_bands_grouped(
    features: Sequence[jnp.ndarray],   # per level [B, H_l, W_l, C]
    boxes: jnp.ndarray,                # [B, N, 4] xyxy image coords
    image_size: tuple,
    output_size: tuple = (7, 7),
    sampling_ratio: int = 2,
    interpret: bool = False,
    prep=None,
    debug: str = "full",
    fold: str = "rows",
    return_overflow: bool = False,
    xalign: int = 8,
) -> jnp.ndarray:
    """Grouped band-sorted pooler: -> [B, N, oh, ow, C]. Same coverage
    and overflow semantics as :func:`multiscale_roi_align_bands`
    (route through the hybrid for exact extreme-aspect handling).
    ``xalign=16`` aligns window reads to the bf16 tile grid (_prep)."""
    bsz, n = boxes.shape[:2]
    c = features[0].shape[-1]
    oh, ow = output_size
    if prep is None:
        prep = _prep_bands_grouped(features, boxes, image_size, oh, ow,
                                   sampling_ratio, xalign=xalign)
    canvas, gdesc, rdesc, geom_p, dest_of_orig, ovr = prep
    band_w = canvas.shape[1]
    np_total = rdesc.shape[0] // 3
    if debug == "prep_only":
        # in-graph attribution: descriptors + canvas built (kept live
        # by the 1e-30 sums — XLA won't fold float x*0), kernel and
        # unpermute skipped. Costs one extra full canvas read.
        keep = (jnp.sum(canvas.astype(jnp.float32))
                + jnp.sum(gdesc.astype(jnp.float32))
                + jnp.sum(rdesc.astype(jnp.float32))
                + jnp.sum(geom_p.astype(jnp.float32))
                + jnp.sum(dest_of_orig.astype(jnp.float32)))
        pooled = jnp.zeros((bsz, n, oh, ow, c), canvas.dtype)
        pooled += (keep * 1e-30).astype(canvas.dtype)
        if return_overflow:
            return pooled, ovr.reshape(bsz, n)
        return pooled
    ng = np_total // GROUP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ng,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (GROUP, oh, ow, c), lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, BAND_R, band_w, c), canvas.dtype),
            pltpu.SemaphoreType.DMA((2, NSPLIT)),
        ],
    )
    kernel = partial(_band_group_kernel, c=c, oh=oh, ow=ow,
                     srat=sampling_ratio, band_w=band_w,
                     debug="full" if debug == "noperm" else debug,
                     fold=fold, xalign=xalign)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((np_total, oh, ow, c),
                                       canvas.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(gdesc, rdesc, geom_p, canvas)
    if debug == "noperm":
        # attribution: skip the [B*N]-row unpermute gather (outputs in
        # band-sorted padded order — WRONG values, timing only)
        pooled = out[:bsz * n].reshape(bsz, n, oh, ow, c)
    else:
        pooled = out[dest_of_orig].reshape(bsz, n, oh, ow, c)
    if return_overflow:
        return pooled, ovr.reshape(bsz, n)
    return pooled


def bands_fit_vmem(features, budget_bytes=14 * 2**20):
    """True when the double-buffered full-width band fits VMEM (wide
    canvases — e.g. 1333-px R-CNN inputs — fall back to tiles)."""
    w = max(max(f.shape[2] for f in features), BUF_COLS)
    w += -w % 8
    c = features[0].shape[-1]
    return 2 * BAND_R * w * c * features[0].dtype.itemsize <= budget_bytes


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                   "image_size", "interpret",
                                   "fixup_capacity", "mode"))
def multiscale_roi_align_hybrid(
    features: Sequence[jnp.ndarray],   # per level [B, H_l, W_l, C]
    boxes: jnp.ndarray,                # [B, N, 4]
    image_size: tuple,
    output_size: tuple = (7, 7),
    sampling_ratio: int = 2,
    fixup_capacity: int = 16,
    interpret: bool = False,
    mode: str = "windows",             # "windows" | "tiled"
) -> jnp.ndarray:
    """Pallas windows for the bulk + exact XLA-gather repool of up to
    ``fixup_capacity`` window-overflow RoIs per image. Bitwise-matches
    the reference pooler whenever an image has <= capacity extreme-
    aspect RoIs (virtually always)."""
    bsz, n = boxes.shape[:2]
    oh, ow = output_size
    s = sampling_ratio
    # "@"-suffix knobs for IN-GRAPH stage attribution and alignment
    # A/Bs (analysis/frcnn_ablate.py full_pooler_* stages):
    # "bands_grouped@dma_only", "@compute_only", "@xalign16".
    debug = "full"
    xalign = 8
    legacy_prep = False
    lite_prep = False
    fold = "rows"
    if "@" in mode:
        mode, knobs = mode.split("@", 1)
        for knob in knobs.split(","):
            if knob in ("dma_only", "compute_only", "prep_only",
                        "noperm"):
                debug = knob
            elif knob.startswith("xalign"):
                xalign = int(knob[len("xalign"):])
            elif knob == "nofix":
                fixup_capacity = 0  # strip the gather repool (timing)
            elif knob == "oldprep":
                legacy_prep = True  # r4 argsort+scatter prep (A/B)
            elif knob == "sortlite":
                lite_prep = True  # 2-operand sort + row gather (A/B)
            elif knob.startswith("fold="):
                fold = knob[len("fold="):]  # rows|wide|quad|pair (A/B)
    if (mode in ("bands", "bands_grouped")
            and not bands_fit_vmem(features)):
        mode = "tiled"  # wide canvas: band buffers would blow VMEM
    if mode == "bands_grouped":
        prep = _prep_bands_grouped(features, boxes, image_size, oh, ow,
                                   s, xalign=xalign,
                                   legacy=legacy_prep, lite=lite_prep)
        out = multiscale_roi_align_bands_grouped(
            features, boxes, image_size, output_size, s,
            interpret=interpret, prep=prep, debug=debug, xalign=xalign,
            fold=fold)
    elif mode == "bands":
        prep = _prep_bands(features, boxes, image_size, oh, ow, s)
        out = multiscale_roi_align_bands(
            features, boxes, image_size, output_size, s,
            interpret=interpret, prep=prep)
    elif mode == "tiled":
        prep = _prep_tiled(features, boxes, image_size, oh, ow, s)
        out = multiscale_roi_align_tiled(
            features, boxes, image_size, output_size, s,
            interpret=interpret, prep=prep)
    else:
        prep = _prep(features, boxes, image_size, oh, ow, s)
        out = multiscale_roi_align_pallas(
            features, boxes, image_size, output_size, s,
            interpret=interpret, prep=prep)
    if fixup_capacity <= 0:
        return out

    ovr = prep[-1].reshape(bsz, n)
    k = min(fixup_capacity, n)
    _, idx = jax.lax.top_k(ovr.astype(jnp.float32), k)   # [B, k]
    sel_ovr = jnp.take_along_axis(ovr, idx, axis=1)      # [B, k]
    sel_boxes = jnp.take_along_axis(
        boxes, idx[..., None], axis=1)                   # [B, k, 4]

    fix = jax.vmap(
        lambda fs, bx: multiscale_roi_align_canvas(
            fs, bx, image_size, output_size, s)
    )(features, sel_boxes)                               # [B, k, oh, ow, C]
    fix = fix.astype(out.dtype)

    orig = jnp.take_along_axis(
        out, idx[..., None, None, None], axis=1)
    mixed = jnp.where(sel_ovr[..., None, None, None], fix, orig)
    bi = jnp.arange(bsz)[:, None]
    return out.at[bi, idx].set(mixed)
