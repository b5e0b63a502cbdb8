"""RoIAlign + MultiScaleRoIAlign (FPN) as vectorized XLA gathers.

Replaces the CUDA `torchvision.ops.roi_align` / `MultiScaleRoIAlign`
(`tvision/roi_heads.py:11,149`, `frcnn.py:207-211`) with the same math:

* aligned=False legacy semantics: box coords scaled by ``spatial_scale``
  with no half-pixel offset; each output bin averages ``sampling_ratio^2``
  bilinear samples placed at the torchvision grid positions.
* FPN level assignment (torchvision LevelMapper):
  k = floor(k0 + log2(sqrt(area)/224 + eps)), clamped to the available
  levels.

TPU design: static shapes — RoIAlign runs on every level for all N rois
and the per-roi level choice is a select, which keeps one fused program
(no ragged per-level gathers). N is the padded proposal count.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """feat [H, W, C]; ys/xs [...]: bilinear sample -> [..., C].

    torchvision bilinear_interpolate semantics: samples with y/x outside
    [-1, H] x [-1, W] return 0; coords < 0 clamp to 0.
    """
    h, w, _ = feat.shape
    outside = (ys < -1.0) | (ys > h) | (xs < -1.0) | (xs > w)
    y = jnp.clip(ys, 0.0, h - 1)
    x = jnp.clip(xs, 0.0, w - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0.astype(y.dtype))[..., None]
    lx = (x - x0.astype(x.dtype))[..., None]
    hy, hx = 1.0 - ly, 1.0 - lx
    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
    out = hy * hx * v00 + hy * lx * v01 + ly * hx * v10 + ly * lx * v11
    return jnp.where(outside[..., None], 0.0, out)


@partial(jax.jit, static_argnames=("output_size", "spatial_scale",
                                   "sampling_ratio"))
def roi_align(
    features: jnp.ndarray,     # [H, W, C]
    boxes: jnp.ndarray,        # [N, 4] xyxy in image coords
    output_size: tuple = (7, 7),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """-> [N, oh, ow, C]."""
    oh, ow = output_size
    s = sampling_ratio
    b = boxes * spatial_scale
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / ow
    bin_h = roi_h / oh

    # sample grid: for bin (i,j), sample points at
    # y = y1 + i*bin_h + (k+0.5)*bin_h/s for k in range(s)
    iy = jnp.arange(oh, dtype=features.dtype)
    ix = jnp.arange(ow, dtype=features.dtype)
    ky = (jnp.arange(s, dtype=features.dtype) + 0.5) / s
    kx = (jnp.arange(s, dtype=features.dtype) + 0.5) / s

    # ys: [N, oh, s] ; xs: [N, ow, s]
    ys = (y1[:, None, None]
          + (iy[None, :, None] + ky[None, None, :]) * bin_h[:, None, None])
    xs = (x1[:, None, None]
          + (ix[None, :, None] + kx[None, None, :]) * bin_w[:, None, None])

    # full grid [N, oh, ow, s, s]
    n = boxes.shape[0]
    ys_g = jnp.broadcast_to(ys[:, :, None, :, None], (n, oh, ow, s, s))
    xs_g = jnp.broadcast_to(xs[:, None, :, None, :], (n, oh, ow, s, s))

    samples = _bilinear_gather(features, ys_g, xs_g)  # [N,oh,ow,s,s,C]
    return jnp.mean(samples, axis=(3, 4))


def _infer_scale(feat_hw, image_size) -> float:
    """torchvision MultiScaleRoIAlign.infer_scale: the spatial scale is
    2^round(log2(feat/img)) per axis (exactly 1/stride even when the
    canvas is not stride-divisible, e.g. ceil(800/64)=13 -> 1/64), and
    both axes must agree."""
    sy = 2.0 ** float(np.round(np.log2(feat_hw[0] / image_size[0])))
    sx = 2.0 ** float(np.round(np.log2(feat_hw[1] / image_size[1])))
    assert sy == sx, (
        f"anisotropic FPN scale {sy} vs {sx} for feat {feat_hw} on "
        f"canvas {image_size}")
    return sy


def assign_fpn_levels(
    boxes: jnp.ndarray,
    num_levels: int,
    canonical_scale: int = 224,
    canonical_level: int = 4,
    min_level: int = 2,
) -> jnp.ndarray:
    """torchvision LevelMapper: [N] level index in [0, num_levels)."""
    area = jnp.clip(
        (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 0)
    k = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(area) / canonical_scale + 1e-6))
    return jnp.clip(k - min_level, 0, num_levels - 1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                   "image_size"))
def multiscale_roi_align(
    features: Sequence[jnp.ndarray],   # per level [H_l, W_l, C]
    boxes: jnp.ndarray,                # [N, 4] xyxy image coords
    image_size: tuple,                 # (H, W)
    output_size: tuple = (7, 7),
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """-> [N, oh, ow, C]. Computes RoIAlign on every level, then selects
    per-roi by the FPN level assignment (static-shape alternative to the
    reference's ragged per-level gather)."""
    num_levels = len(features)
    levels = assign_fpn_levels(boxes, num_levels)
    per_level = []
    for lvl, feat in enumerate(features):
        scale = _infer_scale(feat.shape[:2], image_size)
        per_level.append(
            roi_align(feat, boxes, output_size, scale, sampling_ratio))
    stacked = jnp.stack(per_level, axis=0)  # [L, N, oh, ow, C]
    return jnp.take_along_axis(
        stacked, levels[None, :, None, None, None], axis=0)[0]


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                   "image_size"))
def multiscale_roi_align_canvas(
    features: Sequence[jnp.ndarray],   # per level [H_l, W_l, C]
    boxes: jnp.ndarray,                # [N, 4] xyxy image coords
    image_size: tuple,
    output_size: tuple = (7, 7),
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Exact multiscale RoIAlign tuned for the TPU gather path.

    Levels are stacked into ONE [sum H_l, W_max, C] canvas (rows
    concatenated, columns zero-padded to the widest level). Each bilinear
    sample then needs two (row, x0:x0+2, :) slice-gathers — contiguous
    2*C-element runs — instead of four scattered single-row gathers, and
    all interpolation math stays in the feature dtype (bf16). This is the
    production Faster/Mask R-CNN pooler; semantics identical to
    :func:`multiscale_roi_align_flat` (torchvision MultiScaleRoIAlign,
    aligned=False, frcnn.py:207-211).
    """
    num_levels = len(features)
    c = features[0].shape[-1]
    oh, ow = output_size
    s = sampling_ratio
    n = boxes.shape[0]
    ft = features[0].dtype
    w_max = max(f.shape[1] for f in features)

    canvas = jnp.concatenate([
        jnp.pad(f, ((0, 0), (0, w_max - f.shape[1]), (0, 0)))
        for f in features], axis=0)                 # [R, Wmax, C]
    heights = jnp.asarray([f.shape[0] for f in features], jnp.float32)
    widths = jnp.asarray([f.shape[1] for f in features], jnp.float32)
    row_off = jnp.asarray(
        np.cumsum([0] + [f.shape[0] for f in features])[:-1], jnp.int32)
    scales = jnp.asarray(
        [_infer_scale(f.shape[:2], image_size) for f in features],
        jnp.float32)

    levels = assign_fpn_levels(boxes, num_levels)
    lh = heights[levels]
    lw = widths[levels]
    scale = scales[levels]
    base_row = row_off[levels]                      # [N]

    b = boxes * scale[:, None]
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / ow
    bin_h = roi_h / oh

    iy = jnp.arange(oh, dtype=jnp.float32)
    ix = jnp.arange(ow, dtype=jnp.float32)
    ky = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    ys = (y1[:, None, None]
          + (iy[None, :, None] + ky[None, None, :]) * bin_h[:, None, None])
    xs = (x1[:, None, None]
          + (ix[None, :, None] + ky[None, None, :]) * bin_w[:, None, None])
    # broadcast to the full sample grid [N, oh, ow, s, s]
    ys_g = jnp.broadcast_to(ys[:, :, None, :, None], (n, oh, ow, s, s))
    xs_g = jnp.broadcast_to(xs[:, None, :, None, :], (n, oh, ow, s, s))

    hh = lh[:, None, None, None, None]
    ww = lw[:, None, None, None, None]
    outside = (ys_g < -1.0) | (ys_g > hh) | (xs_g < -1.0) | (xs_g > ww)
    y = jnp.clip(ys_g, 0.0, hh - 1)
    x = jnp.clip(xs_g, 0.0, ww - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, (hh - 1).astype(jnp.int32))
    x1i = jnp.minimum(x0 + 1, (ww - 1).astype(jnp.int32))
    # 2x2 slice start: stays inside the level (rows never cross into the
    # next level because ys0+1 <= H_l-1; cols never read the zero pad)
    ys0 = jnp.minimum(y0, (hh - 2).astype(jnp.int32))
    xs0 = jnp.minimum(x0, (ww - 2).astype(jnp.int32))
    oy0 = y0 - ys0                                   # 0 or 1
    oy1 = y1i - ys0
    ox0 = x0 - xs0
    ox1 = x1i - xs0
    ly = (y - y0)[..., None]          # f32 interpolation weights
    lx = (x - x0)[..., None]

    br = base_row[:, None, None, None, None]

    # ONE (2, 2, C) slice-gather per bilinear sample — a contiguous
    # 2-row window holding all four corners (gather cost on TPU is
    # dominated by index-row count, not bytes).
    idx = jnp.stack([(br + ys0).reshape(-1), xs0.reshape(-1)], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    g = jax.lax.gather(
        canvas, idx, dn, slice_sizes=(2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP)
    g = g.reshape(n, oh, ow, s, s, 2, 2, c)

    def corner(oy, ox):
        row = jnp.where((oy == 0)[..., None, None], g[..., 0, :, :],
                        g[..., 1, :, :])
        return jnp.where((ox == 0)[..., None], row[..., 0, :],
                         row[..., 1, :])

    v00 = corner(oy0, ox0)
    v01 = corner(oy0, ox1)
    v10 = corner(oy1, ox0)
    v11 = corner(oy1, ox1)

    out = ((1.0 - ly) * (1.0 - lx) * v00 + (1.0 - ly) * lx * v01
           + ly * (1.0 - lx) * v10 + ly * lx * v11)
    out = jnp.where(outside[..., None], 0.0, out)
    return jnp.mean(out, axis=(3, 4))


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                   "image_size"))
def multiscale_roi_align_flat(
    features: Sequence[jnp.ndarray],   # per level [H_l, W_l, C]
    boxes: jnp.ndarray,                # [N, 4] xyxy image coords
    image_size: tuple,
    output_size: tuple = (7, 7),
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Exact multiscale RoIAlign without per-level redundancy.

    All levels are flattened into one [sum H_l*W_l, C] buffer; each RoI's
    bilinear sample indices are computed in its assigned level's
    coordinate frame and offset into the flat buffer, so there is ONE
    gather pass instead of len(levels) RoIAligns + select (the
    :func:`multiscale_roi_align` fallback computes every level).
    """
    num_levels = len(features)
    c = features[0].shape[-1]
    oh, ow = output_size
    s = sampling_ratio
    n = boxes.shape[0]

    heights = jnp.asarray([f.shape[0] for f in features], jnp.float32)
    widths = jnp.asarray([f.shape[1] for f in features], jnp.float32)
    offsets = jnp.asarray(
        np.cumsum([0] + [f.shape[0] * f.shape[1] for f in features])[:-1],
        jnp.int32)
    flat = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)

    # torchvision spatial scales: exactly 1/stride per level (see
    # _infer_scale), selected per-roi by FPN level assignment
    scales = jnp.asarray(
        [_infer_scale(f.shape[:2], image_size) for f in features],
        jnp.float32)
    levels = assign_fpn_levels(boxes, num_levels)
    lh = heights[levels]          # [N]
    lw = widths[levels]
    scale = scales[levels]
    off = offsets[levels]         # [N]

    b = boxes * scale[:, None]
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / ow
    bin_h = roi_h / oh

    iy = jnp.arange(oh, dtype=jnp.float32)
    ix = jnp.arange(ow, dtype=jnp.float32)
    ky = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    ys = (y1[:, None, None]
          + (iy[None, :, None] + ky[None, None, :]) * bin_h[:, None, None])
    xs = (x1[:, None, None]
          + (ix[None, :, None] + ky[None, None, :]) * bin_w[:, None, None])
    ys_g = jnp.broadcast_to(ys[:, :, None, :, None], (n, oh, ow, s, s))
    xs_g = jnp.broadcast_to(xs[:, None, :, None, :], (n, oh, ow, s, s))

    hh = lh[:, None, None, None, None]
    ww = lw[:, None, None, None, None]
    outside = (ys_g < -1.0) | (ys_g > hh) | (xs_g < -1.0) | (xs_g > ww)
    y = jnp.clip(ys_g, 0.0, hh - 1)
    x = jnp.clip(xs_g, 0.0, ww - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, (hh - 1).astype(jnp.int32))
    x1i = jnp.minimum(x0 + 1, (ww - 1).astype(jnp.int32))
    ly = (y - y0)[..., None]
    lx = (x - x0)[..., None]

    w_i = lw.astype(jnp.int32)[:, None, None, None, None]
    base = off[:, None, None, None, None]

    def at(yi, xi):
        return flat[base + yi * w_i + xi]

    v00 = at(y0, x0)
    v01 = at(y0, x1i)
    v10 = at(y1i, x0)
    v11 = at(y1i, x1i)
    out = ((1 - ly) * (1 - lx) * v00 + (1 - ly) * lx * v01
           + ly * (1 - lx) * v10 + ly * lx * v11)
    out = jnp.where(outside[..., None], 0.0, out)
    return jnp.mean(out, axis=(3, 4))


def _pool_canvas_batched(features, boxes, image_size, output_size,
                         sampling_ratio):
    return jax.vmap(
        lambda fs, bx: multiscale_roi_align_canvas(
            fs, bx, image_size, output_size, sampling_ratio)
    )(tuple(features), boxes)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _pool_pallas(features, boxes, image_size, output_size,
                 sampling_ratio, interpret=False, mode="windows"):
    """Pallas window-DMA pooler with a differentiable backward.

    pallas_call has no VJP, so jax.grad through the raw kernel raises;
    R-CNN training differentiates through the pooler (trainer step over
    FasterRCNN/MaskRCNN/KeypointRCNN train=True branches). Forward runs
    the fast Pallas hybrid; backward is the VJP of the numerically
    identical canvas-gather formulation (same math, XLA scatter-add)."""
    from object_detectors_tpu.kernels.roi_align_pallas import (
        multiscale_roi_align_hybrid,
    )

    return multiscale_roi_align_hybrid(
        tuple(features), boxes, image_size, output_size, sampling_ratio,
        interpret=interpret, mode=mode)


def _pool_pallas_fwd(features, boxes, image_size, output_size,
                     sampling_ratio, interpret=False, mode="windows"):
    out = _pool_pallas(features, boxes, image_size, output_size,
                       sampling_ratio, interpret, mode)
    return out, (tuple(features), boxes)


def _pool_pallas_bwd(image_size, output_size, sampling_ratio, interpret,
                     mode, res, g):
    """Backward = canvas-formulation VJP, CHUNKED over the RoI dim.

    The canvas VJP materializes a [B, N, oh, ow, s, s, 2, 2, C] tap
    outer-product temp — at Mask R-CNN train shapes (512 RoIs, 14x14
    pool) that is 6.1 GB and the whole-N backward OOMed 15.75 GB of
    HBM (31.6 GB requested). Per-RoI contributions to the feature
    cotangent are additive, so a lax.scan over 64-RoI chunks bounds the
    temp at ~0.8 GB; feature grads accumulate in f32."""
    features, boxes = res
    b, n = boxes.shape[:2]
    chunk = min(n, 64)
    pad = -n % chunk
    bp = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, pad)) + ((0, 0),) * (g.ndim - 2))
    nck = (n + pad) // chunk
    bs_ = jnp.moveaxis(bp.reshape(b, nck, chunk, 4), 1, 0)
    gs_ = jnp.moveaxis(
        gp.reshape((b, nck, chunk) + g.shape[2:]), 1, 0)

    def step(fbar, inp):
        bx, gc = inp
        primal, vjp = jax.vjp(
            lambda fs, bxx: _pool_canvas_batched(
                fs, bxx, image_size, output_size, sampling_ratio),
            features, bx)
        df, db = vjp(gc.astype(primal.dtype))
        fbar = tuple(a + d.astype(jnp.float32)
                     for a, d in zip(fbar, df))
        return fbar, db

    f0 = tuple(jnp.zeros(f.shape, jnp.float32) for f in features)
    fbar, dbs = jax.lax.scan(step, f0, (bs_, gs_))
    df = tuple(a.astype(f.dtype) for a, f in zip(fbar, features))
    db = jnp.moveaxis(dbs, 0, 1).reshape(b, n + pad, 4)[:, :n]
    return df, db


_pool_pallas.defvjp(_pool_pallas_fwd, _pool_pallas_bwd)


def pool_multiscale(features, boxes, image_size, output_size=(7, 7),
                    sampling_ratio: int = 2, method: str = "auto"):
    """Batched pooler dispatch: features per level [B, H_l, W_l, C],
    boxes [B, N, 4] -> [B, N, oh, ow, C].

    method "auto" picks the Pallas window kernel (+exact gather fix-up,
    kernels/roi_align_pallas.py) on real TPUs and the XLA canvas gather
    elsewhere (CPU tests, interpret-unfriendly paths). All variants are
    numerically identical up to the Pallas output cast to the feature
    dtype (tests/test_roi_align_pallas.py); the canvas path stays f32.
    The Pallas path is differentiable via a custom VJP whose backward is
    the canvas formulation's VJP."""
    import jax as _jax

    if method == "auto":
        platform = _jax.devices()[0].platform
        method = "pallas" if platform == "tpu" else "canvas"
    if method == "dummy":
        # Leave-one-out ablation support (analysis/frcnn_ablate.py):
        # same output shape/dtype at ~zero cost, so (full graph) minus
        # (full graph with dummy pooler) is the pooler's true marginal
        # cost IN CONTEXT — cumulative-prefix timing can't see overlap.
        b, n = boxes.shape[:2]
        oh, ow = output_size
        c = features[0].shape[-1]
        cell = jax.lax.slice(features[0], (0, 0, 0, 0),
                             (b, oh, ow, c))          # [B, oh, ow, C]
        scale = (boxes[..., 2] - boxes[..., 0])[..., None, None, None]
        return cell[:, None] * (1.0 + 0.0 * scale).astype(cell.dtype)
    if method.startswith("pallas"):
        interpret = method.endswith("_interpret")  # CPU parity tests
        # default Pallas mode: the grouped-bands kernel (round 4 —
        # measured 7.24 vs 10.22 ms for the per-RoI window kernel at
        # bs8 x 1000 RoIs; the hybrid falls back to tiled when the
        # full-width band would not fit VMEM, e.g. f32 train canvases)
        mode = "bands_grouped"
        if method.startswith("pallas_windows"):
            mode = "windows"
        elif method.startswith("pallas_tiled"):
            mode = "tiled"
        elif method.startswith("pallas_bands_grouped"):
            mode = "bands_grouped"
        elif method.startswith("pallas_bands"):
            mode = "bands"
        if "@" in method:
            # carry "@knob" suffixes (dma_only/compute_only/xalignN)
            # to the hybrid for in-graph attribution A/Bs
            mode += "@" + method.split("@", 1)[1]
        # SMEM holds the per-RoI scalar-prefetch descriptors (11 words/
        # RoI); v5e SMEM is 1 MiB, so >~16k RoIs per kernel OOMs at
        # compile (bs32 x 1000 proposals did). Chunk the BATCH dim —
        # RoIs are independent and each chunk preps its own canvas.
        bsz, n = boxes.shape[:2]
        per = max(1, 16000 // max(n, 1))
        if bsz > per:
            outs = [
                _pool_pallas(tuple(f[i:i + per] for f in features),
                             boxes[i:i + per], image_size,
                             tuple(output_size), sampling_ratio,
                             interpret, mode)
                for i in range(0, bsz, per)]
            return jnp.concatenate(outs, 0)
        return _pool_pallas(tuple(features), boxes, image_size,
                            tuple(output_size), sampling_ratio, interpret,
                            mode)
    pool = {"canvas": multiscale_roi_align_canvas,
            "flat": multiscale_roi_align_flat}[method]
    return jax.vmap(
        lambda fs, bx: pool(fs, bx, image_size, output_size,
                            sampling_ratio))(tuple(features), boxes)
