"""Fused image preprocessing kernel.

The reference's preprocessing is a chain of host ops (cv2 resize, /255,
mean/std normalize — `yolo/dsets/transformations.py:10-53`). On TPU the
normalize/cast/layout part belongs on-device fused into ONE HBM pass
(BASELINE.json north star: "image decode, letterbox/resize, and
normalization fuse into a single Pallas preprocessing kernel"):

* uint8 NHWC images -> (x/255 - mean)/std -> bfloat16, one read + one
  write per pixel (XLA would also fuse this chain, but the kernel
  guarantees it and gives us the place to fold in layout tweaks).
* rows are tiled so arbitrary H fits VMEM.

``preprocess_images`` dispatches to the kernel on TPU and to the
identical jnp expression elsewhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from object_detectors_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

_MEAN = tuple(float(x) for x in IMAGENET_MEAN)
_STD = tuple(float(x) for x in IMAGENET_STD)


def _kernel(img_ref, out_ref):
    # Blocks are [rb, W*3] so the lane dim is wide (a trailing dim of 3
    # would waste 125/128 lanes). Channel pattern via iota % 3; only
    # python-float constants — pallas kernels cannot capture ARRAY
    # constants (that raised and silently fell back to XLA until r3).
    # Mosaic has no direct uint8->f32 cast (r3: this raised at LOWERING
    # time, i.e. outside any eager try/except when traced under an outer
    # jit) — widen through int32 first.
    x = img_ref[...].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    ch = jax.lax.broadcasted_iota(jnp.int32, x.shape,
                                  x.ndim - 1) % 3
    mean = jnp.where(ch == 0, _MEAN[0],
                     jnp.where(ch == 1, _MEAN[1], _MEAN[2]))
    inv = jnp.where(ch == 0, 1.0 / _STD[0],
                    jnp.where(ch == 1, 1.0 / _STD[1], 1.0 / _STD[2]))
    out_ref[...] = ((x - mean) * inv).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("out_dtype", "row_block"))
def preprocess_images_pallas(images: jnp.ndarray,
                             out_dtype=jnp.bfloat16,
                             row_block: int = 64) -> jnp.ndarray:
    """[B, H, W, 3] uint8 -> normalized [B, H, W, 3] out_dtype."""
    b, h, w, c = images.shape
    rb = min(row_block, h)
    flat = images.reshape(b, h, w * c)
    # cdiv grid: Pallas masks the ragged tail block, so a prime H no
    # longer degrades the row block to 1 (ADVICE r2 perf cliff)
    grid = (b, -(-h // rb))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(flat.shape, out_dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((1, rb, w * c),
                               lambda bi, ri: (bi, ri, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rb, w * c),
                               lambda bi, ri: (bi, ri, 0),
                               memory_space=pltpu.VMEM),
    )(flat)
    return out.reshape(b, h, w, c)


@partial(jax.jit, static_argnames=("out_dtype",))
def preprocess_images_xla(images: jnp.ndarray,
                          out_dtype=jnp.bfloat16) -> jnp.ndarray:
    x = images.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
    return x.astype(out_dtype)


_pallas_ok: bool | None = None


def _probe_pallas() -> bool:
    """Compile+run the kernel ONCE on a tiny shape, eagerly.

    A try/except around the traced call cannot catch kernel problems
    when ``preprocess_images`` runs under an OUTER jit — Mosaic lowering
    happens at outer-jit compile time, outside the except (this is
    exactly how the r3 uint8->f32 cast bug crashed bench.py instead of
    falling back). Probing eagerly makes the dispatch decision a real
    runtime fact, and the log line makes a fallback loud."""
    global _pallas_ok
    if _pallas_ok is None:
        try:
            x = jnp.zeros((1, 8, 128, 3), jnp.uint8)
            jax.block_until_ready(preprocess_images_pallas(x))
            _pallas_ok = True
        except Exception:  # pragma: no cover — compile fallback
            _pallas_ok = False
            import logging

            logging.getLogger(__name__).warning(
                "pallas preprocess failed; using XLA path", exc_info=True)
    return _pallas_ok


def preprocess_images(images, out_dtype=jnp.bfloat16):
    """Normalize a uint8 batch on-device; Pallas on TPU, XLA elsewhere."""
    if jax.devices()[0].platform == "tpu" and _probe_pallas():
        return preprocess_images_pallas(images, out_dtype)
    return preprocess_images_xla(images, out_dtype)


def cubic_kernel(t, a: float = -0.75):
    """Cubic convolution kernel (Keys). a=-0.75 matches cv2 INTER_CUBIC
    and PyTorch bicubic — the reference's resize
    (`yolo/dsets/transformations.py:29`)."""
    at = jnp.abs(t)
    return jnp.where(
        at <= 1.0, ((a + 2.0) * at - (a + 3.0)) * at * at + 1.0,
        jnp.where(at < 2.0,
                  a * (((at - 5.0) * at + 8.0) * at - 4.0), 0.0))


def bicubic_rows(scale, limit, n_in: int, n_out: int):
    """[n_out, n_in] bicubic sampling matrix for a (possibly traced)
    scale/limit: output row i samples input at (i + 0.5) * scale - 0.5,
    4 taps at floor-1..floor+2 clamped to [0, limit) (border
    replication). ``limit`` <= n_in masks a valid prefix of a padded
    canvas; static shapes throughout."""
    i = jnp.arange(n_out, dtype=jnp.float32)
    center = (i + 0.5) * scale - 0.5
    i0 = jnp.floor(center)
    t = center - i0
    ws = jnp.stack([cubic_kernel(t + 1.0), cubic_kernel(t),
                    cubic_kernel(t - 1.0), cubic_kernel(t - 2.0)], -1)
    taps = jnp.clip(i0[:, None] + jnp.arange(-1.0, 3.0)[None, :],
                    0.0, limit - 1.0)                     # [n_out, 4]
    m = jnp.arange(n_in, dtype=jnp.float32)
    return jnp.sum(
        ws[:, :, None] * (taps[:, :, None] == m[None, None, :]),
        axis=1)                                           # [n_out, n_in]


@partial(jax.jit, static_argnames=("out_dim", "out_dtype"))
def resize_normalize_from_canvas(canvas: jnp.ndarray, sizes: jnp.ndarray,
                                 out_dim: int,
                                 out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Batched per-image square resize + normalize, fully on device.

    canvas: [B, Hc, Wc, 3] uint8 — each image decoded on the host and
    placed top-left at its NATIVE resolution (host keeps only JPEG
    decode, per the BASELINE.json north star). sizes: [B, 2] (h, w) true
    sizes. Each image bicubic-resizes (a=-0.75, the reference's cv2
    INTER_CUBIC square-resize semantics, transformations.py:29) from its
    own (h, w) to (out_dim, out_dim) via two matmuls against per-image
    sampling matrices — per-image scale changes only the matrix values,
    never the shapes — then /255 + ImageNet-normalize fuse into the
    epilogue."""
    b, hc, wc, c = canvas.shape
    h = sizes[:, 0].astype(jnp.float32)
    w = sizes[:, 1].astype(jnp.float32)
    ky = jax.vmap(lambda hh: bicubic_rows(hh / out_dim, hh, hc,
                                          out_dim))(h)   # [B, out, Hc]
    kx = jax.vmap(lambda ww: bicubic_rows(ww / out_dim, ww, wc,
                                          out_dim))(w)   # [B, out, Wc]
    x = canvas.astype(jnp.float32)
    x = jnp.einsum("boh,bhwc->bowc", ky, x)
    x = jnp.einsum("bowc,bpw->bopc", x, kx)
    x = (x * (1.0 / 255.0) - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
    return x.astype(out_dtype)


def bilinear_rows(ratio, limit, n_in: int, n_out: int, n_valid):
    """[n_out, n_in] bilinear sampling matrix with masked valid rows.

    Output row i (for i < n_valid) samples the input at
    (i + 0.5) * ratio - 0.5 with 2 taps clamped to [0, limit)
    (edge replication) — torch ``F.interpolate(bilinear,
    align_corners=False)`` / cv2 INTER_LINEAR center semantics, the
    GeneralizedRCNNTransform resize (transform.py:150-173). Rows
    >= n_valid are all-zero (the pad region of a static canvas).
    ``ratio``/``limit``/``n_valid`` may be traced; shapes are static."""
    i = jnp.arange(n_out, dtype=jnp.float32)
    center = (i + 0.5) * ratio - 0.5
    i0 = jnp.floor(center)
    t = center - i0
    ws = jnp.stack([1.0 - t, t], -1)                       # [n_out, 2]
    taps = jnp.clip(i0[:, None] + jnp.arange(0.0, 2.0)[None, :],
                    0.0, limit - 1.0)                      # [n_out, 2]
    m = jnp.arange(n_in, dtype=jnp.float32)
    rows = jnp.sum(ws[:, :, None] * (taps[:, :, None] == m[None, None, :]),
                   axis=1)                                 # [n_out, n_in]
    return jnp.where((i < n_valid)[:, None], rows, 0.0)


@partial(jax.jit,
         static_argnames=("out_hw", "min_size", "max_size", "out_dtype"))
def rcnn_resize_normalize_from_canvas(canvas: jnp.ndarray,
                                      sizes: jnp.ndarray, out_hw: tuple,
                                      min_size: int = 800,
                                      max_size: int = 1333,
                                      out_dtype=jnp.float32,
                                      min_sizes: jnp.ndarray | None = None):
    """Device-side GeneralizedRCNNTransform ingest: uint8 native-
    resolution canvas -> per-image aspect-preserving bilinear resize +
    /255 + ImageNet normalize + zero pad, one jitted program.

    canvas: [B, Hc, Wc, 3] uint8, each image decoded on the host and
    placed top-left at NATIVE resolution (host keeps only JPEG decode).
    sizes: [B, 2] (h, w) true sizes. Per image the reference's resize
    rule (transform.py:150-173: scale = min_size/min side, capped by
    max_size/max side — here also by the static canvas) picks the
    target (nh, nw) = round(scale * (h, w)); the resize runs as two
    batched matmuls against per-image sampling matrices (per-image
    scale changes matrix VALUES, never shapes — MXU-friendly, no
    gathers), then normalize, then the region beyond (nh, nw) is
    zeroed exactly like the pad of ``data/transforms.rcnn_resize``.

    ``min_sizes`` (optional, traced [B] f32/i32) overrides the static
    ``min_size`` PER IMAGE — the train path draws a random min-size per
    image when a tuple is configured (transform.py:150-157); the host
    loader passes its drawn values so GT scaling and the device resize
    agree exactly.

    Returns (images [B, ph, pw, 3] out_dtype, new_sizes [B, 2] i32,
    scales [B] f32). Numerics note: this resizes in f32 where the host
    path round-trips through cv2's uint8 output — the device path
    matches the reference (which normalizes f32 then interpolates,
    transform.py:129-173) MORE closely than our host path does."""
    b, hc, wc, c = canvas.shape
    ph, pw = out_hw
    h = sizes[:, 0].astype(jnp.float32)
    w = sizes[:, 1].astype(jnp.float32)
    ms = (jnp.asarray(min_sizes, jnp.float32) if min_sizes is not None
          else min_size)
    scale = jnp.minimum(ms / jnp.minimum(h, w),
                        max_size / jnp.maximum(h, w))
    scale = jnp.minimum(scale, jnp.minimum(ph / h, pw / w))
    nh = jnp.round(h * scale)
    nw = jnp.round(w * scale)
    ky = jax.vmap(lambda hh, nn: bilinear_rows(hh / nn, hh, hc, ph, nn))(
        h, nh)                                             # [B, ph, Hc]
    kx = jax.vmap(lambda ww, nn: bilinear_rows(ww / nn, ww, wc, pw, nn))(
        w, nw)                                             # [B, pw, Wc]
    x = canvas.astype(jnp.float32)
    x = jnp.einsum("boh,bhwc->bowc", ky, x)
    x = jnp.einsum("bowc,bpw->bopc", x, kx)
    x = (x * (1.0 / 255.0) - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
    valid = ((jnp.arange(ph)[None, :, None] < nh[:, None, None]) &
             (jnp.arange(pw)[None, None, :] < nw[:, None, None]))
    x = jnp.where(valid[..., None], x, 0.0)
    new_sizes = jnp.stack([nh, nw], -1).astype(jnp.int32)
    return x.astype(out_dtype), new_sizes, scale


@partial(jax.jit, static_argnames=("out_hw", "out_dtype", "antialias"))
def resize_normalize_images(images: jnp.ndarray, out_hw: tuple,
                            out_dtype=jnp.bfloat16,
                            antialias: bool = False) -> jnp.ndarray:
    """Fused on-device resize + normalize: uint8 [B, H0, W0, 3] ->
    bilinear resize to out_hw -> /255 -> ImageNet normalize -> out_dtype,
    one jitted program (XLA lowers the separable bilinear resize to two
    contractions that run on the MXU; the normalize fuses into the
    epilogue). This moves the reference's host cv2 resize
    (`transformations.py:29`) on-device — only JPEG *decode* stays on the
    host (no decode hardware on TPU). BASELINE.json north-star item."""
    b, h0, w0, c = images.shape
    x = images.astype(jnp.float32)
    x = jax.image.resize(x, (b, out_hw[0], out_hw[1], c), "bilinear",
                         antialias=antialias)
    x = (x * (1.0 / 255.0) - jnp.asarray(_MEAN)) \
        / jnp.asarray(_STD)
    return x.astype(out_dtype)
