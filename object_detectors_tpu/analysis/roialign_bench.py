"""Multiscale RoIAlign microbenchmark on the real chip.

Compares the candidate pooler implementations at the Faster R-CNN eval
shape (bs x 1000 RoIs, FPN 256ch, 640^2 canvas) plus a `noop` stage that
measures the relay's fixed per-iteration host-read sync cost — subtract
it from every number (BASELINE.md methodology).

Usage: python -m object_detectors_tpu.analysis.roialign_bench [--bs 8]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from object_detectors_tpu.ops import roi_align as R  # noqa: E402


def time_fn(fn, *args, warmup=2, iters=20):
    """Async back-to-back dispatch with ONE final host read (the
    per-iteration host-read sync costs ~28ms of relay RPC and is very
    noisy — BASELINE.md methodology)."""
    jf = jax.jit(fn)
    for _ in range(warmup):
        float(jf(*args))
    t0 = time.perf_counter()
    outs = [jf(*args) for _ in range(iters)]
    s = float(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    del s, outs
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--rois", type=int, default=1000)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--ch", type=int, default=256)
    ap.add_argument("--variants", nargs="*", default=None)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    feats = tuple(
        jnp.asarray(rng.randn(args.bs, args.size // st, args.size // st,
                              args.ch).astype(np.float32),
                    jnp.bfloat16)
        for st in (4, 8, 16, 32))
    xy = rng.rand(args.bs, args.rois, 2) * (args.size - 40)
    wh = rng.rand(args.bs, args.rois, 2) * 300 + 8
    boxes = jnp.asarray(
        np.clip(np.concatenate([xy, xy + wh], -1), 0, args.size)
        .astype(np.float32))
    img = (args.size, args.size)

    def noop(fs, bx):
        return jnp.sum(bx) + sum(jnp.sum(f[0, 0, 0]. astype(jnp.float32))
                                 for f in fs)

    def run_variant(pool):
        def f(fs, bx):
            out = jax.vmap(
                lambda ff, bb: pool(ff, bb, img, (7, 7)))(fs, bx)
            return jnp.sum(out.astype(jnp.float32))
        return f

    from object_detectors_tpu.kernels.roi_align_pallas import (
        multiscale_roi_align_hybrid, multiscale_roi_align_pallas,
    )

    def pallas_fn(fs, bx):
        return jnp.sum(multiscale_roi_align_pallas(fs, bx, img, (7, 7)))

    def pallas_mm2(fs, bx):
        return jnp.sum(multiscale_roi_align_pallas(fs, bx, img, (7, 7),
                                                   fold="mm2"))

    def pallas_dbg(mode):
        def f(fs, bx):
            return jnp.sum(multiscale_roi_align_pallas(
                fs, bx, img, (7, 7), debug=mode))
        return f

    def hybrid_fn(fs, bx):
        return jnp.sum(multiscale_roi_align_hybrid(fs, bx, img, (7, 7)))

    from object_detectors_tpu.kernels.roi_align_pallas import (
        multiscale_roi_align_tiled,
    )

    def tiled_fn(fold="rows", debug="full"):
        def f(fs, bx):
            return jnp.sum(multiscale_roi_align_tiled(
                fs, bx, img, (7, 7), fold=fold, debug=debug))
        return f

    def hybrid_tiled(fs, bx):
        return jnp.sum(multiscale_roi_align_hybrid(fs, bx, img, (7, 7),
                                                   mode="tiled"))

    from object_detectors_tpu.kernels.roi_align_pallas import (
        multiscale_roi_align_bands,
    )

    def bands_fn(debug="full"):
        def f(fs, bx):
            return jnp.sum(multiscale_roi_align_bands(
                fs, bx, img, (7, 7), debug=debug))
        return f

    def hybrid_bands(fs, bx):
        return jnp.sum(multiscale_roi_align_hybrid(fs, bx, img, (7, 7),
                                                   mode="bands"))

    from object_detectors_tpu.kernels.roi_align_pallas import (
        multiscale_roi_align_bands_grouped,
    )

    def grouped_fn(debug="full", fold="quad", xalign=8):
        def f(fs, bx):
            return jnp.sum(multiscale_roi_align_bands_grouped(
                fs, bx, img, (7, 7), debug=debug, fold=fold,
                xalign=xalign))
        return f

    def hybrid_grouped(fs, bx):
        return jnp.sum(multiscale_roi_align_hybrid(
            fs, bx, img, (7, 7), mode="bands_grouped"))

    from object_detectors_tpu.kernels.roi_align_pallas import (
        _prep_bands, _prep_bands_grouped,
    )

    def prep_fn(prep):
        # prep cost alone (canvas concat + sorts + descriptor
        # scatters): every kernel variant pays this inside its jit, so
        # kernel-side dma/compute numbers are (variant - prep).
        def f(fs, bx):
            outs = prep(tuple(fs), bx, img, 7, 7, 2)
            return sum(jnp.sum(o[..., :1].astype(jnp.float32))
                       for o in outs if o.ndim > 0) + jnp.sum(
                           outs[0][0, 0].astype(jnp.float32))
        return f

    variants = {
        "noop": noop,
        "flat": run_variant(R.multiscale_roi_align_flat),
        "canvas": run_variant(R.multiscale_roi_align_canvas),
        "pallas": pallas_fn,
        "pallas_mm2": pallas_mm2,
        "pallas_dma": pallas_dbg("dma_only"),
        "pallas_compute": pallas_dbg("compute_only"),
        "hybrid": hybrid_fn,
        "tiled": tiled_fn(),
        "tiled_mm2": tiled_fn("mm2"),
        "tiled_dma": tiled_fn(debug="dma_only"),
        "hybrid_tiled": hybrid_tiled,
        "bands": bands_fn(),
        "bands_dma": bands_fn(debug="dma_only"),
        "bands_compute": bands_fn(debug="compute_only"),
        "hybrid_bands": hybrid_bands,
        "grouped": grouped_fn(),
        "grouped_rows": grouped_fn(fold="rows"),
        # 16-aligned window reads: bf16 (16,128)-tile-aligned dynamic
        # sublane slices (r5 A/B — is the 8-aligned read paying the
        # half-tile relayout?)
        "grouped_rows_a16": grouped_fn(fold="rows", xalign=16),
        "grouped_a16_dma": grouped_fn(debug="dma_only", xalign=16),
        "grouped_a16_compute": grouped_fn(debug="compute_only",
                                          fold="rows", xalign=16),
        "grouped_wide": grouped_fn(fold="wide"),
        "grouped_wide_compute": grouped_fn(debug="compute_only",
                                           fold="wide"),
        "grouped_dma": grouped_fn(debug="dma_only"),
        "grouped_compute": grouped_fn(debug="compute_only"),
        "hybrid_grouped": hybrid_grouped,
        "prep_bands": prep_fn(_prep_bands),
        "prep_grouped": prep_fn(_prep_bands_grouped),
    }
    for name, fn in variants.items():
        if args.variants and name not in args.variants:
            continue
        dt = time_fn(fn, feats, boxes)
        print(f"{name:8s} {dt*1e3:8.2f} ms  "
              f"({args.bs*args.rois/dt/1e6:.2f} M rois/s)")


if __name__ == "__main__":
    main()
