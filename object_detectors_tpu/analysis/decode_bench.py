"""RetinaNet post-cap decode micro-bench.

The r4f stage isolation put the post-cap DECODE at +5.0 ms bs16
(cap +1.7, NMS +2.8) — the decode marginal is now the biggest
postprocess chunk. Candidate formulations, all producing the capped
survivors' boxes from (aidx [Ncap], reg [A, 4] bf16, anchors [A, 4]):

* fused:   concat reg+anchors -> ONE [A, 8] f32 table -> gather
           (the current production path, retinanet.py).
* split:   two gathers (reg rows bf16, anchor rows f32) — 2x index
           rows, half of them 8-byte.
* arith:   gather ONLY reg (bf16 8-byte rows); reconstruct anchors
           ARITHMETICALLY from the index (grid_anchors is
           col*stride + base[a] — integer products exact in f32, the
           rounded base is a 9-row one-hot contraction), zero gather.

Usage: python -m object_detectors_tpu.analysis.decode_bench [--bs 16]
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

from object_detectors_tpu.models import anchors as anchor_lib  # noqa: E402
from object_detectors_tpu.ops import boxes as box_ops  # noqa: E402

SIZE = 640
NCAP = 2000
WEIGHTS = (1.0, 1.0, 1.0, 1.0)


def level_layout(size=SIZE):
    grids = [(size // s,) * 2 for s in (8, 16, 32, 64, 128)]
    sizes, ars = anchor_lib.retinanet_anchor_config()
    anchors = jnp.asarray(
        anchor_lib.grid_anchors((size, size), grids, sizes, ars))
    bases = np.stack([anchor_lib.cell_anchors(s, a)
                      for s, a in zip(sizes, ars)])     # [L, A, 4]
    a_per = bases.shape[1]
    level_sizes = [gh * gw * a_per for gh, gw in grids]
    starts = np.concatenate([[0], np.cumsum(level_sizes)])[:-1]
    gws = [g[1] for g in grids]
    strides = [8, 16, 32, 64, 128]
    return anchors, jnp.asarray(bases), a_per, starts, gws, strides


def anchors_from_index(aidx, bases, a_per, starts, gws, strides):
    """Reconstruct grid_anchors rows from global indices — same f32
    values as the precomputed table (products of ints < 2^24; the
    per-level rounded base tables fold into one [L*A, 4] one-hot
    contraction keyed by (level, anchor))."""
    aidx = aidx.astype(jnp.int32)
    nl = bases.shape[0]
    # per-level select of (level id, start, gw, stride)
    lvl = jnp.zeros_like(aidx)
    start = jnp.zeros_like(aidx)
    gw = jnp.zeros_like(aidx)
    stride = jnp.zeros_like(aidx)
    for li, (s0, g, st) in enumerate(zip(starts, gws, strides)):
        sel = aidx >= int(s0)
        lvl = jnp.where(sel, li, lvl)
        start = jnp.where(sel, int(s0), start)
        gw = jnp.where(sel, int(g), gw)
        stride = jnp.where(sel, int(st), stride)
    local = aidx - start
    cell = local // a_per
    a = local % a_per
    row = (cell // gw).astype(jnp.float32)
    col = (cell % gw).astype(jnp.float32)
    st_f = stride.astype(jnp.float32)
    sx = col * st_f
    sy = row * st_f
    key = lvl * a_per + a
    onehot = (key[:, None]
              == jnp.arange(nl * a_per)[None, :]).astype(jnp.float32)
    b = onehot @ bases.reshape(nl * a_per, 4)             # [N, 4]
    shift = jnp.stack([sx, sy, sx, sy], -1)
    return shift + b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    bs = args.bs

    anchors, bases, a_per, starts, gws, strides = level_layout()
    a_total = anchors.shape[0]
    rng = np.random.RandomState(0)
    reg = jnp.asarray(rng.randn(bs, a_total, 4).astype(np.float32),
                      jnp.bfloat16)
    aidx = jnp.asarray(
        rng.randint(0, a_total, (bs, NCAP)).astype(np.int32))

    def decode(r, an):
        b = box_ops.decode_boxes(r, an, WEIGHTS)
        return box_ops.clip_boxes_to_image(b, (SIZE, SIZE))

    def fused(reg, aidx):
        def per_image(rg, ai):
            regan = jnp.concatenate(
                [rg.astype(jnp.float32), anchors], -1)
            ra = regan[ai]
            return decode(ra[:, :4], ra[:, 4:])
        return jnp.sum(jax.vmap(per_image)(reg, aidx))

    def split(reg, aidx):
        def per_image(rg, ai):
            return decode(rg[ai].astype(jnp.float32), anchors[ai])
        return jnp.sum(jax.vmap(per_image)(reg, aidx))

    def arith(reg, aidx):
        def per_image(rg, ai):
            an = anchors_from_index(ai, bases, a_per, starts, gws,
                                    strides)
            return decode(rg[ai].astype(jnp.float32), an)
        return jnp.sum(jax.vmap(per_image)(reg, aidx))

    # exactness: arith anchors == table rows, bitwise
    got = jax.vmap(lambda ai: anchors_from_index(
        ai, bases, a_per, starts, gws, strides))(aidx)
    want = anchors[aidx]
    bad = int(jnp.sum(got != want))
    print(f"arith-anchor mismatches: {bad} / {got.size}")

    for name, fn in (("fused", fused), ("split", split),
                     ("arith", arith)):
        jf = jax.jit(fn)
        float(jf(reg, aidx))
        float(jf(reg, aidx))
        t0 = time.perf_counter()
        outs = [jf(reg, aidx) for _ in range(args.iters)]
        float(outs[-1])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:8s} {dt*1e3:8.3f} ms  {bs/dt:8.1f} img/s")


if __name__ == "__main__":
    main()
