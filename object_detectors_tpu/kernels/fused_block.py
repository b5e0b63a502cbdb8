"""Fused ResNet bottleneck block (eval path) as one Pallas kernel.

A stride-1 bottleneck block (1x1 -> BN -> relu -> 3x3 -> BN -> relu ->
1x1 -> BN -> +identity -> relu; torchvision `utilities/resnet.py:26-75`)
executed by XLA costs ~53 MB of HBM traffic per 160x160x256 image
(activations re-read/re-written around every conv) — measured at the
roofline: layer1 = 3.12 ms at bs16/640^2 vs a 0.87 ms FLOP floor. This
kernel keeps the whole block in VMEM per row-tile: read the input tile
once (with a 1-row/col halo for the 3x3), do all three matmul stages on
the MXU, write the output tile once — ~30 MB/img, ~1.7x less traffic.

FrozenBatchNorm is folded into the conv weights outside the kernel
(w' = w * scale, b' = shift), which is exact up to bf16 rounding of the
product. The 3x3 runs as 9 shifted [TR*W, Cm] @ [Cm, Cm] matmuls over
the halo'd t1 buffer whose padding ring is zeroed (conv zero-padding
semantics).

Training uses the unfused Flax path (this kernel has no VJP); the
module is eval-only and numerically equivalent at bf16 tolerance
(tests/test_fused_block.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_kernel(xp_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                  b3_ref, wd_ref, bd_ref, out_ref, in_buf, sems,
                  *, tr, h, w, wp, cin, cm, cout, has_down, n_tiles):
    """Grid = (B * n_tiles). xp [B, H+2, WP, Cin] bf16 in ANY; params
    in VMEM. in_buf: 2-slot [(TR+2), WP, Cin] tile scratch. WP is W+2
    rounded up to a multiple of 8 — Mosaic requires the second-minor
    dim of an HBM DMA slice to be 8-aligned (the ring mask keeps the
    extra columns at zero, so compute is unaffected)."""
    step = pl.program_id(0)
    b = step // n_tiles
    t = step - b * n_tiles
    slot = jax.lax.rem(step, 2)

    def copy(s, bb, tt, sl):
        return pltpu.make_async_copy(
            xp_ref.at[bb, pl.ds(tt * tr, tr + 2), :, :],
            in_buf.at[sl], sems.at[sl])

    @pl.when(step == 0)
    def _():
        copy(step, b, t, slot).start()

    @pl.when(step + 1 < pl.num_programs(0))
    def _():
        nstep = step + 1
        nb = nstep // n_tiles
        nt = nstep - nb * n_tiles
        copy(nstep, nb, nt, 1 - slot).start()

    copy(step, b, t, slot).wait()

    x = in_buf[slot]                       # [(TR+2), WP, Cin] bf16
    xf = x.reshape((tr + 2) * wp, cin)

    # stage 1: 1x1 + bn + relu over the FULL halo'd tile (the 3x3 needs
    # t1's halo); zero the padding ring afterwards (conv2 zero-pads t1,
    # not relu(b1)).
    t1 = jnp.dot(xf, w1_ref[...],
                 preferred_element_type=jnp.float32) + b1_ref[...]
    t1 = jnp.maximum(t1, 0.0).reshape(tr + 2, wp, cm)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tr + 2, wp, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tr + 2, wp, 1), 1)
    # tile rows map to image rows [t*tr - 1, t*tr + tr]; valid image
    # rows are [0, h) -> zero where the global row is outside.
    grow = rows + t * tr - 1
    ring = ((grow >= 0) & (grow < h) & (cols >= 1)
            & (cols <= w)).astype(jnp.float32)
    t1 = t1 * ring

    # stage 2: 3x3 as 9 shifted matmuls accumulated in f32
    t2 = jnp.zeros((tr * w, cm), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = jax.lax.slice(t1, (dy, dx, 0), (dy + tr, dx + w, cm))
            t2 = t2 + jnp.dot(
                sl.reshape(tr * w, cm).astype(jnp.bfloat16),
                w2_ref[dy, dx], preferred_element_type=jnp.float32)
    t2 = jnp.maximum(t2 + b2_ref[...], 0.0)

    # stage 3: 1x1 + bn
    t3 = jnp.dot(t2.astype(jnp.bfloat16), w3_ref[...],
                 preferred_element_type=jnp.float32) + b3_ref[...]

    # identity (+ optional 1x1 downsample projection), inner tile only
    xi = jax.lax.slice(x, (1, 1, 0), (1 + tr, 1 + w, cin))
    xif = xi.reshape(tr * w, cin)
    if has_down:
        ident = jnp.dot(xif, wd_ref[...],
                        preferred_element_type=jnp.float32) + bd_ref[...]
    else:
        ident = xif.astype(jnp.float32)

    out = jnp.maximum(t3 + ident, 0.0)
    out_ref[...] = out.reshape(1, tr, w, cout).astype(out_ref.dtype)


def fold_bn(w, bn, dtype=jnp.bfloat16, eps=1e-5):
    """Fold FrozenBatchNorm (weight, bias, running_mean, running_var)
    into conv weights: returns (w * s cast to dtype, shift f32)."""
    s = bn["weight"] / jnp.sqrt(bn["running_var"] + eps)
    shift = bn["bias"] - bn["running_mean"] * s
    return (w * s).astype(dtype), shift.astype(jnp.float32)


@partial(jax.jit, static_argnames=("tr", "interpret"))
def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, wd=None, bd=None,
                     tr: int = 16, interpret: bool = False):
    """x [B, H, W, Cin] bf16 -> [B, H, W, Cout]. Weights pre-folded
    (fold_bn): w1 [Cin, Cm], w2 [3, 3, Cm, Cm], w3 [Cm, Cout], optional
    downsample wd [Cin, Cout]. Stride-1 blocks only."""
    bsz, h, w, cin = x.shape
    cm = w1.shape[1]
    cout = w3.shape[1]
    if h % tr:
        tr = next(t for t in range(min(tr, h), 0, -1) if h % t == 0)
    n_tiles = h // tr
    has_down = wd is not None
    if wd is None:
        wd = jnp.zeros((cin, cout), x.dtype)
        bd = jnp.zeros((cout,), jnp.float32)

    # Mosaic: the second-minor dim of an HBM DMA slice must be a
    # multiple of 8 — round the halo'd width up (ring-masked to zero
    # in the kernel, so exactness is unaffected).
    wp = -(-(w + 2) // 8) * 8
    # ... and the minor (lane) dim must be a multiple of 128: pad the
    # input channels and the matching w1/wd rows with zeros (exact —
    # zero inputs times anything contribute nothing). In ResNet-50 only
    # layer1 block0 (cin=64, has a projection) hits this; un-projected
    # identity blocks with unaligned channels (tiny test configs) get a
    # synthesized exact 0/1 identity projection instead.
    cpad = -cin % 128
    if cpad:
        if not has_down:
            wd = jnp.eye(cin, cout, dtype=x.dtype)
            bd = jnp.zeros((cout,), jnp.float32)
            has_down = True
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad)))
        w1 = jnp.pad(w1, ((0, cpad), (0, 0)))
        wd = jnp.pad(wd, ((0, cpad), (0, 0)))
        cin += cpad
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + wp - (w + 2)), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(bsz * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((cin, cm), lambda i: (0, 0)),
            pl.BlockSpec((cm,), lambda i: (0,)),
            pl.BlockSpec((3, 3, cm, cm), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((cm,), lambda i: (0,)),
            pl.BlockSpec((cm, cout), lambda i: (0, 0)),
            pl.BlockSpec((cout,), lambda i: (0,)),
            pl.BlockSpec((cin, cout), lambda i: (0, 0)),
            pl.BlockSpec((cout,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec(
            (1, tr, w, cout),
            lambda i, nt=n_tiles: (i // nt, i % nt, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, tr + 2, wp, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = partial(_block_kernel, tr=tr, h=h, w=w, wp=wp, cin=cin,
                     cm=cm, cout=cout, has_down=has_down, n_tiles=n_tiles)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(xp, w1, b1, w2, b2, w3, b3, wd, bd)
