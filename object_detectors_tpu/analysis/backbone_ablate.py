"""ResNet-50-FPN backbone stage ablation on the real chip.

The FRCNN ablation (frcnn_ablate) shows the backbone at ~19.3 ms for
bs16/640² — only ~28% MXU against the ~1.07 TFLOP forward cost, while
the RPN head (same measurement) runs at ~90%. This breaks the backbone
into cumulative prefixes (stem -> +layer1..4 -> +fpn) to find where the
slack lives before optimizing.

Usage: python -m object_detectors_tpu.analysis.backbone_ablate [--bs 16]
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
import flax.linen as nn  # noqa: E402

from object_detectors_tpu.models.resnet import (  # noqa: E402
    BackboneWithFPN, Bottleneck, ResNet,
)
from object_detectors_tpu.models.common import FrozenBatchNorm  # noqa: E402


class Stem(nn.Module):
    dtype: any = jnp.bfloat16
    direct: bool = False  # direct 7x7/s2 conv instead of s2d
    # cut: conv | bnrelu | pool_rw (reduce_window) | pool (phase decomp)
    cut: str = "pool"

    @nn.compact
    def __call__(self, x):
        if self.direct:
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="conv1")(x)
        else:
            from object_detectors_tpu.models.resnet import SpaceToDepthStem
            x = SpaceToDepthStem(dtype=self.dtype, name="conv1")(x)
        if self.cut == "conv":
            return x
        x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        if self.cut == "bnrelu":
            return x
        if self.cut == "pool_rw":
            return nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))
        from object_detectors_tpu.models.common import max_pool_3x3_s2
        return max_pool_3x3_s2(x)


class Prefix(nn.Module):
    """Stem + the first ``n_stages`` ResNet stages."""

    n_stages: int
    layers: tuple = (3, 4, 6, 3)
    dtype: any = jnp.bfloat16
    fused: str = "off"

    @nn.compact
    def __call__(self, x):
        x = Stem(dtype=self.dtype, name="stem")(x)
        planes = 64
        for stage in range(self.n_stages):
            stride = 1 if stage == 0 else 2
            x = Bottleneck(planes, stride, downsample=True, norm="frozen",
                           dtype=self.dtype, fused=self.fused,
                           name=f"layer{stage+1}_block0")(x, False)
            for i in range(1, self.layers[stage]):
                x = Bottleneck(planes, 1, norm="frozen", dtype=self.dtype,
                               fused=self.fused,
                               name=f"layer{stage+1}_block{i}")(x, False)
            planes *= 2
        return x


def time_fn(fn, images, warmup=2, iters=20):
    jf = jax.jit(fn)
    for _ in range(warmup):
        float(jf(images))
    t0 = time.perf_counter()
    outs = [jf(images) for _ in range(iters)]
    s = float(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    del s, outs
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="fused Pallas bottleneck blocks (eval)")
    ap.add_argument("--stem-detail", action="store_true",
                    help="stem sub-stages: conv / +bnrelu / +pool "
                         "(reduce_window vs phase-decomposed)")
    args = ap.parse_args()
    dtype = jnp.float32 if args.f32 else jnp.bfloat16

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(args.bs, args.size, args.size, 3).astype(np.float32),
        dtype)

    stages = {}
    if args.stem_detail:
        # isolate the s2d layout shuffle from the conv: the 6D
        # reshape/transpose has tiny minor dims (2, 2, 3) that XLA's
        # HBM transpose engine handles badly — if "s2d_only" carries
        # most of stem:conv, the fix is a layout-producing preprocess,
        # not a faster conv.
        b, h, w, _ = images.shape

        def s2d_only(im):
            z = (im.reshape(b, h // 2, 2, w // 2, 2, 3)
                 .transpose(0, 1, 3, 2, 4, 5)
                 .reshape(b, h // 2, w // 2, 12))
            return jnp.sum(z.astype(jnp.float32))

        def s2d_slice(im):
            # strided-slice formulation of the same layout
            z = jnp.concatenate(
                [im[:, a::2, c::2, :] for a in (0, 1) for c in (0, 1)],
                axis=-1)
            return jnp.sum(z.astype(jnp.float32))

        stages["stem:s2d_only"] = s2d_only
        stages["stem:s2d_slice"] = s2d_slice

        from object_detectors_tpu.models.resnet import SpaceToDepthStem
        s2 = SpaceToDepthStem(dtype=dtype)
        s2v = s2.init(jax.random.key(0), images[:1])
        kern = s2v["params"]["kernel"]
        wp = jnp.pad(kern, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w2 = (wp.reshape(4, 2, 4, 2, 3, 64)
              .transpose(0, 2, 1, 3, 4, 5)
              .reshape(4, 4, 12, 64)).astype(dtype)
        z_pre = jnp.asarray(np.asarray(
            (images.reshape(b, h // 2, 2, w // 2, 2, 3)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(b, h // 2, w // 2, 12))))

        def conv_pre_s2d(z):
            return jnp.sum(jax.lax.conv_general_dilated(
                z.astype(dtype), w2, (1, 1), ((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
                .astype(jnp.float32))

        dt = time_fn(conv_pre_s2d, z_pre)
        print(f"{'stem:conv_pre_s2d':18s} {dt*1e3:8.2f} ms"
              f"  {args.bs/dt:7.1f} img/s")

        dst = Stem(dtype=dtype, direct=True, cut="conv")
        dsv = dst.init(jax.random.key(0), images[:1])
        stages["stem:direct_conv"] = (
            lambda im, st=dst, vv=dsv: jnp.sum(
                st.apply(vv, im).astype(jnp.float32)))

        # production 4x4 phase-split stem (_stem4) + its shuffle alone
        from object_detectors_tpu.models.resnet import _stem4

        def s2d4_only(im):
            z = (im.reshape(b, h // 4, 4, w // 4, 4, 3)
                 .transpose(0, 1, 3, 2, 4, 5)
                 .reshape(b, h // 4, w // 4, 48))
            return jnp.sum(z.astype(jnp.float32))

        stages["stem:s2d4_only"] = s2d4_only

        def s2d4_rowphase(im):
            # same (ay*12+ax*3+c) layout via 4 stride-4 ROW slices;
            # per row-phase, (W, 3) -> (W/4, 12) is a free contiguous
            # reshape, so only the row slice + channel concat move data
            z = jnp.concatenate([
                im[:, a::4, :, :].reshape(b, h // 4, w // 4, 12)
                for a in range(4)], axis=-1)
            return jnp.sum(z.astype(jnp.float32))

        stages["stem:s2d4_rowphase"] = s2d4_rowphase
        bn4 = {"weight": jnp.ones(64), "bias": jnp.zeros(64),
               "running_mean": jnp.zeros(64),
               "running_var": jnp.ones(64)}
        stages["stem:stem4_full"] = (
            lambda im, k=kern, bb=bn4: jnp.sum(
                _stem4(im, k, bb, dtype).astype(jnp.float32)))
        for cut in ("conv", "bnrelu", "pool_rw", "pool"):
            st = Stem(dtype=dtype, cut=cut)
            vv = st.init(jax.random.key(0), images[:1])
            stages[f"stem:{cut}"] = (
                lambda im, st=st, vv=vv: jnp.sum(
                    st.apply(vv, im).astype(jnp.float32)))
    stem = Stem(dtype=dtype)
    sv = stem.init(jax.random.key(0), images[:1])
    stages["stem"] = lambda im: jnp.sum(
        stem.apply(sv, im).astype(jnp.float32))
    fused = "auto" if args.fused else "off"
    for n in range(1, 5):
        pref = Prefix(n, dtype=dtype, fused=fused)
        pv = pref.init(jax.random.key(0), images[:1])
        stages[f"+layer{n}"] = (
            lambda im, pref=pref, pv=pv: jnp.sum(
                pref.apply(pv, im).astype(jnp.float32)))
    bb = BackboneWithFPN(ResNet((3, 4, 6, 3), "bottleneck", "frozen",
                                dtype, fused=fused),
                         out_channels=256, extra_blocks="pool",
                         returned_layers=(1, 2, 3, 4))
    bv = bb.init(jax.random.key(0), images[:1], False)
    stages["+fpn(full)"] = lambda im: sum(
        jnp.sum(f.astype(jnp.float32))
        for f in bb.apply(bv, im, False))

    prev = 0.0
    for name, fn in stages.items():
        dt = time_fn(fn, images)
        print(f"{name:12s} {dt*1e3:8.2f} ms  (+{(dt-prev)*1e3:7.2f})"
              f"  {args.bs/dt:7.1f} img/s")
        prev = dt


if __name__ == "__main__":
    main()
