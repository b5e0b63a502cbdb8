"""Darknet-53 stage ablation on the real chip (YOLO backbone).

Cumulative prefixes through the darknet stages plus a stem-only row —
the 3-channel 3x3 first conv is suspected of the same MXU pathology the
ResNet 7x7 stem had (measured 5.05 ms / ~30x off peak before the
space-to-depth rewrite).

Usage: python -m object_detectors_tpu.analysis.darknet_ablate [--bs 64]
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

from object_detectors_tpu.models.common import ConvBN  # noqa: E402
from object_detectors_tpu.models.darknet import (  # noqa: E402
    DarkNet, ResidualBlock,
)


class Prefix(nn.Module):
    """Stem + the first ``n_stages`` darknet stages."""

    n_stages: int
    layers: tuple = (1, 2, 8, 8, 4)
    dtype: any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = ConvBN(32, 3, dtype=self.dtype, name="stem")(x, False)
        for stage in range(self.n_stages):
            planes = DarkNet.STAGE_PLANES[stage]
            x = ConvBN(planes[1], 3, strides=2, dtype=self.dtype,
                       name=f"down{stage+1}")(x, False)
            for i in range(self.layers[stage]):
                x = ResidualBlock(planes, dtype=self.dtype,
                                  name=f"stage{stage+1}_block{i}")(x,
                                                                   False)
        return x


def time_fn(fn, images, warmup=2, iters=12):
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
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--size", type=int, default=640)
    args = ap.parse_args()
    dtype = jnp.bfloat16

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(args.bs, args.size, args.size, 3).astype(np.float32),
        dtype)

    prev = 0.0
    for n in range(0, 6):
        pref = Prefix(n, dtype=dtype)
        pv = pref.init(jax.random.key(0), images[:1])

        def fn(im, pref=pref, pv=pv):
            return jnp.sum(pref.apply(pv, im).astype(jnp.float32))

        dt = time_fn(fn, images)
        name = "stem" if n == 0 else f"+stage{n}"
        print(f"{name:9s} {dt*1e3:8.2f} ms  (+{(dt-prev)*1e3:7.2f})"
              f"  {args.bs/dt:7.1f} img/s")
        prev = dt


if __name__ == "__main__":
    main()
