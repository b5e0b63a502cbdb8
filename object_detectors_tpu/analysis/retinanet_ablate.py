"""RetinaNet stage ablation timing on the real chip.

Cumulative prefixes (backbone+fpn -> +head towers -> +postprocess) with
async back-to-back dispatch and one final host read (per-iteration host
reads pay ~28ms of noisy relay RPC — BASELINE.md methodology).

Usage: python -m object_detectors_tpu.analysis.retinanet_ablate [--bs 8]
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
from object_detectors_tpu.models import retinanet as RN  # noqa: E402
from object_detectors_tpu.models.resnet import (  # noqa: E402
    BackboneWithFPN, ResNet,
)


def build_stages(size, dtype, num_classes=91):
    cfg = RN.RetinaNetConfig(num_classes=num_classes)
    model = RN.RetinaNet(num_classes=num_classes, dtype=dtype)
    x0 = jnp.zeros((1, size, size, 3), dtype)
    variables = model.init(jax.random.key(0), x0, train=False)

    bb = BackboneWithFPN(ResNet((3, 4, 6, 3), "bottleneck", "frozen",
                                dtype),
                         out_channels=256, extra_blocks="p6p7")
    bbv = {"params": variables["params"]["backbone"],
           "frozen": variables["frozen"]["backbone"]}
    headv = {"params": variables["params"]["head"]}

    grids = anchor_lib.fpn_grid_sizes((size, size))
    sizes, ars = anchor_lib.retinanet_anchor_config()
    anchors = jnp.asarray(anchor_lib.grid_anchors((size, size), grids,
                                                  sizes, ars))

    def backbone_only(images):
        feats = bb.apply(bbv, images, False)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    # resnet WITHOUT the FPN: isolates the FPN's 5 inner 1x1 + 3 output
    # 3x3 convs + p6p7 (the VERDICT r4 "pack the FPN convs" candidate —
    # per-level weights make _pack_layout inapplicable; this measures
    # the total pool the idea could ever draw from)
    resnet_only = ResNet((3, 4, 6, 3), "bottleneck", "frozen", dtype)
    rv = {"params": variables["params"]["backbone"]["resnet"],
          "frozen": variables["frozen"]["backbone"]["resnet"]}

    def backbone_nofpn(images):
        feats = resnet_only.apply(rv, images, False)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    def plus_head(images, fused=False):
        feats = bb.apply(bbv, images, False)
        cls, reg, _ = RN.RetinaNetHead(
            num_classes, dtype=dtype, fused_towers=fused).apply(
                headv, feats)
        return (jnp.sum(cls.astype(jnp.float32))
                + jnp.sum(reg.astype(jnp.float32)))

    # fused_towers=True shares the SAME param tree (tests/
    # test_retinanet.py::test_fused_towers_match_unfused) — apply the
    # same variables for a weight-identical A/B
    model_fused = RN.RetinaNet(num_classes=num_classes, dtype=dtype,
                               fused_towers=True)

    def full_fused(images):
        cls, reg, level_sizes = model_fused.apply(variables, images,
                                                  train=False)
        out = RN.retinanet_postprocess(
            cls, reg, anchors, tuple(level_sizes), (size, size), cfg,
            grids=tuple(grids))
        return jnp.sum(out[0]) + jnp.sum(out[1])

    def full(images):
        cls, reg, level_sizes = model.apply(variables, images,
                                            train=False)
        out = RN.retinanet_postprocess(
            cls, reg, anchors, tuple(level_sizes), (size, size), cfg,
            grids=tuple(grids))
        return jnp.sum(out[0]) + jnp.sum(out[1])

    def post_stage(debug, select_mode="fused"):
        def fn(images):
            cls, reg, level_sizes = model.apply(variables, images,
                                                train=False)
            out = RN._retinanet_postprocess(
                cls, reg, anchors, tuple(level_sizes), (size, size),
                cfg, 1.0, 1.0, debug=debug, select_mode=select_mode)
            # + sum(reg)*eps keeps the REG TOWER alive in truncated
            # stages: select/cap never read reg, so XLA DCE'd the whole
            # tower (~5.6 ms at bs16) and the old tables mis-attributed
            # it to the decode marginal (r5 fix; BASELINE.md r5).
            return (jnp.sum(out[0].astype(jnp.float32))
                    + jnp.sum(out[1].astype(jnp.float32))
                    + jnp.sum(reg.astype(jnp.float32)) * 1e-30)
        return fn

    # post_* are cumulative truncations INSIDE the postprocess
    # (selection -> +gathers/decode -> +cap -> full adds NMS)
    return {"backbone": backbone_only,
            "backbone_nofpn": backbone_nofpn, "head": plus_head,
            "head_fused": lambda im: plus_head(im, fused=True),
            "full_fused": full_fused,
            "post_select": post_stage("select"),
            "post_select_batched": post_stage("select",
                                              select_mode="batched"),
            "post_decode": post_stage("decode"),
            "post_cap": post_stage("cap"),
            "full_batched": post_stage("full",
                                       select_mode="batched"),
            "full_perlevel": post_stage("full",
                                        select_mode="perlevel"),
            "full": full}


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
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--stages", nargs="*", default=None)
    args = ap.parse_args()
    dtype = jnp.bfloat16

    stages = build_stages(args.size, dtype)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(args.bs, args.size, args.size, 3).astype(np.float32),
        dtype)
    prev = 0.0
    for name, fn in stages.items():
        if args.stages and name not in args.stages:
            continue
        dt = time_fn(fn, images)
        print(f"{name:10s} {dt*1e3:8.1f} ms  (+{(dt-prev)*1e3:7.1f} ms)"
              f"  {args.bs/dt:7.1f} img/s")
        prev = dt


if __name__ == "__main__":
    main()
