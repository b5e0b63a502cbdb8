"""Exact big-k selection microbenchmark (RPN / RetinaNet shapes).

The proposal filter spends ~3.35 ms at bs16 in per-level top-1000
(frcnn_ablate stage 'topk_only'); exact_blocked_topk degenerates at
k=1000 (the block-max top-k is nearly a full sort of 1200 maxima and
the gathered second stage is still a 64000-element top-1000). This
times every exact alternative at the production shapes so the selection
primitive can be chosen from data:

  topk       lax.top_k(x, 1000)
  blocked    ops.nms.exact_blocked_topk (current production)
  sortsel    full lax.sort + slice (values+iota payload)
  approx1    lax.approx_max_k(recall_target=1.0)

Usage: python -m object_detectors_tpu.analysis.topk_bench
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

from object_detectors_tpu.ops import nms as N  # noqa: E402
from object_detectors_tpu.ops import selection as SEL  # noqa: E402


def time_fn(fn, *args, warmup=2, iters=20):
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
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--k", type=int, default=1000)
    args = ap.parse_args()
    k = args.k
    rng = np.random.RandomState(0)

    def mk(n):
        return jnp.asarray(rng.randn(args.bs, n).astype(np.float32))

    shapes = {"rpn_p2 76800": mk(76800), "retina_pairs 91008": mk(91008),
              "gathered 64000": mk(64000)}

    def topk(x):
        v, i = jax.vmap(lambda s: jax.lax.top_k(s, k))(x)
        return jnp.sum(v) + jnp.sum(i)

    def blocked(x):
        v, i = jax.vmap(lambda s: N.exact_blocked_topk(s, k))(x)
        return jnp.sum(v) + jnp.sum(i)

    def sortsel(x):
        def one(s):
            idx = jnp.arange(s.shape[0], dtype=jnp.int32)
            sv, si = jax.lax.sort((-s, idx), num_keys=1)
            return -sv[:k], si[:k]
        v, i = jax.vmap(one)(x)
        return jnp.sum(v) + jnp.sum(i)

    def approx1(x):
        v, i = jax.vmap(lambda s: jax.lax.approx_max_k(
            s, k, recall_target=1.0))(x)
        return jnp.sum(v) + jnp.sum(i)

    def radix(x):
        v, i = jax.vmap(lambda s: SEL.radix_topk(s, k))(x)
        return jnp.sum(v) + jnp.sum(i)

    def radix_bf16(x):
        v, i = jax.vmap(lambda s: SEL.radix_topk(s, k))(
            x.astype(jnp.bfloat16))
        return jnp.sum(v.astype(jnp.float32)) + jnp.sum(i)

    for name, x in shapes.items():
        print(f"-- {name} (bs{args.bs}, k={k})")
        for vname, fn in (("topk", topk), ("blocked", blocked),
                          ("sortsel", sortsel), ("approx1", approx1),
                          ("radix", radix), ("radix_bf16", radix_bf16)):
            try:
                dt = time_fn(fn, x)
                print(f"  {vname:8s} {dt*1e3:8.2f} ms")
            except Exception as e:
                print(f"  {vname:8s} failed: {str(e)[:70]}")


if __name__ == "__main__":
    main()
