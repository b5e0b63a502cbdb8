"""Serving scheduler dispatch-budget profile (VERDICT r2 item 5).

Decomposes the mixed-stream serving number (bench.py run_serving,
BASELINE config 5) into its two budgets on this rig:

* the RELAY budget — every device interaction through the dev tunnel
  (dispatch, tiny H2D, packed D2H) costs a per-RPC floor (~15 ms
  measured in round 2); a stream of F flushes spends ~3F RPCs
  (idx upload + fused dispatch + packed fetch);
* the KERNEL budget — pure device execution of the same flush graphs,
  timed with async back-to-back dispatch and one final host read
  (the CLAUDE.md methodology).

Prints one JSON line: measured per-RPC cost, flush counts, predicted
floor = max(rpc_serialized, kernel_sum) vs the measured stream wall
time. If measured ~= predicted_rpc >> kernel_sum, the scheduler is
relay-bound (rig artifact); if measured >> predicted, the scheduler
itself is wasting time.

Reference analogue: none (serving harness is ours); the scheduler under
test is object_detectors_tpu/serve.py.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure_rpc_cost(iters: int = 30) -> float:
    """Median seconds for one tiny dispatch + one tiny fetch — the
    per-interaction relay floor (dominated by RPC latency, not work)."""
    x = jax.device_put(jnp.zeros((8,), jnp.float32))
    f = jax.jit(lambda v: v + 1.0)
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(f(x))  # 1 dispatch + 1 host read
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / 2.0  # two interactions per loop


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-requests", type=int, default=256)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--yolo-bs", type=int, default=32)
    ap.add_argument("--retina-bs", type=int, default=8)
    args = ap.parse_args(argv)

    from object_detectors_tpu import serve as S

    rpc_s = measure_rpc_cost()

    pipelines = {
        "yolo": S.build_yolo_pipeline(img_size=args.img_size,
                                      batch_size=args.yolo_bs,
                                      uint8_input=True),
        "retinanet": S.build_retinanet_pipeline(img_size=args.img_size,
                                                uint8_input=True),
    }
    server = S.BatchedDetectionServer(
        pipelines, {"yolo": args.yolo_bs, "retinanet": args.retina_bs},
        input_dtype=jnp.uint8)
    rng = np.random.RandomState(4)
    pool = server.stage_pool(rng.randint(
        0, 255, (32, args.img_size, args.img_size, 3), dtype=np.uint8))
    n = args.n_requests
    reqs = [S.Request(i, "yolo" if i % 5 else "retinanet", i % 32)
            for i in range(n)]

    # warmup compiles
    server.run_stream(reqs[: args.yolo_bs + args.retina_bs])

    # flush counts for the real stream (4/5 yolo, 1/5 retinanet)
    n_yolo = sum(1 for r in reqs if r.model == "yolo")
    n_ret = n - n_yolo
    f_yolo = -(-n_yolo // args.yolo_bs)
    f_ret = -(-n_ret // args.retina_bs)
    flushes = f_yolo + f_ret
    # pooled flush = idx H2D + fused dispatch; resolve = packed fetch
    rpcs = 3 * flushes

    # KERNEL budget: back-to-back async dispatch of the same flush
    # graphs, one final read (excludes the per-flush RPC serialization
    # the scheduler pays)
    idx_y = jnp.arange(args.yolo_bs, dtype=jnp.int32) % 32
    idx_r = jnp.arange(args.retina_bs, dtype=jnp.int32) % 32
    fy = server._pooled_fns["yolo"]
    fr = server._pooled_fns["retinanet"]
    jax.block_until_ready((fy(pool, idx_y), fr(pool, idx_r)))
    t0 = time.perf_counter()
    outs = []
    for _ in range(f_yolo):
        outs.append(fy(pool, idx_y))
    for _ in range(f_ret):
        outs.append(fr(pool, idx_r))
    jax.block_until_ready(outs)
    kernel_s = time.perf_counter() - t0

    # measured stream
    t0 = time.perf_counter()
    out = server.run_stream(reqs)
    wall_s = time.perf_counter() - t0
    assert len(out) >= n

    pred_rpc_s = rpcs * rpc_s
    print(json.dumps({
        "metric": "serving_dispatch_budget",
        "img_per_s": round(n / wall_s, 2),
        "wall_s": round(wall_s, 4),
        "flushes": {"yolo": f_yolo, "retinanet": f_ret},
        "rpcs": rpcs,
        "rpc_cost_ms": round(rpc_s * 1e3, 3),
        "predicted_rpc_floor_s": round(pred_rpc_s, 4),
        "kernel_sum_s": round(kernel_s, 4),
        "predicted_floor_s": round(max(pred_rpc_s, kernel_s), 4),
        "relay_bound": bool(pred_rpc_s > kernel_s),
        "scheduler_overhead_s": round(
            wall_s - max(pred_rpc_s, kernel_s), 4),
    }))


if __name__ == "__main__":
    main()
