"""Exact top-k SET selection without a sort ("radix top-k").

``lax.top_k`` on TPU lowers to a full bitonic sort network over the
minor dimension: at detection scale (top-1000 of ~91k (anchor, class)
pairs per RetinaNet level, 1000-of-76800 RPN objectness at P2/640²) one
call costs 2.5-3 ms at bs16 on v5e (analysis/topk_bench.py), and the
detectors pay several per step. But none of the consumers need the
top-k in ORDER — fixed-point NMS, batched/majority NMS and the global
pre-NMS caps all re-sort internally — they need the exact top-k SET.

TPU-native plan (all dense VPU/MXU work, no long sorts, no scatter, no
O(n) gathers):

1. Map scores to an order-isomorphic integer code (16 bits for
   bfloat16, 32 for float32) and find the exact k-th largest code by
   binary search on the code space: nbits fixed-trip iterations, each
   one compare+reduce pass over n.
2. Reshape to [rows, 128] and sort each row descending along the lane
   dimension (a cheap width-128 bitonic; the expensive thing on TPU is
   sorting along a LONG axis, not 128 lanes), carrying column indices.
3. Selected elements (> kth, plus just enough == kth, lowest index
   first — lax.top_k's tie rule) form a PREFIX of every sorted row.
   Prefix lengths come from per-row count reduces; their exclusive
   cumsum assigns each row an output span. The span->row inverse is a
   [k, rows] interval-membership compare + argmax — dense ops — after
   which one k-row gather reads the winners.

Returns the exact top-k SET with lax.top_k's tie rule. Output order is
(row, within-row score rank), NOT globally score-sorted — callers that
need score order must sort the k results (k is small).

-0.0 is normalized to +0.0 before coding (the integer codes would
otherwise order them). NaN scores order BELOW everything including
-inf (their codes are remapped to the minimum real code, one extra
compare+select per element — ADVICE r3): a NaN-producing checkpoint
yields the top-k of the remaining non-NaN scores, and NaN values only
appear in the output (visibly, as NaN) when fewer than k scores are
non-NaN. lax.top_k would instead sort NaN above +inf.

Parity note: replaces sort-based selection in RPN filter_proposals
(reference torchvision_models/tvision/rpn.py:254-270 `_get_top_n_idx`),
RetinaNet/RoIHeads pre-NMS candidate selection (tvision/retinanet.py
:436-452, tvision/roi_heads.py:715-781) and the YOLO decode candidate
cap — all set-selections whose downstream NMS re-sorts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _to_code(x: jnp.ndarray):
    """Order-isomorphic unsigned integer code (as int32/uint32) and the
    number of significant code bits."""
    nan = jnp.isnan(x)
    if x.dtype == jnp.bfloat16:
        u = jax.lax.bitcast_convert_type(x, jnp.uint16).astype(jnp.int32)
        # negatives (sign bit set) map descending below positives
        c = jnp.where(u >= 0x8000, 0xFFFF - u, u + 0x8000)
        # NaN sorts below everything real (code 1; 0 stays the padding
        # sentinel) instead of the raw code's above-+inf ordering
        return jnp.where(nan, jnp.ones_like(c), c), 16
    if x.dtype == jnp.float32:
        u = jax.lax.bitcast_convert_type(x, jnp.uint32)
        c = jnp.where(
            u >= jnp.uint32(0x80000000),
            jnp.bitwise_not(u),
            u | jnp.uint32(0x80000000))
        return jnp.where(nan, jnp.ones_like(c), c), 32
    raise TypeError(f"radix_topk: unsupported dtype {x.dtype}")


def _kth_code(code: jnp.ndarray, k: int, nbits: int):
    """Exact k-th largest code: the maximum t with count(code >= t) >= k,
    built TWO bits per iteration from the MSB (nbits/2 fori_loop trips).

    Each trip tests the three candidate extensions t|11, t|10, t|01 of
    the current prefix in one fused data pass (three compare+sum
    reductions over the same operand) and keeps the largest whose
    count still reaches k — exactly the maximal 2-bit extension, so the
    result equals the bit-by-bit search. Halving the sequential trip
    count matters more than the 3x reduction count: every radix_topk on
    the hot paths (RPN filter, RetinaNet postprocess, YOLO decode) pays
    this loop's latency, not its bandwidth."""
    zero = jnp.zeros((), code.dtype)
    one = jnp.ones((), code.dtype)
    assert nbits % 2 == 0, nbits

    def body(i, t):
        shift = (nbits - 2 - 2 * i).astype(code.dtype)
        b1 = one << (shift + 1)
        b0 = one << shift
        c3 = t | b1 | b0
        c2 = t | b1
        c1 = t | b0
        n3 = jnp.sum((code >= c3).astype(jnp.int32))
        n2 = jnp.sum((code >= c2).astype(jnp.int32))
        n1 = jnp.sum((code >= c1).astype(jnp.int32))
        return jnp.where(
            n3 >= k, c3, jnp.where(n2 >= k, c2,
                                   jnp.where(n1 >= k, c1, t)))

    return jax.lax.fori_loop(0, nbits // 2, body, zero)


def _kth_code_multi(codes, ks, nbits, bits_per_trip=2):
    """Exact k-th largest code for SEVERAL independent arrays in ONE
    sequential trip chain.

    The kth-code binary search is latency-bound: each trip is a full
    compare+reduce pass, and a caller that selects per FPN level runs
    L separate nbits/2-trip chains back-to-back (the RPN filter's 5
    levels serialized 80 trips at 640²; measured 4.6 ms of the 9.9 ms
    filter at bs16 — BASELINE.md r4). Fusing the searches runs ONE
    chain whose body reduces every array (static segment shapes, no
    padding — the padded [L, n_max] variant measured slower because
    the pad bytes dominate, queue_r5d), so the trip count is nbits /
    bits_per_trip TOTAL instead of per level.

    ``bits_per_trip``: candidate extensions tested per trip (the
    2-bit/3-candidate trick generalized: 2^b - 1 fused compare+sum
    reductions pick the maximal b-bit extension — same single data
    pass, more VPU accumulators, fewer sequential trips).

    Returns a list of k-th codes, one per input array.
    """
    assert nbits % bits_per_trip == 0, (nbits, bits_per_trip)
    ncand = (1 << bits_per_trip) - 1
    zero = jnp.zeros((), codes[0].dtype)
    one = jnp.ones((), codes[0].dtype)

    def body(i, ts):
        shift = (nbits - bits_per_trip - bits_per_trip * i).astype(
            codes[0].dtype)
        out = []
        for code, k, t in zip(codes, ks, ts):
            # candidates t|m for m = ncand..1: counts are monotone in
            # m, keep the largest extension whose count reaches k
            new_t = t
            for m in range(1, ncand + 1):
                cm = t | (jnp.asarray(m, code.dtype) << shift)
                nm = jnp.sum((code >= cm).astype(jnp.int32))
                new_t = jnp.where(nm >= k, cm, new_t)
            out.append(new_t)
        return tuple(out)

    return list(jax.lax.fori_loop(
        0, nbits // bits_per_trip, body, tuple(zero for _ in codes)))


def _pack_topk(x, code, t, k, lanes):
    """Materialize the top-k SET given the k-th code ``t`` (steps 2-3
    of the module docstring: 128-lane row sorts + prefix compaction).
    Returns (values [k], indices [k] int32)."""
    n = x.shape[0]
    nr = -(-n // lanes)
    pad = nr * lanes - n
    # pad code 0 is unreachable for ANY input (NaN remaps to 1, and no
    # float encodes to 0), so padding never ties with real values
    cp = jnp.pad(code, (0, pad)).reshape(nr, lanes)

    # stable ascending sort on the complement == stable descending sort
    # on the code; carry the column index
    cols = jnp.broadcast_to(jnp.arange(lanes, dtype=jnp.int32),
                            (nr, lanes))
    if cp.dtype == jnp.uint32:
        skey = jnp.bitwise_not(cp)
    else:
        skey = -cp
    _, sorted_cols = jax.lax.sort((skey, cols), dimension=1, num_keys=1,
                                  is_stable=True)

    c_gt = jnp.sum((cp > t).astype(jnp.int32), axis=1)    # [nr]
    c_eq = jnp.sum((cp == t).astype(jnp.int32), axis=1)
    need = k - jnp.sum(c_gt)                    # how many == t to keep
    eq_excl = jnp.cumsum(c_eq) - c_eq
    eq_take = jnp.clip(need - eq_excl, 0, c_eq)
    take = c_gt + eq_take                       # prefix length per row
    off = jnp.cumsum(take) - take               # exclusive; sums to k

    j = jnp.arange(k, dtype=jnp.int32)
    inside = (j[:, None] >= off[None, :]) & \
             (j[:, None] < (off + take)[None, :])         # [k, nr]
    row = jnp.argmax(inside, axis=1).astype(jnp.int32)    # exactly one
    rank = j - off[row]
    col = sorted_cols[row, rank]
    idx = row * lanes + col
    return x[idx], idx


@partial(jax.jit, static_argnames=("k", "lanes"))
def radix_topk(scores: jnp.ndarray, k: int, lanes: int = 128):
    """Exact top-k SET of a 1-D score vector.

    Returns (values [k], indices [k] int32). Ties at the k-th value are
    broken lowest-index-first (same SET as lax.top_k); output order is
    NOT score-sorted (see module docstring). vmap-safe.
    """
    n = scores.shape[0]
    if k >= n:
        return jax.lax.top_k(scores, min(k, n))
    x = jnp.where(scores == 0, jnp.zeros_like(scores), scores)  # -0 -> +0
    code, nbits = _to_code(x)
    t = _kth_code(code, k, nbits)
    return _pack_topk(x, code, t, k, lanes)


@partial(jax.jit, static_argnames=("ks", "lanes", "bits_per_trip"))
def radix_topk_multi(scores_list, ks, lanes: int = 128,
                     bits_per_trip: int = 2):
    """Exact top-k SETs of several independent 1-D score vectors with
    ONE fused kth-code trip chain (see :func:`_kth_code_multi` — the
    per-level RPN/RetinaNet selects are latency-bound on L separate
    chains). Semantics per array are identical to :func:`radix_topk`.

    ``scores_list``: tuple of 1-D arrays (arbitrary unequal lengths —
    no padding); ``ks``: matching tuple of ints. Returns a list of
    (values [k], indices [k] int32). vmap-safe.
    """
    assert len(scores_list) == len(ks)
    full, search = [], []
    for i, (s, k) in enumerate(zip(scores_list, ks)):
        (full if k >= s.shape[0] else search).append(i)
    out = [None] * len(ks)
    for i in full:
        out[i] = jax.lax.top_k(scores_list[i],
                               min(ks[i], scores_list[i].shape[0]))
    if search:
        xs, codes = [], []
        nbits = None
        for i in search:
            x = jnp.where(scores_list[i] == 0,
                          jnp.zeros_like(scores_list[i]),
                          scores_list[i])
            code, nbits = _to_code(x)
            xs.append(x)
            codes.append(code)
        ts = _kth_code_multi(codes, [ks[i] for i in search], nbits,
                             bits_per_trip=bits_per_trip)
        for x, code, t, i in zip(xs, codes, ts, search):
            out[i] = _pack_topk(x, code, t, ks[i], lanes)
    return out


def radix_topk_masked(scores: jnp.ndarray, valid: jnp.ndarray, k: int):
    """Top-k of scores where valid, -inf elsewhere (common pre-NMS
    pattern). Returns (values, indices); invalid selections (only when
    fewer than k valid) carry -inf values."""
    return radix_topk(
        jnp.where(valid, scores,
                  jnp.array(-jnp.inf, scores.dtype)), k)
