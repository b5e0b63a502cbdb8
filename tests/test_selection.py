"""radix_topk: exact-set parity with lax.top_k (ops/selection.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detectors_tpu.ops.selection import radix_topk, radix_topk_masked
from object_detectors_tpu.ops import selection as S


def _set_parity(scores, k):
    """Selected (value-multiset, tie rule) must match lax.top_k."""
    rv, ri = radix_topk(scores, k)
    tv, ti = jax.lax.top_k(scores, min(k, scores.shape[0]))
    # identical value multiset
    np.testing.assert_array_equal(np.sort(np.asarray(rv)),
                                  np.sort(np.asarray(tv)))
    # identical index SET (both use lowest-index-first ties)
    assert set(np.asarray(ri).tolist()) == set(np.asarray(ti).tolist())
    # returned values actually live at the returned indices
    np.testing.assert_array_equal(np.asarray(rv),
                                  np.asarray(scores)[np.asarray(ri)])


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("n,k", [(1000, 100), (4567, 1000), (91008, 1000),
                                 (130, 128), (127, 50)])
def test_random(dtype, n, k):
    rng = np.random.RandomState(n + k)
    s = jnp.asarray(rng.randn(n).astype(np.float32)).astype(dtype)
    _set_parity(s, k)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_heavy_ties(dtype):
    rng = np.random.RandomState(7)
    # integers in a tiny range -> massive ties straddling the k-th value
    s = jnp.asarray(rng.randint(0, 5, 5000).astype(np.float32)).astype(
        dtype)
    _set_parity(s, 700)


def test_neg_inf_padding():
    rng = np.random.RandomState(1)
    s = np.full(3000, -np.inf, np.float32)
    s[:40] = rng.randn(40)
    s = jnp.asarray(s)
    rv, ri = radix_topk(s, 500)
    # the 40 finite values must all be selected; the rest are -inf
    assert int(jnp.sum(jnp.isfinite(rv))) == 40
    _set_parity(s, 500)


def test_negative_zero_ties():
    s = np.zeros(600, np.float32)
    s[::2] = -0.0
    s[5] = 1.0
    rv, ri = radix_topk(jnp.asarray(s), 10)
    assert int(jnp.sum(rv == 1.0)) == 1
    # -0.0 and +0.0 are the same value: ties go lowest-index-first
    assert sorted(np.asarray(ri).tolist())[:9] == [0, 1, 2, 3, 4, 5, 6,
                                                   7, 8]


def test_k_ge_n_degenerate():
    s = jnp.asarray(np.random.RandomState(3).randn(50).astype(np.float32))
    rv, ri = radix_topk(s, 50)
    tv, _ = jax.lax.top_k(s, 50)
    np.testing.assert_array_equal(np.sort(np.asarray(rv)),
                                  np.sort(np.asarray(tv)))


def test_vmap_and_jit():
    rng = np.random.RandomState(9)
    s = jnp.asarray(rng.randn(4, 2048).astype(np.float32))
    f = jax.jit(jax.vmap(lambda x: radix_topk(x, 100)))
    rv, ri = f(s)
    assert rv.shape == (4, 100) and ri.shape == (4, 100)
    for b in range(4):
        tv, _ = jax.lax.top_k(s[b], 100)
        np.testing.assert_array_equal(np.sort(np.asarray(rv[b])),
                                      np.sort(np.asarray(tv)))


def test_masked():
    rng = np.random.RandomState(11)
    s = jnp.asarray(rng.rand(1000).astype(np.float32))
    valid = jnp.asarray(rng.rand(1000) > 0.99)
    rv, ri = radix_topk_masked(s, valid, 64)
    nvalid = int(jnp.sum(valid))
    assert int(jnp.sum(jnp.isfinite(rv))) == min(64, nvalid)
    finite = np.asarray(jnp.isfinite(rv))
    assert np.asarray(valid)[np.asarray(ri)[finite]].all()


def test_bf16_matches_f32_cast_selection():
    """Selecting on bf16 directly == selecting on its exact f32 cast
    (the cast is injective+monotone), so pipelines may skip the cast."""
    rng = np.random.RandomState(13)
    s16 = jnp.asarray(rng.randn(8192).astype(np.float32)).astype(
        jnp.bfloat16)
    _, i16 = radix_topk(s16, 300)
    _, i32 = radix_topk(s16.astype(jnp.float32), 300)
    assert set(np.asarray(i16).tolist()) == set(np.asarray(i32).tolist())


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_nan_orders_below_everything(dtype):
    """NaN scores sort below -inf (ADVICE r3: a NaN-producing checkpoint
    must not yield garbage selections — lax.top_k would rank NaN above
    +inf). NaN only reaches the output when fewer than k scores are
    non-NaN, and then visibly (as NaN values)."""
    s = np.array([3.0, np.nan, 1.0, -np.inf, np.nan, 2.0, 0.5],
                 np.float32)
    sj = jnp.asarray(s).astype(dtype)
    rv, ri = radix_topk(sj, 4)
    # the 4 best non-NaN values, no NaN selected
    np.testing.assert_array_equal(
        np.sort(np.asarray(rv, np.float32)), [0.5, 1.0, 2.0, 3.0])
    assert not np.isnan(np.asarray(rv, np.float32)).any()
    # k beyond the non-NaN count: -inf selected before any NaN, the
    # remainder visibly NaN
    rv6, _ = radix_topk(sj, 6)
    v6 = np.asarray(rv6, np.float32)
    assert np.isneginf(v6).sum() == 1 and np.isnan(v6).sum() == 1


def test_radix_topk_multi_matches_single():
    """The fused-chain multi-array select must return exactly what
    per-array radix_topk returns (same sets, same lowest-index tie
    breaks), for unequal lengths, heavy ties, k >= n rows, and both
    trip widths."""
    rng = np.random.RandomState(9)
    arrays = [
        rng.randn(1000).astype(np.float32),
        np.repeat(rng.randn(30).astype(np.float32), 17),  # ties
        rng.randn(7).astype(np.float32),                  # k >= n
        rng.randn(333).astype(np.float32),
    ]
    arrays[0][::50] = 2.5  # cross-array tie plateau at the kth value
    ks = (100, 64, 10, 333)
    js = tuple(jnp.asarray(a) for a in arrays)
    for bpt in (2, 4):
        multi = S.radix_topk_multi(js, ks, bits_per_trip=bpt)
        for a, k, (mv, mi) in zip(js, ks, multi):
            sv, si = S.radix_topk(a, k)
            np.testing.assert_array_equal(np.asarray(si),
                                          np.asarray(mi))
            np.testing.assert_array_equal(np.asarray(sv),
                                          np.asarray(mv))


def test_radix_topk_multi_vmap():
    rng = np.random.RandomState(4)
    a = jnp.asarray(rng.randn(3, 500).astype(np.float32))
    b = jnp.asarray(rng.randn(3, 90).astype(np.float32))

    def f(x, y):
        (va, ia), (vb, ib) = S.radix_topk_multi((x, y), (50, 20))
        return va, ia, vb, ib

    va, ia, vb, ib = jax.vmap(f)(a, b)
    for i in range(3):
        sv, si = S.radix_topk(a[i], 50)
        np.testing.assert_array_equal(np.asarray(ia[i]), np.asarray(si))
        sv, si = S.radix_topk(b[i], 20)
        np.testing.assert_array_equal(np.asarray(ib[i]), np.asarray(si))
