"""Phase-decomposed 3x3/s2 max pool == nn.max_pool (models/common.py)."""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import pytest

from object_detectors_tpu.models.common import max_pool_3x3_s2


def _ref(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))


@pytest.mark.parametrize("h,w", [(8, 8), (320, 320), (16, 32), (10, 6)])
def test_matches_reduce_window(h, w):
    rng = np.random.RandomState(h * 100 + w)
    x = jnp.asarray(rng.randn(2, h, w, 5).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(max_pool_3x3_s2(x)),
                                  np.asarray(_ref(x)))


def test_odd_dims_fallback():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 7, 9, 3).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(max_pool_3x3_s2(x)),
                                  np.asarray(_ref(x)))


def test_bf16():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 64, 64, 4).astype(np.float32)).astype(
        jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(max_pool_3x3_s2(x).astype(jnp.float32)),
        np.asarray(_ref(x).astype(jnp.float32)))
