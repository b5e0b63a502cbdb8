"""Fused bottleneck block kernel vs the Flax Bottleneck (interpret)."""

import numpy as np
import jax
import jax.numpy as jnp

from object_detectors_tpu.kernels.fused_block import (
    fold_bn, fused_bottleneck,
)
from object_detectors_tpu.models.resnet import Bottleneck


def _bn(rng, c):
    return {
        "weight": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
        "running_mean": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
        "running_var": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
    }


def _run_case(has_down, seed):
    rng = np.random.RandomState(seed)
    cin, cm = 32, 8
    cout = cin
    b, h, w = 2, 16, 24
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32),
                    jnp.bfloat16)

    block = Bottleneck(cm, 1, downsample=has_down, norm="frozen",
                       dtype=jnp.bfloat16, expansion=cout // cm)
    variables = block.init(jax.random.key(seed), x, False)
    params = jax.tree.map(
        lambda p: jnp.asarray(np.random.RandomState(seed + 1)
                              .randn(*p.shape).astype(np.float32) * 0.2),
        variables["params"])
    frozen = {k: _bn(rng, v["weight"].shape[0])
              for k, v in variables["frozen"].items()}
    variables = {"params": params, "frozen": frozen}
    ref = block.apply(variables, x, False)

    w1, b1 = fold_bn(params["conv1"]["kernel"][0, 0], frozen["bn1"])
    w2, b2 = fold_bn(params["conv2"]["kernel"], frozen["bn2"])
    w3, b3 = fold_bn(params["conv3"]["kernel"][0, 0], frozen["bn3"])
    wd = bd = None
    if has_down:
        wd, bd = fold_bn(params["down_conv"]["kernel"][0, 0],
                         frozen["down_bn"])
    out = fused_bottleneck(x, w1, b1, w2, b2, w3, b3, wd, bd, tr=8,
                           interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.1, atol=0.15)  # bf16 + BN-fold rounding
    # tighter check on the mean to catch structural errors
    assert abs(float(jnp.mean(out - ref.astype(out.dtype)))) < 1e-2


def test_fused_block_matches_flax_identity_path():
    _run_case(has_down=False, seed=0)


def test_fused_block_matches_flax_downsample_path():
    _run_case(has_down=True, seed=1)


def test_resnet_fused_eval_matches_flax_path():
    """ResNet(fused='interpret') must produce the same features as
    fused='off' with SHARED variables (param-tree compatibility +
    numerical equivalence through stacked blocks)."""
    from object_detectors_tpu.models.resnet import ResNet

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32),
                    jnp.bfloat16)
    off = ResNet((1, 1), "bottleneck", "frozen", jnp.bfloat16,
                 fused="off")
    v = off.init(jax.random.key(0), x, False)
    ref = off.apply(v, x, False)
    fused = ResNet((1, 1), "bottleneck", "frozen", jnp.bfloat16,
                   fused="interpret")
    out = fused.apply(v, x, False)
    assert len(out) == len(ref)
    for o, r in zip(out, ref):
        assert o.shape == r.shape
        np.testing.assert_allclose(np.asarray(o, np.float32),
                                   np.asarray(r, np.float32),
                                   rtol=0.1, atol=0.2)
        assert abs(float(jnp.mean(o - r))) < 2e-2
