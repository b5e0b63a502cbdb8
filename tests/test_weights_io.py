"""Darknet .weights import + torch-layout conversion tests (synthetic
binary files; layout semantics of yolohead.py:90-164)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from object_detectors_tpu.models.yolo import YoloHead
from object_detectors_tpu.utils import weights_io as W


def _sizes_for(params, batch_stats, order):
    """Walk the explicit order, compute the float count of the stream."""
    total = 0
    for path, sub in W._conv_bn_order(params, explicit_order=order):
        if "plain" in sub:
            leaf = sub["plain"]
            total += leaf["bias"].size + leaf["kernel"].size
        else:
            n = sub["bn"]["bias"].size
            total += 4 * n + sub["conv"]["kernel"].size
    return total


@pytest.fixture(scope="module")
def tiny_model():
    model = YoloHead(num_classes=4, backbone_layers=(1, 1, 1, 1, 1))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    return model, variables


def test_darknet_weights_roundtrip(tmp_path, tiny_model):
    model, variables = tiny_model
    order = W.yolo_head_order((1, 1, 1, 1, 1))
    n_floats = _sizes_for(variables["params"], variables["batch_stats"],
                          order)
    rng = np.random.RandomState(0)
    stream = rng.randn(n_floats).astype(np.float32)
    path = str(tmp_path / "test.weights")
    with open(path, "wb") as f:
        np.zeros(5, np.int32).tofile(f)
        stream.tofile(f)

    new_p, new_s, consumed = W.load_darknet_weights(
        variables["params"], variables["batch_stats"], path, order)
    assert consumed == n_floats

    # first block is the stem: bn bias/scale/mean/var then conv kernel
    stem = new_p["backbone"]["stem"]
    nb = stem["bn"]["bias"].size
    np.testing.assert_array_equal(np.asarray(stem["bn"]["bias"]),
                                  stream[:nb])
    np.testing.assert_array_equal(np.asarray(stem["bn"]["scale"]),
                                  stream[nb:2 * nb])
    stats = new_s["backbone"]["stem"]["bn"]
    np.testing.assert_array_equal(np.asarray(stats["mean"]),
                                  stream[2 * nb:3 * nb])
    np.testing.assert_array_equal(np.asarray(stats["var"]),
                                  stream[3 * nb:4 * nb])
    # kernel converted from [out,in,kh,kw] to [kh,kw,in,out]
    k = np.asarray(stem["conv"]["kernel"])
    torch_k = stream[4 * nb:4 * nb + k.size].reshape(
        k.shape[3], k.shape[2], k.shape[0], k.shape[1])
    np.testing.assert_array_equal(k, torch_k.transpose(2, 3, 1, 0))


def test_darknet_weights_exhaustion_error(tmp_path, tiny_model):
    model, variables = tiny_model
    path = str(tmp_path / "short.weights")
    with open(path, "wb") as f:
        np.zeros(5, np.int32).tofile(f)
        np.zeros(10, np.float32).tofile(f)
    with pytest.raises(ValueError, match="exhausted"):
        W.load_darknet_weights(variables["params"],
                               variables["batch_stats"], path,
                               W.yolo_head_order((1, 1, 1, 1, 1)))


def test_loaded_model_still_runs(tmp_path, tiny_model):
    model, variables = tiny_model
    order = W.yolo_head_order((1, 1, 1, 1, 1))
    n = _sizes_for(variables["params"], variables["batch_stats"], order)
    path = str(tmp_path / "run.weights")
    with open(path, "wb") as f:
        np.zeros(5, np.int32).tofile(f)
        (np.random.RandomState(1).randn(n) * 0.01).astype(
            np.float32).tofile(f)
    new_p, new_s, _ = W.load_darknet_weights(
        variables["params"], variables["batch_stats"], path, order)
    # variance must be positive for BN; fix up synthetic stats
    new_s = jax.tree_util.tree_map(jnp.abs, new_s)
    out = model.apply({"params": new_p, "batch_stats": new_s},
                      jnp.zeros((1, 64, 64, 3)), train=False)
    assert np.isfinite(np.asarray(out[0])).all()


def test_torch_tensor_conversion():
    conv = np.zeros((8, 3, 3, 3))  # torch [out,in,kh,kw]
    name, arr = W.torch_tensor_to_flax("backbone.conv1.weight", conv)
    assert name == "kernel" and arr.shape == (3, 3, 3, 8)
    lin = np.zeros((10, 20))
    name, arr = W.torch_tensor_to_flax("fc6.weight", lin)
    assert name == "kernel" and arr.shape == (20, 10)
    bn_w = np.zeros(16)
    name, _ = W.torch_tensor_to_flax("bn1.weight", bn_w)
    assert name == "scale"
    name, _ = W.torch_tensor_to_flax("bn1.running_mean", bn_w)
    assert name == "mean"


def test_strip_module_prefix():
    sd = {"module.backbone.conv.weight": 1, "head.bias": 2}
    out = W.strip_module_prefix(sd)
    assert "backbone.conv.weight" in out and "head.bias" in out


def test_torch_resnet_state_dict_conversion():
    """Synthetic resnet-shaped torch state dict converts into trees with
    exactly our ResNet's structure (loadable params + frozen stats)."""
    from object_detectors_tpu.models.resnet import ResNet

    layers = (1, 1, 1, 1)
    model = ResNet(layers, "bottleneck", "frozen")
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)

    rng = np.random.RandomState(0)
    sd = {}

    def add_bn(prefix, n):
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{prefix}.{leaf}"] = rng.randn(n).astype(np.float32)

    sd["conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32)
    add_bn("bn1", 64)
    inplanes = 64
    for stage in range(4):
        planes = 64 * (2 ** stage)
        t = f"layer{stage+1}.0"
        sd[f"{t}.conv1.weight"] = rng.randn(
            planes, inplanes, 1, 1).astype(np.float32)
        add_bn(f"{t}.bn1", planes)
        sd[f"{t}.conv2.weight"] = rng.randn(
            planes, planes, 3, 3).astype(np.float32)
        add_bn(f"{t}.bn2", planes)
        sd[f"{t}.conv3.weight"] = rng.randn(
            planes * 4, planes, 1, 1).astype(np.float32)
        add_bn(f"{t}.bn3", planes * 4)
        sd[f"{t}.downsample.0.weight"] = rng.randn(
            planes * 4, inplanes, 1, 1).astype(np.float32)
        add_bn(f"{t}.downsample.1", planes * 4)
        inplanes = planes * 4

    params, frozen = W.torch_resnet_to_flax(sd, layers)

    def tree_shapes(t):
        return {k: (tree_shapes(v) if isinstance(v, dict)
                    else tuple(v.shape)) for k, v in t.items()}

    assert tree_shapes(params) == tree_shapes(variables["params"])
    assert tree_shapes(frozen) == tree_shapes(variables["frozen"])
    # converted weights actually run
    out = model.apply({"params": params, "frozen": frozen},
                      jnp.zeros((1, 64, 64, 3)), train=False)
    assert len(out) == 4


def test_flax_to_torch_roundtrip_fasterrcnn():
    """Inverse converter: torch sd -> flax -> torch must round-trip every
    parameter bit-exactly (enables trained-weight parity runs)."""
    import numpy as np
    from object_detectors_tpu.utils import weights_io as W

    rng = np.random.RandomState(0)
    # minimal fake torch state dict exercising every leaf type
    sd = {}

    def conv(prefix, o, i, k=3):
        sd[prefix + ".weight"] = rng.randn(o, i, k, k).astype(np.float32)
        sd[prefix + ".bias"] = rng.randn(o).astype(np.float32)

    def bn(prefix, c):
        for n in ("weight", "bias", "running_mean", "running_var"):
            sd[prefix + "." + n] = rng.rand(c).astype(np.float32) + 0.5

    def convbn(prefix, o, i, k=3):
        sd[prefix + ".weight"] = rng.randn(o, i, k, k).astype(np.float32)

    # resnet18-ish body (2,2,2,2) basic blocks
    convbn("backbone.body.conv1", 64, 3, 7)
    bn("backbone.body.bn1", 64)
    chans = [64, 128, 256, 512]
    for s, c in enumerate(chans):
        cin = 64 if s == 0 else chans[s - 1]
        for b in range(2):
            p = f"backbone.body.layer{s+1}.{b}"
            convbn(p + ".conv1", c, cin if b == 0 else c)
            bn(p + ".bn1", c)
            convbn(p + ".conv2", c, c)
            bn(p + ".bn2", c)
            if b == 0 and s > 0:
                convbn(p + ".downsample.0", c, cin, 1)
                bn(p + ".downsample.1", c)
    for i, c in enumerate(chans):
        conv(f"backbone.fpn.inner_blocks.{i}", 32, c, 1)
        conv(f"backbone.fpn.layer_blocks.{i}", 32, 32)
    conv("rpn.head.conv", 32, 32)
    conv("rpn.head.cls_logits", 3, 32, 1)
    conv("rpn.head.bbox_pred", 12, 32, 1)
    sd["roi_heads.box_head.fc6.weight"] = rng.randn(
        64, 32 * 49).astype(np.float32)
    sd["roi_heads.box_head.fc6.bias"] = rng.randn(64).astype(np.float32)
    sd["roi_heads.box_head.fc7.weight"] = rng.randn(
        64, 64).astype(np.float32)
    sd["roi_heads.box_head.fc7.bias"] = rng.randn(64).astype(np.float32)
    sd["roi_heads.box_predictor.cls_score.weight"] = rng.randn(
        5, 64).astype(np.float32)
    sd["roi_heads.box_predictor.cls_score.bias"] = rng.randn(
        5).astype(np.float32)
    sd["roi_heads.box_predictor.bbox_pred.weight"] = rng.randn(
        20, 64).astype(np.float32)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = rng.randn(
        20).astype(np.float32)

    variables = W.torch_fasterrcnn_to_flax(sd, layers=(2, 2, 2, 2))
    back = W.flax_fasterrcnn_to_torch(variables, sd, layers=(2, 2, 2, 2))
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_overwrite_eps_matches_true_eps_change():
    """overwrite_eps folds an eps change into running_var: a frozen BN
    with module eps 1e-5 on the fixed-up vars equals one evaluated at
    the requested eps on the original vars (tvision/frcnn.py:302-376
    overwrite_eps(model, 0.0))."""
    import jax
    import jax.numpy as jnp
    from object_detectors_tpu.models.common import FrozenBatchNorm
    from object_detectors_tpu.utils import weights_io as W

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    bn = FrozenBatchNorm(8)
    v = bn.init(jax.random.key(0), x)
    v = jax.tree.map(lambda a: a + 0.3, v)  # non-trivial stats
    fixed = W.overwrite_eps(v, eps=0.0)
    got = bn.apply(fixed, x)
    ref = FrozenBatchNorm(8, epsilon=0.0).apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
