"""Pretrained weight import: Darknet binary `.weights` and torch
state-dicts -> our Flax parameter trees.

Parity with `yolo/nets/yolohead.py:90-164` (raw Darknet .weights reader:
5 int32 header then float32 stream in [bn_bias, bn_weight, bn_mean,
bn_var, conv_kernel] order per conv-bn block, [bias, kernel] for plain
convs) and `yolo/procedures/initialize.py:57-104` (torch checkpoint
loading with `module.` prefix strip).

Layout conversions: torch conv kernels are [out, in, kh, kw]; Flax NHWC
kernels are [kh, kw, in, out] (transpose 2,3,1,0). Linear: torch
[out, in] -> Flax [in, out].
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def darknet_block_order(layers=(1, 2, 8, 8, 4)):
    """Explicit conv-bn traversal order of our DarkNet matching the
    Darknet file stream (stem, then per stage: downsample + residual
    conv1/conv2 pairs)."""
    order = [("stem",)]
    for stage, blocks in enumerate(layers):
        order.append((f"down{stage+1}",))
        for b in range(blocks):
            order.append((f"stage{stage+1}_block{b}", "conv1"))
            order.append((f"stage{stage+1}_block{b}", "conv2"))
    return order


def yolo_head_order(layers=(1, 2, 8, 8, 4)):
    """Full YoloHead order mirroring the reference's module registration
    (yolohead.py __init__: backbone, embedding0, embedding1_cbl,
    embedding1, embedding2_cbl, embedding2)."""
    order = [("backbone",) + p for p in darknet_block_order(layers)]
    for emb, lateral in (("embedding0", None),
                         ("embedding1", "lateral1"),
                         ("embedding2", "lateral2")):
        if lateral:
            order.append((lateral,))
        for i in range(6):
            order.append((emb, f"cbl{i}"))
        order.append((emb, "conv_out"))
    return order


def _conv_bn_order(tree: dict, prefix=(), explicit_order=None):
    """Yield (path, leaf_dict) for every ConvBN-like subtree.

    With ``explicit_order`` (list of key paths) the traversal follows it
    exactly — dict insertion order is NOT a reliable contract across
    flax/orbax round-trips, so known models pass their explicit layout
    (see darknet_block_order / yolo_head_order)."""
    if explicit_order is not None:
        for path in explicit_order:
            sub = _get_path(tree, path)
            if "conv" in sub and "bn" in sub:
                yield tuple(path), sub
            else:
                yield tuple(path), {"plain": sub}
        return
    for name, sub in tree.items():
        path = prefix + (name,)
        if isinstance(sub, dict):
            if "conv" in sub and "bn" in sub:
                yield path, sub
            elif "kernel" in sub:  # plain conv (conv_out)
                yield path, {"plain": sub}
            else:
                yield from _conv_bn_order(sub, path)


def load_darknet_weights(params: dict, batch_stats: dict,
                         weights_path: str, explicit_order=None):
    """Load a raw Darknet `.weights` file into (params, batch_stats)
    copies. Returns (new_params, new_batch_stats, floats_consumed).

    ``explicit_order``: key-path list (see yolo_head_order) — required
    for full-model files; backbone-only files (darknet53.conv.74) can
    pass darknet_block_order()."""
    with open(weights_path, "rb") as f:
        header = np.fromfile(f, dtype=np.int32, count=5)
        del header
        stream = np.fromfile(f, dtype=np.float32)

    ptr = 0
    new_params = jax_tree_copy(params)
    new_stats = jax_tree_copy(batch_stats)

    def take(n):
        nonlocal ptr
        out = stream[ptr:ptr + n]
        if out.size != n:
            raise ValueError(
                f"weights file exhausted at {ptr} (+{n}/{stream.size})")
        ptr += n
        return out

    for path, sub in _conv_bn_order(new_params,
                                    explicit_order=explicit_order):
        if "plain" in sub:
            leaf = sub["plain"]
            kernel = leaf["kernel"]
            if "bias" in leaf:
                leaf["bias"] = jnp.asarray(take(leaf["bias"].size))
            kh, kw, cin, cout = kernel.shape
            w = take(kernel.size).reshape(cout, cin, kh, kw)
            leaf["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
            continue
        bn_p = sub["bn"]
        stats = _get_path(new_stats, path + ("bn",))
        n = bn_p["bias"].size
        bn_p["bias"] = jnp.asarray(take(n))
        bn_p["scale"] = jnp.asarray(take(n))
        stats["mean"] = jnp.asarray(take(n))
        stats["var"] = jnp.asarray(take(n))
        kernel = sub["conv"]["kernel"]
        kh, kw, cin, cout = kernel.shape
        w = take(kernel.size).reshape(cout, cin, kh, kw)
        sub["conv"]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
    return new_params, new_stats, ptr


def torch_tensor_to_flax(name: str, array: np.ndarray):
    """Map one torch parameter to (flax_leaf_name, converted array)."""
    if array.ndim == 4:  # conv kernel
        return "kernel", array.transpose(2, 3, 1, 0)
    if array.ndim == 2:  # linear
        return "kernel", array.transpose(1, 0)
    if name.endswith("running_mean"):
        return "mean", array
    if name.endswith("running_var"):
        return "var", array
    if ".bn" in name or "bn." in name:
        if name.endswith("weight"):
            return "scale", array
        return "bias", array
    if name.endswith("weight"):
        return "scale", array  # 1-d weight = norm scale
    return "bias", array


def strip_module_prefix(state_dict: dict) -> dict:
    """DDP `module.` prefix strip (initialize.py:88-95)."""
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in state_dict.items()}


def jax_tree_copy(tree):
    if isinstance(tree, dict):
        return {k: jax_tree_copy(v) for k, v in tree.items()}
    return tree


def _get_path(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def torch_resnet_to_flax(state_dict: dict, layers=(3, 4, 6, 3)):
    """Convert a torchvision ResNet state_dict (the pretrained backbones
    the reference pulls via torch.hub, utilities/resnet.py) into our
    ResNet's (params, frozen) trees.

    torch names: conv1/bn1, layer{1..4}.{i}.conv{1..3}/bn{1..3} and
    .downsample.{0,1}. Ours: conv1/bn1(frozen), layer{s}_block{i} with
    conv1..3/bn1..3 and down_conv/down_bn. BN stats land in the 'frozen'
    collection (FrozenBatchNorm)."""
    sd = strip_module_prefix({k: np.asarray(v)
                              for k, v in state_dict.items()})

    params: dict = {}
    frozen: dict = {}

    def put(tree, path, leaf, value):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = jnp.asarray(value)

    def bn_into(path, prefix):
        put(frozen, path, "weight", sd[prefix + ".weight"])
        put(frozen, path, "bias", sd[prefix + ".bias"])
        put(frozen, path, "running_mean", sd[prefix + ".running_mean"])
        put(frozen, path, "running_var", sd[prefix + ".running_var"])

    put(params, ("conv1",), "kernel",
        sd["conv1.weight"].transpose(2, 3, 1, 0))
    bn_into(("bn1",), "bn1")

    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            t = f"layer{stage+1}.{b}"
            o = f"layer{stage+1}_block{b}"
            for ci in (1, 2, 3):
                key = f"{t}.conv{ci}.weight"
                if key not in sd:
                    continue
                put(params, (o, f"conv{ci}"), "kernel",
                    sd[key].transpose(2, 3, 1, 0))
                bn_into((o, f"bn{ci}"), f"{t}.bn{ci}")
            dkey = f"{t}.downsample.0.weight"
            if dkey in sd:
                put(params, (o, "down_conv"), "kernel",
                    sd[dkey].transpose(2, 3, 1, 0))
                bn_into((o, "down_bn"), f"{t}.downsample.1")
    return params, frozen
