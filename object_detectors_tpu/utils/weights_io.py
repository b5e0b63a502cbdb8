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


def _t_conv(sd, key):
    return jnp.asarray(np.asarray(sd[key]).transpose(2, 3, 1, 0))


def _t_linear(sd, key):
    return jnp.asarray(np.asarray(sd[key]).transpose(1, 0))


def _t_vec(sd, key):
    return jnp.asarray(np.asarray(sd[key]))


def _conv_leaf(sd, prefix):
    return {"kernel": _t_conv(sd, prefix + ".weight"),
            "bias": _t_vec(sd, prefix + ".bias")}


def _linear_leaf(sd, prefix):
    return {"kernel": _t_linear(sd, prefix + ".weight"),
            "bias": _t_vec(sd, prefix + ".bias")}


def _fc6_leaf(sd, prefix, channels, pool=7):
    """box_head.fc6 flattens torch's [C, 7, 7] (c, y, x) pooled layout;
    ours flattens NHWC (y, x, c) — permute the input dimension."""
    w = np.asarray(sd[prefix + ".weight"])          # [1024, C*7*7]
    w = w.reshape(-1, channels, pool, pool)
    w = w.transpose(2, 3, 1, 0).reshape(pool * pool * channels, -1)
    return {"kernel": jnp.asarray(w), "bias": _t_vec(sd, prefix + ".bias")}


def _fpn_params(sd, prefix="backbone.fpn.", n_levels=4, extra=None):
    """torchvision FPN inner_blocks/layer_blocks -> our inner{i}/layer{i}
    (+ p6/p7 for RetinaNet's LastLevelP6P7)."""
    out = {}
    for i in range(n_levels):
        out[f"inner{i}"] = _conv_leaf(sd, f"{prefix}inner_blocks.{i}")
        out[f"layer{i}"] = _conv_leaf(sd, f"{prefix}layer_blocks.{i}")
    if extra == "p6p7":
        out["p6"] = _conv_leaf(sd, f"{prefix}extra_blocks.p6")
        out["p7"] = _conv_leaf(sd, f"{prefix}extra_blocks.p7")
    return out


def torch_fasterrcnn_to_flax(state_dict: dict, layers=(3, 4, 6, 3),
                             with_mask: bool = False,
                             with_keypoints: bool = False):
    """Full torch FasterRCNN/MaskRCNN/KeypointRCNN (torchvision layout —
    `tvision/frcnn.py:302-376` pretrained loaders consume the same dict)
    -> our {'params', 'frozen'} variables.

    Covers backbone.body (ResNet + FrozenBN), backbone.fpn, rpn.head,
    roi_heads.box_head/box_predictor, and the mask/keypoint branches.
    """
    sd = strip_module_prefix({k: np.asarray(v)
                              for k, v in state_dict.items()})
    body = {k[len("backbone.body."):]: v for k, v in sd.items()
            if k.startswith("backbone.body.")}
    res_params, res_frozen = torch_resnet_to_flax(body, layers)

    pool_c = sd["backbone.fpn.inner_blocks.0.bias"].shape[0]
    params = {
        "backbone": {"resnet": res_params,
                     "fpn": _fpn_params(sd)},
        "rpn_head": {
            "conv": _conv_leaf(sd, "rpn.head.conv"),
            "cls_logits": _conv_leaf(sd, "rpn.head.cls_logits"),
            "bbox_pred": _conv_leaf(sd, "rpn.head.bbox_pred"),
        },
        "box_head": {
            "fc6": _fc6_leaf(sd, "roi_heads.box_head.fc6", pool_c),
            "fc7": _linear_leaf(sd, "roi_heads.box_head.fc7"),
        },
        "box_predictor": {
            "cls_score": _linear_leaf(sd, "roi_heads.box_predictor.cls_score"),
            "bbox_pred": _linear_leaf(sd, "roi_heads.box_predictor.bbox_pred"),
        },
    }
    if with_mask:
        params["mask_head"] = {
            f"mask_fcn{i}": _conv_leaf(
                sd, f"roi_heads.mask_head.mask_fcn{i}")
            for i in (1, 2, 3, 4)}
        params["mask_predictor"] = {
            "conv5_mask": _deconv_leaf(
                sd, "roi_heads.mask_predictor.conv5_mask"),
            "mask_fcn_logits": _conv_leaf(
                sd, "roi_heads.mask_predictor.mask_fcn_logits"),
        }
    if with_keypoints:
        n = len([k for k in sd
                 if k.startswith("roi_heads.keypoint_head.kps_fcn")
                 and k.endswith(".weight")])
        params["kp_head"] = {
            f"kps_fcn{i}": _conv_leaf(
                sd, f"roi_heads.keypoint_head.kps_fcn{i}")
            for i in range(1, n + 1)}
        params["kp_predictor"] = {
            "kps_score_lowres": _deconv_leaf(
                sd, "roi_heads.keypoint_predictor.kps_score_lowres")}
    return {"params": params,
            "frozen": {"backbone": {"resnet": res_frozen}}}


def _deconv_leaf(sd, prefix):
    """torch ConvTranspose2d weight [in, out, kh, kw] -> flax
    ConvTranspose kernel [kh, kw, in, out]. flax's conv_transpose with
    transpose_kernel=False correlates with the kernel as stored, which
    matches torch's gradient-of-conv once spatial dims are FLIPPED."""
    w = np.asarray(sd[prefix + ".weight"])  # [in, out, kh, kw]
    w = w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    return {"kernel": jnp.asarray(w), "bias": _t_vec(sd, prefix + ".bias")}


def torch_retinanet_to_flax(state_dict: dict, layers=(3, 4, 6, 3)):
    """torch RetinaNet (tvision/retinanet.py layout: backbone P3..P7 via
    LastLevelP6P7, shared 4-conv towers) -> our {'params', 'frozen'}."""
    sd = strip_module_prefix({k: np.asarray(v)
                              for k, v in state_dict.items()})
    body = {k[len("backbone.body."):]: v for k, v in sd.items()
            if k.startswith("backbone.body.")}
    res_params, res_frozen = torch_resnet_to_flax(body, layers)
    head = {}
    for i in range(4):
        head[f"cls_conv{i}"] = _conv_leaf(
            sd, f"head.classification_head.conv.{2 * i}")
        head[f"reg_conv{i}"] = _conv_leaf(
            sd, f"head.regression_head.conv.{2 * i}")
    head["cls_logits"] = _conv_leaf(
        sd, "head.classification_head.cls_logits")
    head["bbox_reg"] = _conv_leaf(sd, "head.regression_head.bbox_reg")
    params = {
        "backbone": {"resnet": res_params,
                     "fpn": _fpn_params(sd, n_levels=3, extra="p6p7")},
        "head": head,
    }
    return {"params": params,
            "frozen": {"backbone": {"resnet": res_frozen}}}


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


# --------------------------------------------------------------------- #
# flax -> torch (inverse conversion, for trained-weight parity runs)
# --------------------------------------------------------------------- #

def _flax_leaf_to_torch(leaf: np.ndarray, t_shape: tuple, key: str):
    """Invert torch->flax leaf transforms by shape (+name for the
    deconv/conv 4D ambiguity and the fc6 flatten-order permutation)."""
    leaf = np.asarray(leaf)
    if leaf.ndim <= 1:
        return leaf
    if leaf.ndim == 2:  # linear layers are ALWAYS transposed (square
        # matrices must not hit a same-shape shortcut)
        if "fc6" in key:  # inverse of _fc6_leaf's (y, x, c) flatten
            out_f = t_shape[0]
            in_f = t_shape[1]
            pool = 7
            c = in_f // (pool * pool)
            w = leaf.reshape(pool, pool, c, out_f)
            return w.transpose(3, 2, 0, 1).reshape(out_f, in_f)
        return leaf.transpose(1, 0)
    if leaf.ndim == 4:
        is_deconv = ("conv5_mask" in key or "kps_score_lowres" in key)
        if is_deconv:  # inverse of _deconv_leaf (unflip + permute)
            return leaf[::-1, ::-1].transpose(2, 3, 0, 1).copy()
        return leaf.transpose(3, 2, 0, 1)
    raise ValueError(f"unmapped leaf {key} {leaf.shape} -> {t_shape}")


def invert_torch_to_flax(convert_fn, variables: dict, template_sd: dict,
                         **convert_kwargs) -> dict:
    """Generic inverse of a torch->flax converter: re-runs ``convert_fn``
    on a TAGGED state dict (each tensor filled with its key's index) to
    recover the flax-path -> torch-key mapping, then maps each flax leaf
    back with the inverse axis transform. Keys the converter never
    consumed (num_batches_tracked etc.) keep their template values."""
    keys = list(template_sd.keys())
    sd_tag = {k: np.full(np.asarray(v).shape, i, np.float64)
              for i, (k, v) in enumerate(template_sd.items())}
    tagged = convert_fn(sd_tag, **convert_kwargs)

    out_sd = {k: np.asarray(v).copy() for k, v in template_sd.items()}

    def walk(tag_node, var_node, path):
        if isinstance(tag_node, dict):
            for k in tag_node:
                walk(tag_node[k], var_node[k], path + (k,))
            return
        t = np.asarray(tag_node)
        tag = t.flat[0]
        if not (t == tag).all():
            raise ValueError(f"mixed-source leaf at {path}")
        key = keys[int(tag)]
        out_sd[key] = _flax_leaf_to_torch(
            np.asarray(var_node), np.asarray(template_sd[key]).shape, key)

    for coll in tagged:
        if coll in variables:
            walk(tagged[coll], variables[coll], (coll,))
    return out_sd


def flax_fasterrcnn_to_torch(variables: dict, template_sd: dict,
                             layers=(3, 4, 6, 3), with_mask=False,
                             with_keypoints=False) -> dict:
    """Our trained FasterRCNN/MaskRCNN/KeypointRCNN variables -> a torch
    state_dict loadable by the reference graph (parity with trained
    weights — VERDICT r2 item 4)."""
    return invert_torch_to_flax(
        torch_fasterrcnn_to_flax, variables, template_sd, layers=layers,
        with_mask=with_mask, with_keypoints=with_keypoints)


def flax_retinanet_to_torch(variables: dict, template_sd: dict,
                            layers=(3, 4, 6, 3)) -> dict:
    return invert_torch_to_flax(
        torch_retinanet_to_flax, variables, template_sd, layers=layers)


def torch_ssd_to_flax(state_dict: dict) -> dict:
    """torch SSD300-VGG16 (tvision/ssd.py:434-541 SSDFeatureExtractorVGG
    + SSDHead layout) -> our models/ssd.py variables.

    VGG features indices (cfg-D): convs at 0,2 / 5,7 / 10,12,14 /
    17,19,21; extra.0 wraps maxpool4+conv5_x+atrous fc6/fc7; extra.1-4
    are the conv8..conv11 pairs; heads are module_lists per level."""
    sd = strip_module_prefix({k: np.asarray(v)
                              for k, v in state_dict.items()})
    fe = "backbone.features."
    ex = "backbone.extra."
    vgg_map = {
        "conv1_1": fe + "0", "conv1_2": fe + "2",
        "conv2_1": fe + "5", "conv2_2": fe + "7",
        "conv3_1": fe + "10", "conv3_2": fe + "12", "conv3_3": fe + "14",
        "conv4_1": fe + "17", "conv4_2": fe + "19", "conv4_3": fe + "21",
        "conv5_0": ex + "0.1", "conv5_1": ex + "0.3",
        "conv5_2": ex + "0.5",
        "conv6": ex + "0.7.1", "conv7": ex + "0.7.3",
        "conv8_1": ex + "1.0", "conv8_2": ex + "1.2",
        "conv9_1": ex + "2.0", "conv9_2": ex + "2.2",
        "conv10_1": ex + "3.0", "conv10_2": ex + "3.2",
        "conv11_1": ex + "4.0", "conv11_2": ex + "4.2",
    }
    backbone = {ours: _conv_leaf(sd, theirs)
                for ours, theirs in vgg_map.items()}
    backbone["scale_weight"] = _t_vec(sd, "backbone.scale_weight")
    head = {}
    for i in range(6):
        head[f"cls{i}"] = _conv_leaf(
            sd, f"head.classification_head.module_list.{i}")
        head[f"reg{i}"] = _conv_leaf(
            sd, f"head.regression_head.module_list.{i}")
    return {"params": {"backbone": backbone, "head": head}}


def overwrite_eps(variables: dict, eps: float = 0.0,
                  module_eps: float = 1e-5) -> dict:
    """torchvision ``overwrite_eps(model, 0.0)`` equivalent
    (torchvision_models/tvision/frcnn.py:302-376 loads legacy
    pretrained detection weights whose FrozenBatchNorm2d stats were
    produced with eps=0): our FrozenBatchNorm keeps ``epsilon`` static
    at 1e-5, so the fixup folds the difference into ``running_var``
    — var' + module_eps == var + eps exactly, same normalization.

    Walks every dict in the 'frozen' collection holding a running_var
    leaf; returns a new variables pytree."""
    delta = eps - module_eps

    def walk(node):
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items()}
            if "running_var" in out:
                out["running_var"] = out["running_var"] + delta
            return out
        return node

    new = dict(variables)
    if "frozen" in new:
        new["frozen"] = walk(new["frozen"])
    return new
