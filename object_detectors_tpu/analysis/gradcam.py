"""Grad-CAM for the YOLO head — `yolo/utilities/gradcam.py:8-190` rebuilt.

The reference re-wires the torch module with a backward hook on the
backbone activations. In JAX the same thing is a closed-form
``jax.grad``: split the graph at the backbone boundary (the backbone is a
named submodule, so its params subtree applies standalone), treat the C5
activation as the differentiated input of the head-only function, and
compute CAM = ReLU(sum_c w_c * A_c) with w_c the spatial mean of
d(class score)/d(A_c).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from object_detectors_tpu.models.darknet import DarkNet
from object_detectors_tpu.models.yolo import YoloHead


def yolo_gradcam(
    model: YoloHead,
    variables,
    image: jnp.ndarray,
    class_id: int,
    scale: int = 0,
):
    """image [1, H, W, 3] -> CAM [h, w] in [0, 1] at the backbone's C5
    resolution, upsampling left to the caller.

    scale selects which detection scale's class logits form the target
    score (0 = stride 32).
    """
    backbone = DarkNet(tuple(model.backbone_layers), dtype=model.dtype)
    bb_vars = {"params": variables["params"]["backbone"]}
    if "batch_stats" in variables and "backbone" in variables.get(
            "batch_stats", {}):
        bb_vars["batch_stats"] = variables["batch_stats"]["backbone"]
    c3, c4, c5 = backbone.apply(bb_vars, image, False)

    attrs = 5 + model.num_classes

    def head_score(c5_in):
        # The head-only graph applies the post-backbone submodules by
        # name, so C5 becomes the differentiated input.
        outs = _apply_head_only(model, variables, c3, c4, c5_in)
        out = outs[scale]
        b, h, w, _ = out.shape
        logits = out.reshape(b, h, w, model.anchors_per_scale, attrs)
        return jnp.sum(logits[..., 5 + class_id])

    grads = jax.grad(head_score)(c5)
    acts = np.asarray(c5[0], np.float32)
    g = np.asarray(grads[0], np.float32)
    weights = g.mean(axis=(0, 1))  # [C]
    cam = np.maximum((acts * weights[None, None, :]).sum(-1), 0.0)
    if cam.max() > 0:
        cam = cam / cam.max()
    return cam


def _apply_head_only(model: YoloHead, variables, c3, c4, c5):
    """Apply YoloHead's post-backbone graph by name-matched submodule
    application (neck -> embedding0/1/2 with laterals), reproducing
    YoloHead.__call__ after the backbone."""
    import flax.linen as nn

    from object_detectors_tpu.models.common import ConvBN, upsample_nearest_2x
    from object_detectors_tpu.models.yolo import DetectionBranch, YoloNeck

    p = variables["params"]

    class HeadOnly(nn.Module):
        @nn.compact
        def __call__(self, c3_, c4_, c5_):
            a = model.anchors_per_scale
            out_f = a * (5 + model.num_classes)
            x0, x1, x2 = YoloNeck(model.use_spp, model.use_fpn,
                                  model.pyramids, dtype=model.dtype,
                                  name="neck")((c5_, c4_, c3_))
            out0, branch0 = DetectionBranch(
                512, 1024, out_f, dtype=model.dtype,
                name="embedding0")(x0, False)
            lat1 = ConvBN(256, 1, dtype=model.dtype,
                          name="lateral1")(branch0, False)
            x1_in = jnp.concatenate([upsample_nearest_2x(lat1), x1], -1)
            out1, branch1 = DetectionBranch(
                256, 512, out_f, dtype=model.dtype,
                name="embedding1")(x1_in, False)
            lat2 = ConvBN(128, 1, dtype=model.dtype,
                          name="lateral2")(branch1, False)
            x2_in = jnp.concatenate([upsample_nearest_2x(lat2), x2], -1)
            out2, _ = DetectionBranch(
                128, 256, out_f, dtype=model.dtype,
                name="embedding2")(x2_in, False)
            return out0, out1, out2

    head_params = {k: v for k, v in p.items() if k != "backbone"}
    head_vars = {"params": head_params}
    if "batch_stats" in variables:
        bs = {k: v for k, v in variables["batch_stats"].items()
              if k != "backbone"}
        head_vars["batch_stats"] = bs
    return HeadOnly().apply(head_vars, c3, c4, c5)
