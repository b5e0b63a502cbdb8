"""Feature Pyramid Network (torchvision FeaturePyramidNetwork semantics).

Used by the YOLO neck wrapper (`yolo/utilities/custom.py:267-285`) and the
ResNet-FPN detection backbones (`torchvision_models/tvision/
backbone_utils.py:15-50`): per-level 1x1 inner convs to a common width,
top-down nearest-neighbor upsample + add, then per-level 3x3 output convs.
Optional extra blocks: LastLevelMaxPool (Faster/Mask R-CNN P6 pool) and
LastLevelP6P7 (RetinaNet's stride-64/128 convs).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from object_detectors_tpu.models.common import max_pool_same


def _upsample_nearest_to(x, target_hw):
    """Nearest-neighbor resize to an exact (H, W) — torchvision
    interpolate(size=...) semantics for the top-down pathway."""
    b, h, w, c = x.shape
    th, tw = target_hw
    if (th, tw) == (h, w):
        return x
    if th % h == 0 and tw % w == 0:
        fh, fw = th // h, tw // w
        y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, fh, w, fw, c))
        return y.reshape(b, th, tw, c)
    # Fallback for non-integer factors
    import jax
    return jax.image.resize(x, (b, th, tw, c), method="nearest")


class FeaturePyramidNetwork(nn.Module):
    """in: list of NHWC maps (fine -> coarse); out: same-length list at
    ``out_channels`` width (+ extras appended)."""

    out_channels: int = 256
    extra_blocks: str | None = None  # None | "pool" | "p6p7"
    # The reference's RetinaNet builds LastLevelP6P7(256, 256), i.e. P6
    # from the P5 FPN output (retinanet.py:635, use_P5). The original
    # RetinaNet paper's C5 variant stays available via this flag.
    p6p7_in_from_c5: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], c5=None):
        num = len(features)
        inners = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"inner{i}")(f)
            for i, f in enumerate(features)
        ]
        # top-down accumulation
        laterals = [None] * num
        last = inners[-1]
        laterals[-1] = last
        for i in range(num - 2, -1, -1):
            last = inners[i] + _upsample_nearest_to(
                last, inners[i].shape[1:3]
            )
            laterals[i] = last
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"layer{i}")(l)
            for i, l in enumerate(laterals)
        ]

        if self.extra_blocks == "pool":
            outs.append(max_pool_same(outs[-1], window=1, stride=2))
        elif self.extra_blocks == "p6p7":
            src = c5 if (self.p6p7_in_from_c5 and c5 is not None) else outs[-1]
            p6 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)), dtype=self.dtype,
                         param_dtype=jnp.float32, name="p6")(src)
            p7 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)), dtype=self.dtype,
                         param_dtype=jnp.float32, name="p7")(nn.relu(p6))
            outs.extend([p6, p7])
        return outs
