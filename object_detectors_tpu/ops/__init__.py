"""Pure-JAX vectorized detection ops: boxes, IoU family, coding, matching,
sampling, NMS, and losses. Everything here is jit-safe with static shapes."""

from object_detectors_tpu.ops import boxes  # noqa: F401
from object_detectors_tpu.ops import losses  # noqa: F401
from object_detectors_tpu.ops import matcher  # noqa: F401
from object_detectors_tpu.ops import nms  # noqa: F401
from object_detectors_tpu.ops import sampler  # noqa: F401
