"""TPU-native object detection framework (JAX / XLA / Pallas / pjit).

A ground-up rebuild of the capabilities of the reference suite
``kostas1515/object_detectors`` (YOLOv3 + torchvision-style detectors with
long-tail class reweighting), designed TPU-first:

* All compute-path code is JAX under ``jit`` with **static shapes** — padded
  ground truth, fixed detections-per-image, masked ragged data.
* NHWC layout + bfloat16 matmul/conv policy to map onto the MXU.
* Data/model parallelism via ``jax.sharding.Mesh`` + NamedSharding (GSPMD),
  not per-process NCCL process groups.
* Hot post-processing ops (NMS, RoIAlign, preprocessing) have fused Pallas
  kernels with pure-XLA fallbacks.
"""

__version__ = "0.1.0"
