"""Mesh/sharding utilities — the TPU-native replacement for the reference's
NCCL DDP stacks (yolo/main.py:21-42, detection/utils.py:302-324)."""

from object_detectors_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_shardings,
)
