"""CPU driver for the synthetic-trained Faster R-CNN weight artifact
(analysis/make_artifacts.py train_frcnn) — forces the CPU backend so it
runs while the TPU tunnel is down and never contends for the chip."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=1")
import jax

jax.config.update("jax_platforms", "cpu")

from object_detectors_tpu.analysis import make_artifacts  # noqa: E402

make_artifacts.train_frcnn(int(os.environ.get("FRCNN_EPOCHS", "40")))
