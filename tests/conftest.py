"""Test config: run everything on a virtual 8-device CPU mesh so pjit /
sharding paths are exercised without TPU hardware (SURVEY.md §4 plan).

NOTE: this image's sitecustomize registers the 'axon' TPU platform and
sets jax.config.jax_platforms explicitly, so the JAX_PLATFORMS env var is
ignored — we must override via jax.config after import.
"""

import os

# Must be set before the CPU backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
