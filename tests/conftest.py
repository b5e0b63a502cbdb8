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
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # The round-2 "SIGABRT at ~183/219" gate failure: XLA CPU collective
    # rendezvous CHECK-fails if the 8 virtual-device participant threads
    # don't all arrive within 40s — on this single-core rig a loaded
    # process can schedule them late. Raise the warn/terminate timeouts;
    # correctness is unaffected (the rendezvous completes, just late).
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=900"
              " --xla_cpu_collective_timeout_seconds=900")
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
