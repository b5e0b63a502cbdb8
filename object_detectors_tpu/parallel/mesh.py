"""Device mesh + sharding helpers (GSPMD data parallelism over ICI).

The reference runs one process per GPU with NCCL DDP (apex DDP at
`yolo/procedures/initialize.py:47-51`, torch DDP at
`detection/train.py:159-161`) and explicit `dist.all_reduce` of losses
(`yolo/main.py:95-96`). Here the whole training step is one SPMD program
jitted over a `Mesh`:

* batch arrays are sharded over the ``data`` axis (NamedSharding);
* parameters/optimizer state are replicated (or sharded over ``model``
  for tensor parallelism of the widest conv layers);
* loss/stat reductions become global automatically — a `jnp.mean` over a
  sharded batch axis is the all-reduce, XLA inserts the collective over
  ICI. No process groups, no barriers, no rank bookkeeping.

BatchNorm note: under jit-GSPMD, batch statistics reduce over the global
(sharded) batch dimension, so SyncBN (the reference's apex
``convert_syncbn_model``) is the default behavior, not an option.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_initialize_distributed():
    """Multi-host bring-up — replaces the reference's env/SLURM NCCL
    rendezvous (detection/utils.py:302-324, yolo/main.py:21-30).

    Reads the standard JAX env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or their SLURM equivalents and
    calls jax.distributed.initialize exactly once. No-op for single
    process."""
    import os

    if jax.process_count() > 1:
        return  # already initialized
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if addr is None and "SLURM_JOB_NODELIST" in os.environ:
        # SLURM auto-detection is built into jax.distributed
        jax.distributed.initialize()
        return
    if addr and nproc and pid:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(pid))


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    data: int | None = None,
    model: int = 1,
) -> Mesh:
    """Create a (data, model) mesh. Defaults to all visible devices on the
    data axis (pure DP)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def make_mesh_for_batch(batch_size: int, model: int = 1,
                        devices=None) -> Mesh:
    """Mesh whose data axis is the largest divisor of ``batch_size`` that
    fits the available devices (so [B, ...] arrays always shard cleanly)."""
    devices = list(devices if devices is not None else jax.devices())
    avail = len(devices) // model
    data = max(d for d in range(1, avail + 1) if batch_size % d == 0)
    return make_mesh(devices[: data * model], data=data, model=model)


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Sharding for [B, ...] arrays: batch over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_parallel_shardings(mesh: Mesh, batch_pytree, state_pytree):
    """(in_shardings, state_sharding) pytrees for a DP train step: every
    leaf of the batch sharded on axis 0, every leaf of the state
    replicated."""
    batch_s = jax.tree_util.tree_map(lambda _: shard_batch(mesh), batch_pytree)
    state_s = jax.tree_util.tree_map(lambda _: replicate(mesh), state_pytree)
    return batch_s, state_s


def put_sharded(batch_pytree, mesh: Mesh):
    """Host -> device transfer of a batch pytree, sharded over data axis."""
    s = shard_batch(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch_pytree)


def put_replicated(pytree, mesh: Mesh):
    r = replicate(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), pytree)
