"""Checkpointing (orbax) — best/last semantics of the reference.

Parity with `yolo/procedures/initialize.py:12-25,57-104` and
`detection/train.py:189-196`: every epoch rank 0 writes ``last`` (model +
optimizer + scheduler-equivalent + epoch + metrics) and additionally
``best`` when the selection metric improves; resume restores everything
and offsets the epoch counter. The DDP ``module.`` prefix-stripping
disappears — there is no wrapper module in SPMD.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, tag)

    def save(self, tag: str, state, epoch: int, metrics: dict):
        """state: TrainState pytree. Saved under <dir>/<tag>; epoch +
        metrics go to a JSON sidecar (simpler than pytree templates)."""
        payload = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        path = self._path(tag)
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()
        import json

        with open(path + ".meta.json", "w") as f:
            json.dump({"epoch": int(epoch),
                       "metrics": {k: float(v)
                                   for k, v in metrics.items()}}, f)

    def restore(self, tag: str, state):
        """Restore into the given template TrainState; returns
        (state, epoch, metrics) or None if absent."""
        path = self._path(tag)
        if not os.path.exists(path):
            return None
        template = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        restored = self._ckptr.restore(path, template)
        new_state = state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        import json

        epoch, metrics = 0, {}
        meta_path = path + ".meta.json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            epoch = meta.get("epoch", 0)
            metrics = meta.get("metrics", {})
        return new_state, epoch, metrics

    def save_raw(self, tag: str, pytree, epoch: int, metrics: dict):
        """Save an arbitrary pytree (no TrainState wrapping) + sidecar."""
        import json

        path = self._path(tag)
        self._ckptr.save(path, pytree, force=True)
        self._ckptr.wait_until_finished()
        with open(path + ".meta.json", "w") as f:
            json.dump({"epoch": int(epoch),
                       "metrics": {k: float(v)
                                   for k, v in metrics.items()}}, f)

    def restore_raw(self, tag: str, template):
        """Restore an arbitrary pytree; returns (pytree, epoch, metrics)
        or None if absent."""
        import json

        path = self._path(tag)
        if not os.path.exists(path):
            return None
        restored = self._ckptr.restore(path, template)
        epoch, metrics = 0, {}
        meta = path + ".meta.json"
        if os.path.exists(meta):
            with open(meta) as f:
                m = json.load(f)
            epoch, metrics = m.get("epoch", 0), m.get("metrics", {})
        return restored, epoch, metrics

    def save_epoch(self, state, epoch: int, metrics: dict,
                   metric_value: float, best_so_far: float,
                   mode: str = "max") -> float:
        """last + conditional best (main.py:110-126). Returns the new
        best value."""
        if jax.process_index() == 0:
            self.save("last", state, epoch, metrics)
        improved = (metric_value > best_so_far if mode == "max"
                    else metric_value < best_so_far)
        if improved:
            if jax.process_index() == 0:
                self.save("best", state, epoch, metrics)
            return metric_value
        return best_so_far
