"""Optimizer + LR schedule factories (optax).

Capability parity with `yolo/procedures/initialize.py:37-41` (SGD with
momentum / Adam, both with weight decay) and `initialize.py:108-130`
(step / multistep / cyclic / reduce-on-plateau schedulers), plus the
torchvision linear warmup (`detection/utils.py:239-247`).

Epoch-granular schedulers are expressed as functions of the *step* count
with a known steps_per_epoch, keeping the whole schedule jit-constant.
ReduceLROnPlateau needs host-side metric feedback (the reference
broadcasts rank-0 mAP, yolo/main.py:129-134); here it's a small host-side
state object whose scale feeds an optax ``scale_by_plateau`` injectable
hyperparameter.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import optax


@dataclasses.dataclass
class OptimizerConfig:
    name: str = "sgd"          # sgd | adam
    lr: float = 1e-3
    weight_decay: float = 5e-4
    momentum: float = 0.9


@dataclasses.dataclass
class SchedulerConfig:
    name: str = "step"          # step|multistep|cyclic|reduce_on_plateau
    step_size: int = 100        # step
    factor: float = 0.1         # step/multistep/plateau gamma
    milestones: Sequence[int] = (15, 25)   # multistep (epochs)
    base_lr: float = 1e-4       # cyclic
    max_lr: float = 1e-3        # cyclic
    cycle_steps: int = 4000     # cyclic: 2 * step_size_up (torch default 2000 up)
    mode: str = "max"           # plateau
    patience: int = 10          # plateau
    warmup_steps: int = 0       # torchvision warmup_lr_scheduler
    warmup_factor: float = 1.0 / 1000


def make_schedule(opt_cfg: OptimizerConfig, sch_cfg: SchedulerConfig,
                  steps_per_epoch: int) -> optax.Schedule:
    """Build an optax schedule in *steps*; epoch-based configs scale by
    steps_per_epoch. Plateau is handled outside (see PlateauState)."""
    base = opt_cfg.lr
    name = sch_cfg.name
    if name == "multistep":
        boundaries = {int(m) * steps_per_epoch: sch_cfg.factor
                      for m in sch_cfg.milestones}
        sched = optax.piecewise_constant_schedule(base, boundaries)
    elif name == "cyclic":
        # torch CyclicLR triangular: linear base->max->base.
        half = max(sch_cfg.cycle_steps // 2, 1)
        sched = optax.join_schedules(
            [optax.linear_schedule(sch_cfg.base_lr, sch_cfg.max_lr, half),
             optax.linear_schedule(sch_cfg.max_lr, sch_cfg.base_lr, half)],
            [half],
        )
        # repeat cycles
        cyc = sched

        def sched(step):  # noqa: F811
            return cyc(step % (2 * half))
    elif name == "reduce_on_plateau":
        sched = optax.constant_schedule(base)
    else:  # step
        def sched(step):
            epoch = step // steps_per_epoch
            return base * (sch_cfg.factor ** (epoch // sch_cfg.step_size))

    if sch_cfg.warmup_steps > 0:
        warm = optax.linear_schedule(
            base * sch_cfg.warmup_factor, base, sch_cfg.warmup_steps)
        inner = sched

        def sched(step):  # noqa: F811
            import jax.numpy as jnp
            return jnp.where(step < sch_cfg.warmup_steps, warm(step),
                             inner(step))
    return sched


def make_optimizer(opt_cfg: OptimizerConfig, sch_cfg: SchedulerConfig,
                   steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """SGD(momentum)+wd or Adam+wd with the configured schedule, plus a
    host-controlled plateau scale (optax.inject_hyperparams 'plateau_scale')."""
    schedule = make_schedule(opt_cfg, sch_cfg, steps_per_epoch)

    @optax.inject_hyperparams
    def tx(learning_rate, plateau_scale):
        if opt_cfg.name == "adam":
            core = optax.adamw(learning_rate,
                               weight_decay=opt_cfg.weight_decay)
        else:
            core = optax.chain(
                optax.add_decayed_weights(opt_cfg.weight_decay),
                optax.sgd(learning_rate, momentum=opt_cfg.momentum),
            )
        return optax.chain(core, _scale_transform(plateau_scale))

    return tx(schedule, 1.0)


def _scale_transform(scale):
    import jax
    def init_fn(params):
        return optax.EmptyState()
    def update_fn(updates, state, params=None):
        return jax.tree_util.tree_map(lambda u: u * scale, updates), state
    return optax.GradientTransformation(init_fn, update_fn)


@dataclasses.dataclass
class PlateauState:
    """Host-side ReduceLROnPlateau (torch semantics: after ``patience``
    epochs without improvement, multiply LR by ``factor``)."""

    factor: float = 0.1
    patience: int = 10
    mode: str = "max"
    best: float | None = None
    bad_epochs: int = 0
    scale: float = 1.0

    def update(self, metric: float) -> float:
        better = (
            self.best is None
            or (self.mode == "max" and metric > self.best)
            or (self.mode == "min" and metric < self.best)
        )
        if better:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return self.scale
