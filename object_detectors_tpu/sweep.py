"""Hyperparameter sweep driver — the `yolo/test.py` + Ax equivalent.

The reference wires hydra's Ax sweeper + joblib launcher to a single-epoch
objective returning mAP or -val_loss (`yolo/test.py:19-78`,
`hydra/hyperopt.yaml`, `hydra/hp_optim/opt1.yaml`). Here:

* the search space comes from ``configs/hp_optim/opt1.yaml`` (same
  parameters and bounds);
* candidates are drawn by scrambled-Sobol quasi-random search (a strong
  Ax stand-in without the service dependency) with an optional
  explore/exploit refinement that resamples around the incumbent;
* each trial runs the shared 1-epoch objective in-process (the TPU is one
  chip — the reference's pid%gpus process mapping has no analogue);
* failed/non-finite trials score -1e7 exactly like `test.py:45-52`;
* every trial is appended to ``sweep_results.csv``.
"""

from __future__ import annotations

import argparse
import csv
import logging
import os

import numpy as np

from object_detectors_tpu.utils.config import Config, load_config

log = logging.getLogger("sweep")


def load_space(config_dir: str, name: str = "opt1"):
    import yaml

    with open(os.path.join(config_dir, "hp_optim", f"{name}.yaml")) as f:
        return yaml.safe_load(f)


def sobol_candidates(space: dict, n: int, seed: int = 0):
    """Draw n candidates over the range/choice space."""
    from scipy.stats import qmc

    params = space["params"]
    range_keys = [k for k, v in params.items() if v["type"] == "range"]
    choice_keys = [k for k, v in params.items() if v["type"] == "choice"]
    sampler = qmc.Sobol(d=len(range_keys) + len(choice_keys), seed=seed,
                        scramble=True)
    u = sampler.random(n)
    out = []
    for row in u:
        cand = {}
        for i, k in enumerate(range_keys):
            lo, hi = params[k]["bounds"]
            cand[k] = float(lo + row[i] * (hi - lo))
        for j, k in enumerate(choice_keys):
            vals = params[k]["values"]
            cand[k] = vals[min(int(row[len(range_keys) + j] * len(vals)),
                               len(vals) - 1)]
        out.append(cand)
    return out


def perturb(incumbent: dict, space: dict, rng: np.random.RandomState,
            scale: float = 0.15):
    """Gaussian resample around the best candidate (exploit phase)."""
    params = space["params"]
    cand = {}
    for k, spec in params.items():
        if spec["type"] == "range":
            lo, hi = spec["bounds"]
            v = incumbent[k] + rng.randn() * scale * (hi - lo)
            cand[k] = float(np.clip(v, lo, hi))
        else:
            cand[k] = (incumbent[k] if rng.rand() > 0.3
                       else spec["values"][rng.randint(len(spec["values"]))])
    return cand


def one_epoch_objective(cfg: Config) -> float:
    """Single-epoch train -> metric (mAP or -val_loss), the `test.py:40-76`
    objective. Returns -1e7 on failure."""
    import jax
    from object_detectors_tpu import main as pipeline
    from object_detectors_tpu.parallel import mesh as mesh_lib
    from object_detectors_tpu.train import optim as optim_lib
    from object_detectors_tpu.train import trainer

    try:
        mesh = mesh_lib.make_mesh_for_batch(int(cfg.dataset.tr_batch_size))
        loss_cfg = pipeline.build_loss_config(cfg)
        model = pipeline.build_model(cfg)
        tx = optim_lib.make_optimizer(
            optim_lib.OptimizerConfig(lr=float(cfg.optimizer.lr)),
            optim_lib.SchedulerConfig(), 100)
        state = trainer.create_yolo_train_state(
            model, tx, loss_cfg.img_size, jax.random.key(int(cfg.seed)))
        state = mesh_lib.put_replicated(state, mesh)
        train_ds, gt_train = pipeline.build_dataset(cfg, "train")
        val_ds, gt_val = pipeline.build_dataset(cfg, "val")
        cw, il, _ = pipeline.build_tfidf(cfg, gt_train)
        state, sub, stats = pipeline.train_one_epoch(
            state, cfg, loss_cfg, train_ds, mesh, 0, cw, il)
        if sub is None:
            return -1e7
        if cfg.metric == "mAP":
            metric, _ = pipeline.test_one_epoch(
                state, cfg, loss_cfg, val_ds, gt_val, mesh)
            return metric
        return -pipeline.valid_one_epoch(state, cfg, loss_cfg, val_ds,
                                         mesh)
    except Exception:  # noqa: BLE001 — poisoned trial, like test.py
        log.exception("trial failed")
        return -1e7


def run_sweep(config_dir: str, overrides, max_trials: int | None = None,
              space_name: str = "opt1", out_csv: str = "sweep_results.csv",
              objective=one_epoch_objective, seed: int = 0):
    space = load_space(config_dir, space_name)
    n = max_trials or int(space.get("max_trials", 20))
    n_sobol = max(n // 2, 1)
    rng = np.random.RandomState(seed)
    candidates = sobol_candidates(space, n_sobol, seed)

    best_score, best_params = -np.inf, None
    rows = []
    for trial in range(n):
        if trial < len(candidates):
            params = candidates[trial]
        else:
            params = perturb(best_params or candidates[0], space, rng)
        trial_overrides = list(overrides) + [
            f"{k}={v}" for k, v in params.items()]
        cfg = load_config(config_dir, trial_overrides)
        score = objective(cfg)
        rows.append({**params, "score": score, "trial": trial})
        if score > best_score:
            best_score, best_params = score, params
        log.info("trial %d score=%.5f best=%.5f", trial, score, best_score)

    if out_csv:
        os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
        with open(out_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
    return best_params, best_score, rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("overrides", nargs="*")
    ap.add_argument("--config-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs"))
    ap.add_argument("--max-trials", type=int, default=None)
    ap.add_argument("--space", default="opt1")
    ap.add_argument("--out", default="sweep_results.csv")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    best_params, best_score, _ = run_sweep(
        args.config_dir, args.overrides, args.max_trials, args.space,
        args.out)
    print(f"best score {best_score:.5f} with {best_params}")


if __name__ == "__main__":
    main()
