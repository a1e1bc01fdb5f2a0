"""HPO entry point (reference C21, /root/reference/train.py:21-105).

Search space mirrors the reference objective: lr, init distribution,
speech_alpha, lstm_layers, conv/fc dropout, weight decay; objective maximizes
val_pesq (falls back to val_stoi when no native PESQ module is built).

Uses Optuna (MedianPruner, 100 trials) when importable; otherwise an internal
random-search driver with median pruning reproduces the same loop so the
capability exists in hermetic environments.
"""

from __future__ import annotations

import argparse
import json
import os
from dataclasses import replace
from typing import Dict, Optional

import numpy as np

from dcs_net_tpu.cli.common import add_common_args, build_config, make_loaders
from dcs_net_tpu.core.config import Config


def sample_space(rng: np.random.Generator) -> Dict:
    return {
        "lr": float(rng.uniform(1e-5, 1e-3)),
        "init": str(rng.choice(["kaiming_uniform", "xavier_uniform"])),
        "speech_alpha": float(rng.uniform(0.0, 1.0)),
        "lstm_layers": int(rng.integers(1, 13)),
        "dropout_conv": float(rng.uniform(0.01, 0.99)),
        "dropout_fc": float(rng.uniform(0.01, 0.99)),
        "weight_decay": float(rng.uniform(1e-5, 1e-3)),
    }


def apply_sample(cfg: Config, s: Dict) -> Config:
    return cfg.replace(
        model=replace(cfg.model, init=s["init"], lstm_layers=s["lstm_layers"],
                      dropout_conv=s["dropout_conv"], dropout_fc=s["dropout_fc"]),
        loss=replace(cfg.loss, speech_alpha=s["speech_alpha"]),
        optim=replace(cfg.optim, lr=s["lr"], weight_decay=s["weight_decay"]),
    )


def run_trial(cfg: Config, epochs: int, report=None) -> float:
    """Train briefly, return the metric to MAXIMIZE (val_pesq or val_stoi)."""
    from dcs_net_tpu.train.loop import Trainer, TrainerCallbacks

    train_loader, val_loader, _ = make_loaders(cfg)
    trainer = Trainer(cfg, log_dir=os.path.join(cfg.run.log_dir, "tune"),
                      use_tensorboard=False)
    trainer.init_state()
    best = {"v": float("-inf")}

    def on_val(epoch: int, metrics: Dict[str, float]) -> bool:
        v = metrics.get("val_pesq", metrics.get(
            "val_pesq_est", metrics.get("val_stoi", float("-inf"))))
        best["v"] = max(best["v"], v)
        if report is not None:
            return report(epoch, v)  # True -> prune
        return False

    trainer.fit(train_loader, val_loader,
                callbacks=TrainerCallbacks(on_validation_end=on_val),
                max_epochs=epochs)
    return best["v"]


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--trials", type=int, default=100)
    p.add_argument("--trial-epochs", type=int, default=5)
    args = p.parse_args(argv)
    base_cfg = build_config(args)

    try:
        import optuna

        def objective(trial: "optuna.trial.Trial") -> float:
            s = {
                "lr": trial.suggest_float("lr", 1e-5, 1e-3),
                "init": trial.suggest_categorical(
                    "init", ["kaiming_uniform", "xavier_uniform"]),
                "speech_alpha": trial.suggest_float("speech_alpha", 0.0, 1.0),
                "lstm_layers": trial.suggest_int("lstm_layers", 1, 12),
                "dropout_conv": trial.suggest_float("dropout_conv", 0.01, 0.99),
                "dropout_fc": trial.suggest_float("dropout_fc", 0.01, 0.99),
                "weight_decay": trial.suggest_float("weight_decay", 1e-5, 1e-3),
            }

            def report(epoch, v):
                trial.report(v, epoch)
                return trial.should_prune()

            return run_trial(apply_sample(base_cfg, s), args.trial_epochs, report)

        study = optuna.create_study(
            direction="maximize", pruner=optuna.pruners.MedianPruner(),
            study_name=f"{args.variant}-net_study")
        study.optimize(objective, n_trials=args.trials)
        print("best:", study.best_trial.value, study.best_trial.params)
        return
    except ImportError:
        print("optuna not available; using built-in random search + median pruning")

    rng = np.random.default_rng(base_cfg.run.seed)
    history: list = []        # per-trial list of per-epoch values
    results = []
    for t in range(args.trials):
        s = sample_space(rng)
        epoch_vals: list = []

        def report(epoch: int, v: float) -> bool:
            epoch_vals.append(v)
            peers = [h[epoch] for h in history if len(h) > epoch]
            if len(peers) >= 4 and v < float(np.median(peers)):
                return True  # prune below-median trials
            return False

        value = run_trial(apply_sample(base_cfg, s), args.trial_epochs, report)
        history.append(epoch_vals)
        results.append({"trial": t, "value": value, "params": s,
                        "pruned": len(epoch_vals) < args.trial_epochs})
        print(f"trial {t}: value={value:.4f} params={s}")
    best = max(results, key=lambda r: r["value"])
    print("best:", json.dumps(best))


if __name__ == "__main__":
    main()
