"""Hyperparameter study sweeping depth_net_lr.

Parity target: reference experiments/study.py — optuna study (maximize
PSNR, MedianPruner, sqlite storage, 500 trials). optuna is optional in this
environment; without it a log-uniform random search runs instead with the
same objective and result reporting.
"""

from __future__ import annotations

import os

import click
import numpy as np

from nerf_sampling_tpu.definitions import ROOT_DIR
from nerf_sampling_tpu.train.trainer import Trainer
from nerf_sampling_tpu.utils.config import load_trainer_config, override_config


def _build_cfg(kw, depth_net_lr: float):
    cfg = load_trainer_config(kw["config"], kw["model"])
    override_config(
        cfg.__dict__,
        {
            "depth_net_lr": depth_net_lr,
            "n_layers": 10,
            "layer_width": 256,
            "train_depth_net_only": True,
            "sphere_radius": 2,
        },
    )
    cfg.datadir = kw["datadir"]
    cfg.basedir = kw["basedir"]
    cfg.expname = f"study_lr_{depth_net_lr:.2e}"
    cfg.i_print = kw["i_print"]
    cfg.i_testset = 10**9  # objective uses train psnr; no periodic eval
    cfg.i_video = 10**9
    return cfg


@click.command()
@click.option("-c", "--config", type=str,
              default=f"{ROOT_DIR}/experiments/configs/lego.yaml", show_default=True)
@click.option("-m", "--model", type=str, default="lego_depth_net_module",
              show_default=True)
@click.option("-d", "--dataset", type=str, default="example", show_default=True)
@click.option("--n_trials", default=500, show_default=True)
@click.option("--n_iters", default=2000, show_default=True,
              help="Train iterations per trial.")
@click.option("--basedir", default="./logs/study", show_default=True)
@click.option("-ip", "--i_print", default=500, show_default=True)
def main(**kw):
    """Sweep depth_net_lr, maximizing PSNR."""
    datadir = f"{ROOT_DIR}/dataset/{kw['dataset']}"
    if kw["dataset"] == "example" and not os.path.exists(datadir):
        from nerf_sampling_tpu.data.example import generate_example_dataset

        generate_example_dataset(datadir)
    kw["datadir"] = datadir

    try:
        import optuna

        def objective(trial: "optuna.trial.Trial") -> float:
            lr = trial.suggest_float("depth_net_lr", 1e-6, 1e-2, log=True)
            cfg = _build_cfg(kw, lr)
            trainer = Trainer(cfg, trial=trial)
            return trainer.train(N_iters=kw["n_iters"] + 1)

        study = optuna.create_study(
            direction="maximize",
            pruner=optuna.pruners.MedianPruner(),
            storage=f"sqlite:///{kw['basedir']}/study.db",
            study_name="depth_net_lr",
            load_if_exists=True,
        )
        study.optimize(objective, n_trials=kw["n_trials"])
        print(f"Best: {study.best_params} -> PSNR {study.best_value:.3f}")
    except ImportError:
        print("[study] optuna not installed; running log-uniform random search")
        rng = np.random.default_rng(0)
        results = []
        os.makedirs(kw["basedir"], exist_ok=True)
        for t in range(kw["n_trials"]):
            lr = float(10 ** rng.uniform(-6, -2))
            cfg = _build_cfg(kw, lr)
            psnr = Trainer(cfg).train(N_iters=kw["n_iters"] + 1)
            results.append((psnr, lr))
            results.sort(reverse=True)
            with open(os.path.join(kw["basedir"], "study_results.txt"), "w") as f:
                for p, l in results:
                    f.write(f"PSNR {p:.4f}  depth_net_lr {l:.3e}\n")
            print(f"trial {t}: lr={lr:.3e} psnr={psnr:.3f} (best {results[0]})")
        print(f"Best: depth_net_lr={results[0][1]:.3e} -> PSNR {results[0][0]:.3f}")


if __name__ == "__main__":
    main()
