"""Execute the REAL optuna branch of experiments/study.py with a stub.

The environment has no optuna package, so without this the optuna code
path (create_study / MedianPruner / sqlite storage / study.optimize /
per-iteration trial.report + prune) would be implemented-but-never-run.
The stub implements exactly the API surface study.py + Trainer._report_trial
consume, including a pruned trial, so the branch executes end-to-end
against the real Trainer. Reference anchor: experiments/study.py:1-94,
Trainer.py:393-398.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest


def _make_optuna_stub(suggested_lrs):
    optuna = types.ModuleType("optuna")

    class TrialPruned(Exception):
        pass

    class FakeTrial:
        def __init__(self, lr, prune_at_first_report):
            self._lr = lr
            self._prune = prune_at_first_report
            self.reports = []

        def suggest_float(self, name, lo, hi, log=False):
            assert name == "depth_net_lr" and log
            return self._lr

        def report(self, value, step):
            self.reports.append((value, step))

        def should_prune(self):
            return self._prune and len(self.reports) >= 1

    class FakeStudy:
        def __init__(self):
            self.trials = []
            self.best_value = -np.inf
            self.best_params = None

        def optimize(self, objective, n_trials):
            for i in range(n_trials):
                # last trial prunes at its first report
                trial = FakeTrial(suggested_lrs[i], i == n_trials - 1)
                self.trials.append(trial)
                try:
                    value = objective(trial)
                except TrialPruned:
                    continue
                if value > self.best_value:
                    self.best_value = value
                    self.best_params = {"depth_net_lr": trial._lr}

    def create_study(direction, pruner, storage, study_name, load_if_exists):
        assert direction == "maximize"
        assert storage.startswith("sqlite:///")
        create_study.kwargs = dict(
            pruner=pruner, storage=storage, study_name=study_name,
            load_if_exists=load_if_exists,
        )
        create_study.study = FakeStudy()
        return create_study.study

    pruners = types.ModuleType("optuna.pruners")
    pruners.MedianPruner = lambda: "median-pruner"
    trial_mod = types.ModuleType("optuna.trial")
    trial_mod.Trial = FakeTrial
    exceptions = types.ModuleType("optuna.exceptions")
    exceptions.TrialPruned = TrialPruned

    optuna.pruners = pruners
    optuna.trial = trial_mod
    optuna.exceptions = exceptions
    optuna.TrialPruned = TrialPruned
    optuna.create_study = create_study
    return optuna


TINY_YAML = """
tiny_module:
  module: "nerf_sampling_tpu.train.Trainer"
  kwargs:
    expname: "study_smoke"
    dataset_type: "blender"
    N_rand: 16
    white_bkgd: True
    device: 'cpu'
    i_weights: 1000000
    i_testset: 1000000
    i_video: 1000000
    i_print: 2
    lrate_decay: 500
    input_dims_embed: 3
    use_viewdirs: True
    N_importance: 4
    N_samples: 4
    no_batching: True
    half_res: False
    precrop_iters: 0
    precrop_frac: 0.5
    netdepth: 2
    netwidth: 16
    netdepth_fine: 2
    netwidth_fine: 16
    depth_net_lr: None
    n_layers: None
    layer_width: None
    train_depth_net_only: None
    sphere_radius: None
"""


@pytest.mark.slow
def test_study_optuna_branch_runs(tmp_path, monkeypatch):
    from click.testing import CliRunner

    from nerf_sampling_tpu.data.example import generate_example_dataset
    import nerf_sampling_tpu.experiments.study as study

    # tiny scene under a faked ROOT_DIR/dataset/<name>
    root = tmp_path / "root"
    generate_example_dataset(
        str(root / "dataset" / "example"), H=12, W=12, n_train=2, n_val=1, n_test=1
    )
    monkeypatch.setattr(study, "ROOT_DIR", str(root))

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(TINY_YAML)

    stub = _make_optuna_stub(suggested_lrs=[1e-3, 1e-4])
    monkeypatch.setitem(sys.modules, "optuna", stub)
    monkeypatch.setitem(sys.modules, "optuna.pruners", stub.pruners)
    monkeypatch.setitem(sys.modules, "optuna.trial", stub.trial)
    monkeypatch.setitem(sys.modules, "optuna.exceptions", stub.exceptions)

    runner = CliRunner()
    res = runner.invoke(
        study.main,
        [
            "-c", str(cfg_path), "-m", "tiny_module", "-d", "example",
            "--n_trials", "2", "--n_iters", "4",
            "--basedir", str(tmp_path / "study_logs"), "-ip", "2",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output

    s = stub.create_study.study
    assert stub.create_study.kwargs["pruner"] == "median-pruner"
    assert len(s.trials) == 2
    # trial 1 completed and reported per-eval PSNRs through Trainer
    assert s.best_params == {"depth_net_lr": 1e-3}
    assert np.isfinite(s.best_value)
    assert len(s.trials[0].reports) >= 1
    # trial 2 was pruned after its first report (TrialPruned propagated
    # through Trainer.train -> study.optimize)
    assert len(s.trials[1].reports) == 1
    assert "Best:" in res.output
