"""Round-3 drift diagnostic: 50k depth-net train on example_hard with the
fg/bg depth-loss split logged (steps.py _fg_bg_depth_diagnostics).

Reproduces the RESULTS.md r2 observation (eval PSNR peaks ~10-20k iters,
then decays under the reference objective) while logging, at every i_print:
  depth_loss_fg  — depth MSE on rays whose hierarchical acc > 0.5
  depth_loss_bg  — depth MSE on background rays (argmax target = noise)
  fg_frac        — fraction of foreground rays in the batch
and eval PSNR every i_testset. The analysis (scripts/r3_drift_analyze.py)
correlates the drift with the bg component to confirm/kill the
"background argmax noise" hypothesis.

Run on the TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_drift_run.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerf_sampling_tpu.definitions import ROOT_DIR
from nerf_sampling_tpu.train.trainer import Trainer
from nerf_sampling_tpu.utils.config import TrainerConfig


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    datadir = f"{ROOT_DIR}/dataset/example_hard"
    if not os.path.exists(datadir):
        from nerf_sampling_tpu.data.example import generate_example_dataset

        generate_example_dataset(datadir, H=800, W=800, variant="multi")
    cfg = TrainerConfig(
        dataset_type="blender",
        datadir=datadir,
        basedir="logs/r3_drift",
        expname="hard_depth_drift",
        train_mode="depth_net",
        ft_path="logs/example_hard_nerf/020000.npz",
        mlp_impl="pallas",
        n_layers=10,
        layer_width=256,
        train_depth_net_only=True,
        sphere_radius=2,
        depth_net_lr=1e-4,
        sampling_mode="depth_only",
        testskip=1,
        i_print=250,
        i_testset=2500,
        i_weights=10_000,
        i_video=10**9,
        keep_best=True,
    )
    tr = Trainer(cfg)
    psnr = tr.train(N_iters=n_iters + 1)
    print(f"Final train psnr: {psnr}; best eval {tr._best_psnr:.3f}")


if __name__ == "__main__":
    main()
