"""A/B: reference depth objective vs bg_depth_loss_weight=0 per scene.

Both arms replicate the r2 50k recipe's evaluation protocol (half_res
400^2, gaussian/64/1.0 populate, all 4 test views) with a finer eval
cadence (every 2500), 30k iters each, same frozen NeRF and seed. Arm A
(weight 1.0) is the exact reference objective — expected to peak and
drift; arm B (weight 0.0) removes the measured 85%-noise background term.

Run on the TPU:
PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_bg_weight_ab.py [scene] [n_iters]
(scene: example_hard (default) or example; n_iters default 30000)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerf_sampling_tpu.definitions import ROOT_DIR
from nerf_sampling_tpu.train.trainer import Trainer
from nerf_sampling_tpu.utils.config import TrainerConfig


_NERF_CKPT = {
    "example_hard": "logs/example_hard_nerf/020000.npz",
    "example": "logs/example_nerf/020000.npz",
}


def run(scene: str, bg_weight: float, n_iters: int) -> dict:
    cfg = TrainerConfig(
        dataset_type="blender",
        datadir=f"{ROOT_DIR}/dataset/{scene}",
        basedir="logs/r3_bgw",
        expname=f"{scene}_bgw_{bg_weight:g}",
        train_mode="depth_net",
        ft_path=_NERF_CKPT[scene],
        mlp_impl="pallas",
        n_layers=10,
        layer_width=256,
        train_depth_net_only=True,
        sphere_radius=2,
        depth_net_lr=1e-4,
        # r2 eval protocol: 400^2, gaussian/64/1.0
        half_res=True,
        testskip=1,
        n_depth_samples=64,
        distance=1.0,
        sampling_mode="gaussian",
        i_print=250,
        i_testset=2500,
        i_weights=10_000,
        i_video=10**9,
        keep_best=True,
        bg_depth_loss_weight=bg_weight,
    )
    tr = Trainer(cfg)
    tr.train(N_iters=n_iters + 1)
    rows = [
        json.loads(l)
        for l in open(os.path.join(tr.expdir, "metrics.jsonl"))
    ]
    traj = [(r["step"], round(r["test_psnr"], 2)) for r in rows if "test_psnr" in r]
    print(f"{scene} bgw={bg_weight}: eval trajectory {traj}; best {tr._best_psnr:.3f}")
    return {"scene": scene, "bg_weight": bg_weight, "traj": traj, "best": tr._best_psnr}


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "example_hard"
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000
    a = run(scene, 1.0, n_iters)
    b = run(scene, 0.0, n_iters)
    print(json.dumps({"A_reference": a, "B_fg_only": b}))


if __name__ == "__main__":
    main()
