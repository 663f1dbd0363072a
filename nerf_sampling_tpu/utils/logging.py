"""Metrics logging: wandb when available, JSONL + stdout otherwise.

The reference hard-depends on wandb (Trainer.py:378-387, nerf_utils.py:385);
this environment has no wandb, so the logger degrades to an append-only
``metrics.jsonl`` in the experiment dir plus the same stdout lines, keeping
the psnr.txt side channel (Trainer.py:389-391) either way.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class MetricsLogger:
    def __init__(self, logdir: str, wandb_mode: str = "disabled", config: Any = None):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._wandb = None
        if wandb_mode != "disabled":
            try:
                import wandb

                wandb.init(
                    project="nerf-sampling-tpu",
                    config=config.__dict__ if config is not None else None,
                    mode=wandb_mode,
                    dir=logdir,
                )
                self._wandb = wandb
            except ImportError:
                print("[logging] wandb not installed; falling back to jsonl")

    def log(self, metrics: dict[str, float], step: int) -> None:
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_render(self, maps: dict, pose_idx: int, step: int) -> None:
        """Hook for per-pose render logging (reference log_wandb plots)."""
        if self._wandb is None:
            return
        import numpy as np

        rgb = np.asarray(maps["depth_net_rgb_map"])
        self._wandb.log({f"render_{step}/pose_{pose_idx}": self._wandb.Image(rgb)})

    def close(self) -> None:
        self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
