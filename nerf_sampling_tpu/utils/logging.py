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
    def __init__(
        self,
        logdir: str,
        wandb_mode: str = "disabled",
        config: Any = None,
        enabled: bool = True,
    ):
        """``enabled=False`` turns every method into a no-op (no file is
        opened, no wandb init). Used by multi-process training, where only
        process 0 owns the metrics/wandb stream — the other hosts construct
        the same Trainer but must not duplicate writes into the shared
        experiment dir."""
        self.logdir = logdir
        self.enabled = enabled
        self._jsonl = None
        self._wandb = None
        if not enabled:
            return
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
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
        if not self.enabled:
            return
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_render(
        self,
        maps: dict,
        pose_idx: int,
        step: int,
        rays_o=None,
        rays_d=None,
    ) -> None:
        """Per-pose render logging (reference log_wandb, nerf_utils.py:363-390).

        The reference plots 5 random rays with their sampled points (blue)
        and, when present, the NeRF argmax points (black), then logs the
        figure to wandb. Here the same figure is built whenever per-sample
        points exist, and goes to wandb when available, else to PNG + pickle
        under ``<logdir>/ray_plots/`` (view with viz.visualize.view_plot).
        """
        if not self.enabled:
            return
        import numpy as np

        rgb = np.asarray(maps["depth_net_rgb_map"])
        if self._wandb is not None:
            self._wandb.log({f"render_{step}/pose_{pose_idx}": self._wandb.Image(rgb)})

        pts = maps.get("depth_net_pts")
        if pts is None or rays_o is None or rays_d is None:
            return
        pts = np.asarray(pts)
        if pts.shape[-2] == 0:  # fused fast paths return map-level outputs only
            return
        pts = pts.reshape(-1, pts.shape[-2], 3)  # [H*W, S, 3]
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            from nerf_sampling_tpu.viz import visualize

            ro = np.asarray(rays_o).reshape(-1, 3)
            rd = np.asarray(rays_d).reshape(-1, 3)
            idx = np.random.default_rng(pose_idx).choice(
                len(ro), size=min(5, len(ro)), replace=False
            )
            fig, ax = visualize.visualize_rays_pts(
                rays_o=ro[idx],
                rays_d=rd[idx],
                pts=pts[idx],
                c=[[(0.0, 0.0, 1.0)]],
                title="{:03d}.png, y_pred: blue, y: black".format(pose_idx),
            )
            max_pts = maps.get("max_pts")
            if max_pts is not None:  # COMPARE_NERF / NERF_MAX diagnostics
                mp = np.asarray(max_pts).reshape(-1, 3)
                visualize._plot_points(ax, mp[idx], c=[[(0.0, 0.0, 0.0)]])
            if self._wandb is not None:
                self._wandb.log({f"Ray plot {step}": self._wandb.Image(fig)})
            else:
                plotdir = os.path.join(self.logdir, "ray_plots")
                os.makedirs(plotdir, exist_ok=True)
                base = os.path.join(plotdir, f"rays_{step:06d}_{pose_idx:03d}")
                fig.savefig(base + ".png")
                visualize.save_figure_pickle(fig, base + ".pkl")
            plt.close(fig)
        except ImportError:
            pass  # matplotlib missing: image-level logging above still ran

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
