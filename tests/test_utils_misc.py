"""Video export, metrics logger, profiling utilities."""

import json
import os

import numpy as np

from nerf_sampling_tpu.utils.logging import MetricsLogger
from nerf_sampling_tpu.utils.profiling import StepTimer
from nerf_sampling_tpu.utils.video import write_video


def test_write_video_falls_back(tmp_path):
    frames = (np.random.default_rng(0).uniform(0, 255, (4, 8, 8, 3))).astype(np.uint8)
    path = write_video(str(tmp_path / "clip"), frames, fps=10)
    assert os.path.exists(path)
    # this environment has no ffmpeg: expect the GIF (or npz) fallback
    assert path.endswith((".mp4", ".gif", ".npz"))


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path), wandb_mode="disabled")
    logger.log({"Loss": 1.5, "psnr": 20.0}, step=10)
    logger.log({"Loss": 1.0}, step=20)
    logger.close()
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["step"] == 10 and rec["Loss"] == 1.5


def test_step_timer():
    t = StepTimer(rays_per_step=1024, warmup=2)
    for _ in range(5):
        t.tick()
    m = t.metrics()
    assert m["steps_per_sec"] > 0
    assert m["rays_per_sec"] == m["steps_per_sec"] * 1024
