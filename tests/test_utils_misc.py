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


def test_write_video_mp4_branch(tmp_path, monkeypatch):
    """The mp4 branch (reference Trainer.py:223,365-376 parameters) is
    unreachable here (no ffmpeg); exercise it with a stub mimwrite that
    records the call, so the branch isn't dead-until-production code."""
    import imageio.v2 as imageio_v2

    calls = []

    def fake_mimwrite(path, frames, **kw):
        if not str(path).endswith(".mp4"):
            raise AssertionError("mp4 branch must be tried first")
        calls.append((str(path), np.asarray(frames).shape, kw))
        with open(path, "wb") as f:
            f.write(b"\x00")

    monkeypatch.setattr(imageio_v2, "mimwrite", fake_mimwrite)
    frames = np.zeros((3, 4, 4, 3), np.uint8)
    path = write_video(str(tmp_path / "clip"), frames, fps=30)
    assert path.endswith(".mp4") and os.path.exists(path)
    # reference parameters: fps=30, quality=8 (Trainer.py:368-371)
    assert calls[0][2] == {"fps": 30, "quality": 8}
    assert calls[0][1] == (3, 4, 4, 3)


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path), wandb_mode="disabled")
    logger.log({"Loss": 1.5, "psnr": 20.0}, step=10)
    logger.log({"Loss": 1.0}, step=20)
    logger.close()
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["step"] == 10 and rec["Loss"] == 1.5


def test_log_render_ray_plots(tmp_path):
    """Without wandb, log_render writes the reference's 3D ray plot
    (nerf_utils.py:363-390) as PNG + pickle under ray_plots/."""
    logger = MetricsLogger(str(tmp_path), wandb_mode="disabled")
    n, s = 12, 4
    rng = np.random.default_rng(1)
    maps = {
        "depth_net_rgb_map": rng.uniform(0, 1, (3, 4, 3)).astype(np.float32),
        "depth_net_pts": rng.normal(0, 1, (n, s, 3)).astype(np.float32),
        "max_pts": rng.normal(0, 1, (n, 1, 3)).astype(np.float32),
    }
    ro = np.zeros((n, 3), np.float32)
    rd = rng.normal(0, 1, (n, 3)).astype(np.float32)
    logger.log_render(maps, pose_idx=0, step=100, rays_o=ro, rays_d=rd)
    logger.close()
    assert os.path.exists(tmp_path / "ray_plots" / "rays_000100_000.png")
    assert os.path.exists(tmp_path / "ray_plots" / "rays_000100_000.pkl")


def test_log_render_skips_fused_maps(tmp_path):
    """Fused fast paths return zero-sample pts; log_render must no-op."""
    logger = MetricsLogger(str(tmp_path), wandb_mode="disabled")
    maps = {
        "depth_net_rgb_map": np.zeros((2, 2, 3), np.float32),
        "depth_net_pts": np.zeros((2, 2, 0, 3), np.float32),
    }
    logger.log_render(
        maps, 0, 1, rays_o=np.zeros((4, 3)), rays_d=np.ones((4, 3))
    )
    logger.close()
    assert not os.path.exists(tmp_path / "ray_plots")


def test_save_rays_data_roundtrip(tmp_path):
    """Trainer.save_rays_data dumps safetensors the reference convention
    reads back (sampling_trainer.py:124-138)."""
    from nerf_sampling_tpu.train.trainer import Trainer
    from nerf_sampling_tpu.utils.config import TrainerConfig

    cfg = TrainerConfig(basedir=str(tmp_path), expname="srd")
    tr = Trainer(cfg)
    os.makedirs(tr.expdir, exist_ok=True)
    rng = np.random.default_rng(0)
    rays_o = rng.normal(size=(8, 3)).astype(np.float32)
    pts = rng.normal(size=(8, 4, 3)).astype(np.float32)
    alpha = rng.uniform(size=(8, 4)).astype(np.float32)
    path = tr.save_rays_data(rays_o, pts, alpha)
    from safetensors.numpy import load_file

    back = load_file(path)
    np.testing.assert_allclose(back["origins"], rays_o)
    np.testing.assert_allclose(back["pts"], pts)
    np.testing.assert_allclose(back["alpha"], alpha)


def test_step_timer():
    t = StepTimer(rays_per_step=1024, warmup=2)
    for _ in range(5):
        t.tick()
    m = t.metrics()
    assert m["steps_per_sec"] > 0
    assert m["rays_per_sec"] == m["steps_per_sec"] * 1024
