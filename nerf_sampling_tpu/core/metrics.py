"""Image metrics.

Parity targets: reference run_nerf_helpers.py:9-11 (img2mse / mse2psnr / to8b)
and nerf_utils.py:306-308 (numpy PSNR used by render_path).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error between two images / ray batches."""
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    """PSNR = -10 * log10(mse)."""
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def psnr_np(pred: np.ndarray, gt: np.ndarray) -> float:
    """Host-side PSNR over full images (reference nerf_utils.py:306-308)."""
    return float(-10.0 * np.log10(np.mean(np.square(pred - gt))))


def to8b(x: np.ndarray) -> np.ndarray:
    """Clip to [0, 1] and quantize to uint8 for PNG/video export."""
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)
