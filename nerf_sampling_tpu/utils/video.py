"""Video export with graceful backend fallback.

The reference writes mp4 via imageio+ffmpeg (Trainer.py:223,365-376). This
environment has no ffmpeg; fall back to animated GIF (PIL backend, always
available), then to raw .npz frames.
"""

from __future__ import annotations

import numpy as np


def write_video(path_base: str, frames: np.ndarray, fps: int = 30) -> str:
    """Write uint8 frames [T, H, W, 3] to path_base + {.mp4|.gif|.npz}.

    Returns the path actually written.
    """
    import imageio.v2 as imageio

    try:
        path = path_base + ".mp4"
        imageio.mimwrite(path, frames, fps=fps, quality=8)
        return path
    except Exception:
        pass
    try:
        path = path_base + ".gif"
        imageio.mimwrite(path, frames, duration=1000.0 / fps, loop=0)
        return path
    except Exception:
        pass
    path = path_base + ".npz"
    np.savez(path, frames=frames)
    return path
