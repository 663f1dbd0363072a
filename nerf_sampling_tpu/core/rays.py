"""Camera-ray generation and NDC reprojection.

Parity targets: reference run_nerf_helpers.py:187-246
(get_rays / get_rays_np / ndc_rays).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def get_rays(
    H: int, W: int, K: jnp.ndarray, c2w: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel grid -> world-space rays from intrinsics K and pose c2w.

    Returns (rays_o, rays_d), each [H, W, 3]. Matches reference
    run_nerf_helpers.py:187-202 (note the reference transposes torch's
    ij-meshgrid back to xy indexing; we build xy directly).
    """
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    dirs = jnp.stack(
        [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -jnp.ones_like(i)],
        axis=-1,
    )
    # Rotate camera-frame directions into world frame: dirs @ R^T.
    # Precision pinned: ray directions seed every downstream sample position,
    # so bf16 MXU rounding here would break PSNR parity.
    rays_d = jnp.einsum(
        "hwc,rc->hwr", dirs, c2w[:3, :3], precision=jax.lax.Precision.HIGHEST
    )
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_np(
    H: int, W: int, K: np.ndarray, c2w: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side numpy twin of get_rays (reference run_nerf_helpers.py:205-218)."""
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy"
    )
    dirs = np.stack(
        [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -np.ones_like(i)], -1
    )
    rays_d = np.sum(dirs[..., np.newaxis, :] * c2w[:3, :3], -1)
    rays_o = np.broadcast_to(c2w[:3, -1], np.shape(rays_d))
    return rays_o, rays_d


def ndc_rays(
    H: int,
    W: int,
    focal: float,
    near: float,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shift rays to the near plane and project to NDC space.

    For LLFF forward-facing scenes. Matches reference
    run_nerf_helpers.py:221-246.
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = (
        -1.0
        / (W / (2.0 * focal))
        * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    )
    d1 = (
        -1.0
        / (H / (2.0 * focal))
        * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    )
    d2 = -2.0 * near / rays_o[..., 2]

    rays_o = jnp.stack([o0, o1, o2], -1)
    rays_d = jnp.stack([d0, d1, d2], -1)
    return rays_o, rays_d
