"""Alpha compositing: raw network output -> per-ray maps.

Parity targets: reference nerf_utils.py:27-42 (raw2alpha) and
trainers/sampling_trainer.py:153-230 (DepthNetTrainer.raw2outputs, the only
concrete implementation in the reference). All epsilons (1e-10, 1e-5-free,
1e10 tail distance) are reproduced exactly for PSNR parity.

TPU notes: this whole function is elementwise + a cumprod + three reductions
over the sample axis; XLA fuses it into a handful of VPU loops. The fully
fused render kernels (nerf_sampling_tpu.kernels.fused_render) fold the same
compositing math into the MLP epilogue for the eval fast paths.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def raw2alpha(raw: jnp.ndarray, dists: jnp.ndarray) -> jnp.ndarray:
    """alpha_i = 1 - exp(-relu(sigma_i) * delta_i) (reference nerf_utils.py:27-42)."""
    return 1.0 - jnp.exp(-jax.nn.relu(raw) * dists)


class RenderOutputs(NamedTuple):
    """Per-ray maps produced by alpha compositing.

    Field order mirrors the reference raw2outputs 7-tuple
    (sampling_trainer.py:222-230).
    """

    rgb_map: jnp.ndarray  # [N, 3]
    disp_map: jnp.ndarray  # [N]
    acc_map: jnp.ndarray  # [N]
    depth_map: jnp.ndarray  # [N]
    density: jnp.ndarray  # [N, S]
    alphas: jnp.ndarray  # [N, S]
    weights: jnp.ndarray  # [N, S]


def raw2outputs(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = True,
    *,
    key: jax.Array | None = None,
    noise: jnp.ndarray | None = None,
) -> RenderOutputs:
    """Transform raw model predictions into semantically meaningful maps.

    Args:
        raw: [N, S, 4] model output (rgb logits + density).
        z_vals: [N, S] sample depths along each ray.
        rays_d: [N, 3] ray directions (norm scales the inter-sample dists).
        raw_noise_std: std of density regularization noise (train only).
        white_bkgd: blend unaccumulated weight with white.
        key: PRNG key for the density noise (required if raw_noise_std > 0).
        noise: explicit noise injection for golden tests (mirrors the
            reference pytest=True path, sampling_trainer.py:189-192).

    Matches reference sampling_trainer.py:153-230 numerically, including the
    exclusive-cumprod transmittance weights = alpha * cumprod([1, 1-a+1e-10])[:-1]
    and the S==0 degenerate fallback rgb_map = sum(rgb).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.broadcast_to(jnp.asarray(1e10), dists[..., :1].shape)], -1
    )  # [N, S]
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])  # [N, S, 3]
    density = raw[..., 3]

    if raw_noise_std > 0.0:
        if noise is None:
            if key is None:
                raise ValueError("raw_noise_std > 0 requires a PRNG key or noise")
            noise = jax.random.normal(key, density.shape) * raw_noise_std
        density_for_alpha = density + noise
    else:
        density_for_alpha = density

    alphas = raw2alpha(density_for_alpha, dists)  # [N, S]
    # Exclusive cumulative transmittance: T_i = prod_{j<i}(1 - a_j + 1e-10).
    transmittance = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-10], -1),
        -1,
    )[..., :-1]
    weights = alphas * transmittance  # [N, S]

    rgb_map = jnp.sum(weights[..., None] * rgb, -2)  # [N, 3]
    depth_map = jnp.sum(weights * z_vals, -1)
    disp_map = 1.0 / jnp.maximum(
        1e-10 * jnp.ones_like(depth_map), depth_map / (jnp.sum(weights, -1) + 1e-10)
    )
    acc_map = jnp.sum(weights, -1)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    if weights.shape[-1] == 0:
        rgb_map = jnp.sum(rgb, -2)

    return RenderOutputs(rgb_map, disp_map, acc_map, depth_map, density, alphas, weights)
