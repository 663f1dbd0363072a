"""Ray-sampling primitives: stratified, inverse-CDF (hierarchical), depth-population.

Parity targets:
- stratified coarse z-vals: reference trainers/Trainer.py:604-626
- sample_pdf (NeRF paper §5.2): reference run_nerf_helpers.py:250-293
- sample_points_around_mean: reference nerf_pytorch/utils.py:220-244

The reference threads a ``pytest=True`` flag that overwrites torch RNG with
``np.random.seed(0)`` draws (its golden-randomness mechanism). Here the same
mechanism is an explicit ``u=``/``t_rand=`` injection parameter used by the
golden tests; normal operation draws from an explicit jax PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def z_to_points(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, z_vals: jnp.ndarray
) -> jnp.ndarray:
    """Expand per-ray z values to 3D points: o + d * z.

    rays_o/rays_d: [N, 3]; z_vals: [N, S] -> [N, S, 3].
    """
    return rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]


def stratified_z_vals(
    near: jnp.ndarray,
    far: jnp.ndarray,
    N_samples: int,
    *,
    key: jax.Array | None = None,
    perturb: float = 0.0,
    lindisp: bool = False,
    t_rand: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Coarse z values, optionally jittered within each stratum.

    near/far: [N, 1] (or broadcastable). Returns [N, N_samples].
    Matches reference Trainer.py:604-626.
    """
    t_vals = jnp.linspace(0.0, 1.0, N_samples)
    if not lindisp:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    z_vals = jnp.broadcast_to(z_vals, (near.shape[0], N_samples))

    if perturb > 0.0:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
        lower = jnp.concatenate([z_vals[..., :1], mids], -1)
        if t_rand is None:
            if key is None:
                raise ValueError("perturb > 0 requires a PRNG key or t_rand")
            t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    N_samples: int,
    *,
    key: jax.Array | None = None,
    det: bool = False,
    u: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Inverse-CDF sampling of fine z-vals from coarse weights.

    bins: [N, B] midpoints; weights: [N, B-1]. Returns [N, N_samples].
    Matches reference run_nerf_helpers.py:250-293. Gradient is cut by the
    caller (reference detaches at Trainer.py:572); this function itself is
    differentiable but only used under stop_gradient.
    """
    weights = weights + 1e-5  # prevent nans
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [N, B]

    if u is None:
        if det:
            u = jnp.linspace(0.0, 1.0, N_samples)
            u = jnp.broadcast_to(u, cdf.shape[:-1] + (N_samples,))
        else:
            if key is None:
                raise ValueError("stochastic sample_pdf requires a PRNG key")
            u = jax.random.uniform(key, cdf.shape[:-1] + (N_samples,))

    # Invert the CDF. searchsorted(side='right') == torch right=True.
    # method="compare_all": the default "scan" binary search runs 9 ms on
    # a [1024, 128]x[1024, 64] batch on TPU (sequential log-steps); the
    # vectorized compare matrix runs 1 ms (measured, scripts/
    # ablate_xla_pieces.py) and B is small.
    inds = jax.vmap(
        lambda c, uu: jnp.searchsorted(c, uu, side="right", method="compare_all")
    )(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def scale_points_with_weights(
    z_vals: jnp.ndarray, rays_o: jnp.ndarray, rays_d: jnp.ndarray
) -> jnp.ndarray:
    """Rays-from-origin scaling (reference depth_nets/utils.py:5-11)."""
    return z_to_points(rays_o, rays_d, z_vals)


def scale_to_near_far(
    outputs: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scale [0, 1] outputs to sorted z in [near, far] + points
    (reference depth_nets/utils.py:14-19)."""
    z_vals = near * (1 - outputs) + far * outputs
    z_vals = jnp.sort(z_vals, axis=-1)
    return scale_points_with_weights(z_vals, rays_o, rays_d), z_vals


def sample_points_around_mean(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    mean: jnp.ndarray,
    n_samples: int = 32,
    mode: str = "gaussian",
    std: float = 0.1,
    *,
    key: jax.Array | None = None,
    noise: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Populate N z-vals around a predicted mean depth.

    mean: [N, 1] DepthNet output. Modes (reference utils.py:220-244):
    - ``depth_only``: the single predicted depth.
    - ``gaussian``: mean + std*randn (n_samples-1 draws) + mean, sorted.
    - ``uniform``: mean + linspace(-std, std, n_samples-1) + mean, sorted,
      clipped to the hardcoded [2, 6] range (reference utils.py:240).

    Returns (points [N, S, 3], z_vals [N, S]).
    """
    if mode == "depth_only":
        z_vals = mean
    elif mode == "gaussian":
        if noise is None:
            if key is None:
                raise ValueError("gaussian mode requires a PRNG key or noise")
            noise = jax.random.normal(key, (mean.shape[0], n_samples - 1))
        z_vals = jnp.sort(jnp.concatenate([mean + std * noise, mean], axis=-1), axis=-1)
    elif mode == "uniform":
        grid = jnp.linspace(-std, std, n_samples - 1)
        expanded = jnp.broadcast_to(grid[None, :], (mean.shape[0], n_samples - 1))
        z_vals = jnp.sort(jnp.concatenate([mean + expanded, mean], axis=-1), axis=-1)
        z_vals = jnp.clip(z_vals, 2, 6)
    else:
        raise ValueError(f"unknown sampling mode: {mode}")
    return z_to_points(rays_o, rays_d, z_vals), z_vals
