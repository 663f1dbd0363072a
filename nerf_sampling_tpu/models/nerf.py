"""NeRF MLP: 8x256 with a skip-concat at layer 4 and a viewdirs head.

Parity target: reference run_nerf_helpers.py:67-183 (class NeRF). Structure:

- ``pts_linears``: D layers; layer 0 is [input_ch -> W]; layers in ``skips``
  take [W + input_ch -> W] (the input is re-concatenated AFTER the skip
  layer's ReLU output, reference :114-118).
- viewdirs head: alpha = Linear(W,1)(h); feature = Linear(W,W)(h);
  h' = ReLU(Linear(W + input_ch_views, W/2)(cat(feature, views)));
  rgb = Linear(W/2, 3)(h'); output = cat(rgb, alpha).
- non-viewdirs: output = Linear(W, output_ch)(h).

The apply function takes the already-embedded input (positional encoding is
done by the caller / fused kernel), exactly like the reference's
``run_network`` (Trainer.py:789-806) which embeds then calls NeRF.forward.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nerf_sampling_tpu.models.common import linear_apply, linear_init


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    """Static NeRF architecture config (reference NeRF.__init__ args)."""

    D: int = 8
    W: int = 256
    input_ch: int = 3
    input_ch_views: int = 3
    output_ch: int = 4
    skips: tuple[int, ...] = (4,)
    use_viewdirs: bool = False
    # matmul precision: "highest" (fp32 parity) | "high" | "default" (bf16)
    precision: str = "highest"


def nerf_init(key: jax.Array, cfg: NeRFConfig) -> dict:
    """Build the NeRF parameter pytree."""
    n_keys = cfg.D + 4
    keys = list(jax.random.split(key, n_keys))

    pts_linears = [linear_init(keys[0], cfg.input_ch, cfg.W)]
    for i in range(cfg.D - 1):
        in_dim = cfg.W + cfg.input_ch if i in cfg.skips else cfg.W
        pts_linears.append(linear_init(keys[i + 1], in_dim, cfg.W))

    params: dict = {"pts_linears": pts_linears}
    if cfg.use_viewdirs:
        params["feature_linear"] = linear_init(keys[cfg.D], cfg.W, cfg.W)
        params["alpha_linear"] = linear_init(keys[cfg.D + 1], cfg.W, 1)
        params["views_linears"] = [
            linear_init(keys[cfg.D + 2], cfg.input_ch_views + cfg.W, cfg.W // 2)
        ]
        params["rgb_linear"] = linear_init(keys[cfg.D + 3], cfg.W // 2, 3)
    else:
        params["output_linear"] = linear_init(keys[cfg.D], cfg.W, cfg.output_ch)
    return params


def nerf_init_active(
    key: jax.Array, cfg: NeRFConfig, w_scale: float = 50.0, b_shift: float = 2.6
) -> dict:
    """nerf_init with a scaled/shifted alpha head so renders have density.

    A plain random init emits sigma ~ N(-0.05, 0.009) — 100% NEGATIVE, so
    relu zeroes every density and any render of it is the pure white
    background: comparing two renders of a random-init NeRF is vacuous
    (white == white regardless of kernel bugs). This init yields ~55%
    positive sigma (std ~0.45), so alpha compositing, weights, argmax
    diagnostics, and depth/disp maps are all non-trivial — use it for
    kernel-equivalence tests and on-chip validation.
    """
    params = nerf_init(key, cfg)
    head = "alpha_linear" if cfg.use_viewdirs else "output_linear"
    lin = dict(params[head])
    lin["weight"] = lin["weight"] * w_scale
    lin["bias"] = lin["bias"] * w_scale + b_shift
    params = dict(params)
    params[head] = lin
    return params


def nerf_apply(params: dict, cfg: NeRFConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the MLP on embedded inputs [..., input_ch + input_ch_views].

    Returns [..., 4] (rgb logits + density) when use_viewdirs, else
    [..., output_ch]. Matches reference NeRF.forward (run_nerf_helpers.py:109-134).
    """
    input_pts = x[..., : cfg.input_ch]
    input_views = x[..., cfg.input_ch : cfg.input_ch + cfg.input_ch_views]

    h = input_pts
    for i, layer in enumerate(params["pts_linears"]):
        h = jax.nn.relu(linear_apply(layer, h, cfg.precision))
        if i in cfg.skips:
            h = jnp.concatenate([input_pts, h], -1)

    if cfg.use_viewdirs:
        alpha = linear_apply(params["alpha_linear"], h, cfg.precision)
        feature = linear_apply(params["feature_linear"], h, cfg.precision)
        h = jnp.concatenate([feature, input_views], -1)
        for layer in params["views_linears"]:
            h = jax.nn.relu(linear_apply(layer, h, cfg.precision))
        rgb = linear_apply(params["rgb_linear"], h, cfg.precision)
        return jnp.concatenate([rgb, alpha], -1)
    return linear_apply(params["output_linear"], h, cfg.precision)
