"""DepthNet: one-pass per-ray depth predictor.

Parity target: reference depth_nets/depth_net.py:10-169. Given ray origin and
direction, the network predicts the single depth along the ray where the
NeRF's volume-rendering weight peaks, replacing the 64-query coarse stage.

Structure (replicating the reference's *effective* computation):

- three input towers — origin, direction, flattened [N, 6] ray-sphere
  intersection points — each positional-encoded (multires 10) and run through
  per-layer skip-concat Linear stacks. NOTE: the reference constructs
  ``nn.LeakyReLU(x)`` between tower layers but never applies it
  (depth_net.py:140,148,156), so the towers are linear-with-skips; we
  replicate the behavior, not the apparent intent.
- cat trunk: cat(tower outputs, all three embeddings) -> [Linear, LeakyReLU]*
  (activations here ARE applied — they live inside the nn.Sequential).
- head: Linear -> sigmoid -> depth scaled to near*(1-d) + far*d.

Rays that miss the bounding sphere produce NaN intersection features and thus
NaN depth, exactly as in the reference (sqrt of negative discriminant).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nerf_sampling_tpu.core.encoding import Embedder
from nerf_sampling_tpu.core.geometry import find_intersection_points_with_sphere
from nerf_sampling_tpu.models.common import linear_apply, linear_init


@dataclasses.dataclass(frozen=True)
class DepthNetConfig:
    """Static DepthNet architecture config (reference DepthNet.__init__)."""

    hidden_sizes: tuple[int, ...] = (128, 128, 128, 128, 128, 128)
    cat_hidden_sizes: tuple[int, ...] = (128, 128, 128, 128, 256)
    origin_channels: int = 3
    direction_channels: int = 3
    multires: int = 10
    sphere_radius: float = 2.0
    near: float = 2.0
    far: float = 6.0
    # matmul precision: "highest" (fp32 parity) | "high" | "default" (bf16)
    precision: str = "highest"

    @property
    def origin_dims(self) -> int:
        return Embedder(self.origin_channels, self.multires).out_dim

    @property
    def direction_dims(self) -> int:
        return Embedder(self.direction_channels, self.multires).out_dim

    @property
    def intersection_dims(self) -> int:
        return Embedder(6, self.multires).out_dim


def _tower_dims(cfg: DepthNetConfig, embed_dim: int) -> list[tuple[int, int]]:
    """(in, out) dims of one tower's layers.

    Layer 0: [2*embed -> h0]; layer i: [h_{i-1} + skip_dim -> h_i] where the
    skip concat re-appends the tower's embedding every layer. NB the reference
    sizes the direction tower's skips with ``origin_dims`` (depth_net.py:72) —
    identical here since origin/direction are both 3-channel.
    """
    dims = [(embed_dim + embed_dim, cfg.hidden_sizes[0])]
    for i, size in enumerate(cfg.hidden_sizes[:-1]):
        dims.append((size + embed_dim, cfg.hidden_sizes[i + 1]))
    return dims


def depth_net_init(key: jax.Array, cfg: DepthNetConfig) -> dict:
    """Build the DepthNet parameter pytree."""
    o_dims = _tower_dims(cfg, cfg.origin_dims)
    d_dims = _tower_dims(cfg, cfg.origin_dims)  # sic: reference uses origin_dims
    d_dims[0] = (cfg.direction_dims + cfg.direction_dims, cfg.hidden_sizes[0])
    i_dims = _tower_dims(cfg, cfg.intersection_dims)

    cat_in = (
        cfg.hidden_sizes[-1] * 3
        + cfg.origin_dims
        + cfg.direction_dims
        + cfg.intersection_dims
    )
    cat_dims = [(cat_in, cfg.cat_hidden_sizes[0])]
    for i, size in enumerate(cfg.cat_hidden_sizes[:-1]):
        cat_dims.append((size, cfg.cat_hidden_sizes[i + 1]))

    n_layers = len(o_dims) * 3 + len(cat_dims) + 1
    keys = iter(jax.random.split(key, n_layers))
    return {
        "origin_layers": [linear_init(next(keys), *d) for d in o_dims],
        "direction_layers": [linear_init(next(keys), *d) for d in d_dims],
        "intersection_layers": [linear_init(next(keys), *d) for d in i_dims],
        "cat_layers": [linear_init(next(keys), *d) for d in cat_dims],
        "to_depth": linear_init(next(keys), cfg.cat_hidden_sizes[-1], 1),
    }


def _tower_apply(
    layers: list[dict], embedded: jnp.ndarray, precision: str = "highest"
) -> jnp.ndarray:
    """Skip-concat tower WITHOUT inter-layer activation (see module docstring)."""
    h = embedded
    for layer in layers:
        h = linear_apply(layer, jnp.concatenate([h, embedded], -1), precision)
    return h


def depth_net_apply(
    params: dict, cfg: DepthNetConfig, rays_o: jnp.ndarray, rays_d: jnp.ndarray
) -> jnp.ndarray:
    """Predict depth [N, 1] for rays (reference DepthNet.forward, :117-169)."""
    origin_emb = Embedder(cfg.origin_channels, cfg.multires)(rays_o)
    direction_emb = Embedder(cfg.direction_channels, cfg.multires)(rays_d)
    _, intersections = find_intersection_points_with_sphere(
        rays_o, rays_d, cfg.sphere_radius
    )
    intersection_emb = Embedder(6, cfg.multires)(
        intersections.reshape(rays_o.shape[0], 6)
    )

    origin_out = _tower_apply(params["origin_layers"], origin_emb, cfg.precision)
    direction_out = _tower_apply(params["direction_layers"], direction_emb, cfg.precision)
    intersection_out = _tower_apply(params["intersection_layers"], intersection_emb, cfg.precision)

    h = jnp.concatenate(
        [
            origin_out,
            direction_out,
            intersection_out,
            origin_emb,
            direction_emb,
            intersection_emb,
        ],
        -1,
    )
    for layer in params["cat_layers"]:
        h = jax.nn.leaky_relu(linear_apply(layer, h, cfg.precision), negative_slope=0.01)

    depth = jax.nn.sigmoid(linear_apply(params["to_depth"], h, cfg.precision))
    return cfg.near * (1 - depth) + cfg.far * depth
