"""Sinusoidal positional encoding (NeRF paper §5.1).

Parity target: reference run_nerf_helpers.py:15-63 (Embedder / get_embedder).

Design notes (TPU-first): the reference builds a Python list of per-frequency
lambdas and concatenates their outputs. Here the encoding is a single
vectorized expression — one broadcast multiply, one sin, one cos, one
interleave — which XLA fuses into the consumer matmul. The channel ordering
matches the reference exactly:

    [x, sin(x*f0), cos(x*f0), sin(x*f1), cos(x*f1), ...]

with each sin/cos block spanning all ``input_dims`` channels, so weights
imported from reference torch checkpoints line up column-for-column.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp


def _freq_bands(multires: int, log_sampling: bool = True) -> jnp.ndarray:
    """Frequency ladder 2^0 .. 2^(multires-1) (reference :31-34)."""
    max_freq = multires - 1
    if log_sampling:
        return 2.0 ** jnp.linspace(0.0, max_freq, multires)
    return jnp.linspace(2.0**0.0, 2.0**max_freq, multires)


def positional_encoding(
    x: jnp.ndarray,
    multires: int,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """Encode ``x [..., d]`` to ``[..., d * (include_input + 2*multires)]``.

    Ordering matches reference Embedder.embed (run_nerf_helpers.py:36-45):
    per frequency, sin block then cos block, each of width d.
    """
    if multires == 0:
        return x if include_input else x[..., :0]
    freqs = _freq_bands(multires, log_sampling)  # [F]
    # [..., F, d] — broadcast input against the frequency ladder.
    xf = x[..., None, :] * freqs[:, None]
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    # Interleave sin/cos per frequency: [..., F, 2, d] -> [..., F*2*d].
    sc = jnp.stack([sin, cos], axis=-2)
    flat = sc.reshape(*x.shape[:-1], multires * 2 * x.shape[-1])
    if include_input:
        return jnp.concatenate([x, flat], axis=-1)
    return flat


@dataclasses.dataclass(frozen=True)
class Embedder:
    """Static-config encoder; mirrors reference Embedder's (kwargs, out_dim)."""

    input_dims: int
    multires: int
    include_input: bool = True
    log_sampling: bool = True

    @property
    def out_dim(self) -> int:
        base = self.input_dims if self.include_input else 0
        return base + self.input_dims * 2 * self.multires

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return positional_encoding(
            x, self.multires, self.include_input, self.log_sampling
        )


def get_embedder(
    multires: int, i: int = 0, input_dims: int = 3
) -> tuple[Callable[[jnp.ndarray], jnp.ndarray], int]:
    """Reference-compatible factory (run_nerf_helpers.py:48-63).

    ``i == -1`` returns identity with out_dim 3, as in the reference.
    """
    if i == -1:
        return (lambda x: x), 3
    emb = Embedder(input_dims=input_dims, multires=multires)
    return emb, emb.out_dim
