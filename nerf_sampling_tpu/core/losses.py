"""Loss functions for the depth network.

Parity target: reference loss_functions.py:8-50. The live training loss is a
plain MSE between DepthNet's depth and the argmax-weight depth (reference
Trainer.py:537); these auxiliary losses are kept for capability parity.
"""

from __future__ import annotations

from enum import Enum

import jax.numpy as jnp


def alphas_or_weights_loss(alphas_or_weights: jnp.ndarray) -> jnp.ndarray:
    """1 - mean(x): minimizing drives alphas/weights (in [0,1]) toward 1."""
    return 1 - jnp.mean(alphas_or_weights)


def mean_density_loss(density: jnp.ndarray) -> jnp.ndarray:
    """-mean(density): minimizing maximizes density."""
    return -jnp.mean(density)


def gaussian_distribution(x: jnp.ndarray, m: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Gaussian pdf evaluated at x with mean m, std s."""
    term1 = 1 / (s * jnp.sqrt(2 * jnp.pi))
    term2 = jnp.exp(-0.5 * ((x - m) / s) ** 2)
    return term1 * term2


def gaussian_log_likelihood(x: jnp.ndarray, m: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Negative Gaussian log-likelihood (reference loss_functions.py:35-42)."""
    N = x.shape[1]
    term1 = (-N / 2.0) * jnp.log(2 * jnp.pi * s**2)
    term2 = (1 / (2 * s**2)) * jnp.sum((x - m) ** 2)
    return -(term1 - term2)


class SamplerLossInput(Enum):
    """Options for depth-net loss function input (reference loss_functions.py:45-50)."""

    DENSITY = 0
    ALPHAS = 1
    WEIGHTS = 2
