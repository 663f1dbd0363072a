"""Shared building blocks for parameter-pytree models."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_init(
    key: jax.Array, in_features: int, out_features: int, dtype=jnp.float32
) -> dict[str, jnp.ndarray]:
    """Initialize one dense layer, matching torch.nn.Linear's default.

    torch uses kaiming_uniform(a=sqrt(5)) for the weight and U(-1/sqrt(in),
    1/sqrt(in)) for the bias — both reduce to U(-1/sqrt(in), 1/sqrt(in)).
    Weights are stored [in, out] (x @ W convention; transposed vs torch).
    """
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_features, dtype=jnp.float32))
    weight = jax.random.uniform(
        wkey, (in_features, out_features), dtype, minval=-bound, maxval=bound
    )
    bias = jax.random.uniform(bkey, (out_features,), dtype, minval=-bound, maxval=bound)
    return {"weight": weight, "bias": bias}


def linear_apply(params: dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ W + b. Precision pinned to highest for PSNR parity on TPU MXU."""
    return (
        jnp.dot(x, params["weight"], precision=jax.lax.Precision.HIGHEST)
        + params["bias"]
    )
