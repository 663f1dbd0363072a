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


_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,  # fp32-exact (6-pass on MXU)
    "high": jax.lax.Precision.HIGH,  # bf16x3 passes
    "default": jax.lax.Precision.DEFAULT,  # single bf16 pass
}


def linear_apply(
    params: dict[str, jnp.ndarray], x: jnp.ndarray, precision: str = "highest"
) -> jnp.ndarray:
    """y = x @ W + b.

    Default pinned to highest for PSNR parity on TPU MXU; training can trade
    precision for throughput via the model configs' ``precision`` field.
    """
    return (
        jnp.dot(x, params["weight"], precision=_PRECISIONS[precision])
        + params["bias"]
    )
