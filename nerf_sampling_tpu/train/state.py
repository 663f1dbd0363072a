"""Optimizers and train state.

Parity targets:
- NeRF Adam(lr=5e-4, betas=(0.9, 0.999)) — reference nerf_utils.py:442
- exponential lr decay lrate * 0.1^(step / (lrate_decay*1000)) — Trainer.py:546-551
- DepthNet Adam(lr=depth_net_lr), constant lr — sampling_trainer.py:78-80
  (the reference never decays the sampling optimizer's lr).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    """Minimal explicit train state (one per optimized model)."""

    step: jnp.ndarray  # scalar int32
    params: Any
    opt_state: Any


def nerf_lr_schedule(lrate: float, lrate_decay: int) -> optax.Schedule:
    """new_lr = lrate * 0.1^(step / (lrate_decay * 1000)), continuous."""
    return optax.exponential_decay(
        init_value=lrate,
        transition_steps=lrate_decay * 1000,
        decay_rate=0.1,
        staircase=False,
    )


def make_nerf_optimizer(
    lrate: float = 5e-4, lrate_decay: int = 250
) -> optax.GradientTransformation:
    """Adam with torch-default eps and the reference's exponential decay."""
    return optax.adam(
        nerf_lr_schedule(lrate, lrate_decay), b1=0.9, b2=0.999, eps=1e-8
    )


def make_depth_optimizer(depth_net_lr: float = 1e-4) -> optax.GradientTransformation:
    """Constant-lr Adam for the depth network."""
    return optax.adam(depth_net_lr, b1=0.9, b2=0.999, eps=1e-8)


def init_state(params: Any, optimizer: optax.GradientTransformation, step: int = 0):
    return TrainState(jnp.asarray(step, jnp.int32), params, optimizer.init(params))
