"""Fused DepthNet kernel equivalence tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_sampling_tpu.kernels import fused_depth_net_apply
from nerf_sampling_tpu.models import DepthNetConfig, depth_net_apply, depth_net_init


def rays(n, rng):
    ro = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (n, 1))
    rd = (rng.standard_normal((n, 3)) * 0.1).astype(np.float32)
    rd[:, 2] = -1.0
    return jnp.asarray(ro), jnp.asarray(rd)


class TestFusedDepthNet:
    @pytest.mark.parametrize("n", [64, 100])  # exact tile + ragged pad
    def test_matches_reference_f32(self, rng, n):
        cfg = DepthNetConfig(
            hidden_sizes=(64, 64, 64), cat_hidden_sizes=(64, 64, 64)
        )
        params = depth_net_init(jax.random.PRNGKey(0), cfg)
        ro, rd = rays(n, rng)
        want = depth_net_apply(params, cfg, ro, rd)
        got = fused_depth_net_apply(
            params, cfg, ro, rd, dtype=jnp.float32, tile=64, interpret=True
        )
        assert got.shape == (n, 1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )

    def test_bf16_close(self, rng):
        cfg = DepthNetConfig(hidden_sizes=(64, 64), cat_hidden_sizes=(64, 64))
        params = depth_net_init(jax.random.PRNGKey(1), cfg)
        ro, rd = rays(64, rng)
        want = np.asarray(depth_net_apply(params, cfg, ro, rd))
        got = np.asarray(
            fused_depth_net_apply(params, cfg, ro, rd, tile=64, interpret=True)
        )
        # depth in [2, 6]; demand < 1% of the range
        assert float(np.abs(got - want).mean()) < 0.04

    def test_nan_for_missing_rays(self, rng):
        cfg = DepthNetConfig(hidden_sizes=(32, 32), cat_hidden_sizes=(32, 32))
        params = depth_net_init(jax.random.PRNGKey(0), cfg)
        ro = jnp.array([[0.0, 0.0, 4.0], [0.0, 0.0, 4.0]])
        rd = jnp.array([[0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])  # second misses
        got = fused_depth_net_apply(
            params, cfg, ro, rd, dtype=jnp.float32, tile=8, interpret=True
        )
        assert not bool(jnp.isnan(got[0, 0]))
        assert bool(jnp.isnan(got[1, 0]))
