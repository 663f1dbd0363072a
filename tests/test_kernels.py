"""Pallas fused PE+NeRF kernel equivalence tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_sampling_tpu.core.encoding import positional_encoding
from nerf_sampling_tpu.kernels import fused_nerf_apply
from nerf_sampling_tpu.models import NeRFConfig, nerf_apply, nerf_init


def full_cfg():
    return NeRFConfig(
        D=8, W=256, input_ch=63, input_ch_views=27, output_ch=5,
        skips=(4,), use_viewdirs=True,
    )


def reference_forward(params, cfg, pts, dirs):
    pe = positional_encoding(pts, 10)
    de = positional_encoding(jnp.broadcast_to(dirs, pts.shape), 4)
    return nerf_apply(params, cfg, jnp.concatenate([pe, de], -1))


class TestFusedNeRF:
    @pytest.mark.parametrize("n", [512, 700])  # exact tile + ragged pad
    def test_matches_reference_f32(self, rng, n):
        cfg = full_cfg()
        params = nerf_init(jax.random.PRNGKey(0), cfg)
        pts = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
        want = reference_forward(params, cfg, pts, dirs)
        got = fused_nerf_apply(
            params, cfg, pts, dirs, dtype=jnp.float32, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )

    def test_matches_reference_bf16_loose(self, rng):
        cfg = full_cfg()
        params = nerf_init(jax.random.PRNGKey(0), cfg)
        pts = jnp.asarray(rng.standard_normal((256, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.standard_normal((256, 3)).astype(np.float32))
        want = np.asarray(reference_forward(params, cfg, pts, dirs))
        got = np.asarray(
            fused_nerf_apply(params, cfg, pts, dirs, dtype=jnp.bfloat16,
                             interpret=True)
        )
        # bf16 matmuls with f32 accumulation + f32 PE: ~1% error budget
        err = np.abs(got - want) / (np.abs(want) + 1e-2)
        assert float(err.mean()) < 0.01, float(err.mean())

    def test_high_frequency_pe_precision(self, rng):
        """The f32 in-kernel PE must track reference sin(x * 2^9) closely —
        this is what bf16 PE would get catastrophically wrong."""
        cfg = full_cfg()
        params = nerf_init(jax.random.PRNGKey(2), cfg)
        # large coordinates -> high phase at top frequency
        pts = jnp.asarray(rng.uniform(-4, 4, (128, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.standard_normal((128, 3)).astype(np.float32))
        want = np.asarray(reference_forward(params, cfg, pts, dirs))
        got = np.asarray(
            fused_nerf_apply(params, cfg, pts, dirs, dtype=jnp.float32,
                             interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)

    def test_batched_shape_and_broadcast_dirs(self, rng):
        """Per-ray dirs broadcast over the sample axis like run_network
        (Trainer.py:795-799)."""
        cfg = full_cfg()
        params = nerf_init(jax.random.PRNGKey(1), cfg)
        R, S = 6, 10
        pts = jnp.asarray(rng.standard_normal((R, S, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.standard_normal((R, 1, 3)).astype(np.float32))
        got = fused_nerf_apply(
            params, cfg, pts, dirs, dtype=jnp.float32, interpret=True
        )
        assert got.shape == (R, S, 4)
        want = reference_forward(params, cfg, pts, dirs)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )


class TestPadEdgeMultires:
    """multires combos whose sin/cos columns fill PAD so the 6 raw
    passthrough lanes don't fit: point kernels must still work (they never
    read those lanes); the ray kernels' stuff_raw pack must fail loudly."""

    def _cfg(self, multires=17, multires_views=4):
        return NeRFConfig(
            D=3, W=64,
            input_ch=3 + 6 * multires,
            input_ch_views=3 + 6 * multires_views,
            output_ch=5, skips=(1,), use_viewdirs=True,
        )

    def test_point_kernel_works_without_raw_lanes(self, rng):
        # rb = 6*(17+4) = 126 <= PAD=128 but 126+6 > PAD
        cfg = self._cfg()
        params = nerf_init(jax.random.PRNGKey(0), cfg)
        pts = jnp.asarray(rng.standard_normal((64, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.standard_normal((64, 3)).astype(np.float32))
        pe = positional_encoding(pts, 17)
        de = positional_encoding(jnp.broadcast_to(dirs, pts.shape), 4)
        want = nerf_apply(params, cfg, jnp.concatenate([pe, de], -1))
        got = fused_nerf_apply(
            params, cfg, pts, dirs, multires=17, multires_views=4,
            dtype=jnp.float32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )

    def test_stuff_raw_pack_raises(self):
        from nerf_sampling_tpu.kernels.fused_nerf import pack_nerf_params

        cfg = self._cfg()
        params = nerf_init(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError, match="raw passthrough"):
            pack_nerf_params(params, cfg, multires=17, multires_views=4,
                             stuff_raw=True)
