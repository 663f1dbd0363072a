"""Fully-fused render kernel vs the composable pipeline (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sampling_tpu.core.compositing import raw2outputs
from nerf_sampling_tpu.core.encoding import positional_encoding
from nerf_sampling_tpu.core.sampling import stratified_z_vals, z_to_points
from nerf_sampling_tpu.kernels.fused_render import fused_render
from nerf_sampling_tpu.models import NeRFConfig, nerf_apply, nerf_init


def reference_render(params, cfg, ro, rd, n_samples, near, far, white_bkgd):
    z = stratified_z_vals(
        jnp.full((ro.shape[0], 1), near), jnp.full((ro.shape[0], 1), far),
        n_samples, perturb=0.0,
    )
    pts = z_to_points(ro, rd, z)
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    emb = jnp.concatenate(
        [
            positional_encoding(pts, 10),
            jnp.broadcast_to(
                positional_encoding(vd, 4)[:, None, :], (*pts.shape[:2], 27)
            ),
        ],
        -1,
    )
    raw = nerf_apply(params, cfg, emb)
    return raw2outputs(raw, z, rd, 0.0, white_bkgd)


def make_rays(n, rng):
    ro = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (n, 1))
    rd = (rng.standard_normal((n, 3)) * 0.2).astype(np.float32)
    rd[:, 2] = -1.0
    return jnp.asarray(ro), jnp.asarray(rd)


class TestFusedRender:
    def test_matches_pipeline_f32(self, rng):
        cfg = NeRFConfig(
            D=8, W=256, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(4,), use_viewdirs=True,
        )
        params = nerf_init(jax.random.PRNGKey(0), cfg)
        ro, rd = make_rays(200, rng)  # ragged vs tile=128 -> exercises pad
        got = fused_render(
            params, cfg, ro, rd, n_samples=16, dtype=jnp.float32, interpret=True
        )
        want = reference_render(params, cfg, ro, rd, 16, 2.0, 6.0, True)
        np.testing.assert_allclose(
            np.asarray(got["rgb_map"]), np.asarray(want.rgb_map), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["acc_map"]), np.asarray(want.acc_map), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["depth_map"]), np.asarray(want.depth_map),
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got["disp_map"]), np.asarray(want.disp_map),
            rtol=2e-3, atol=2e-3,
        )

    def test_bf16_close(self, rng):
        cfg = NeRFConfig(
            D=8, W=256, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(4,), use_viewdirs=True,
        )
        params = nerf_init(jax.random.PRNGKey(1), cfg)
        ro, rd = make_rays(128, rng)
        got = fused_render(params, cfg, ro, rd, n_samples=16, interpret=True)
        want = reference_render(params, cfg, ro, rd, 16, 2.0, 6.0, True)
        err = np.abs(np.asarray(got["rgb_map"]) - np.asarray(want.rgb_map))
        assert float(err.mean()) < 0.01, float(err.mean())

    def test_no_white_bkgd(self, rng):
        cfg = NeRFConfig(
            D=2, W=32, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(), use_viewdirs=True,
        )
        params = nerf_init(jax.random.PRNGKey(2), cfg)
        ro, rd = make_rays(128, rng)
        got = fused_render(
            params, cfg, ro, rd, n_samples=8, white_bkgd=False,
            dtype=jnp.float32, interpret=True,
        )
        want = reference_render(params, cfg, ro, rd, 8, 2.0, 6.0, False)
        np.testing.assert_allclose(
            np.asarray(got["rgb_map"]), np.asarray(want.rgb_map), rtol=2e-4, atol=2e-4
        )


class TestFastPathDispatch:
    def test_render_image_fast_path_matches_xla(self, rng):
        """render_image must route coarse-only FULL_NERF + pallas to the
        fused kernel and agree with the XLA path."""
        import dataclasses
        from nerf_sampling_tpu.render import EvalMode, NeRFParams, Pipeline, render_image

        cfg = NeRFConfig(
            D=8, W=256, input_ch=63, input_ch_views=27, output_ch=4,
            skips=(4,), use_viewdirs=True,
        )
        params = NeRFParams(coarse=nerf_init(jax.random.PRNGKey(0), cfg))
        p_xla = Pipeline(nerf=cfg, N_samples=16, N_importance=0, mlp_impl="xla")
        p_pal = dataclasses.replace(p_xla, mlp_impl="pallas")
        H, W, focal = 6, 8, 10.0
        K = jnp.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1.0]])
        c2w = jnp.array([[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.0]])
        key = jax.random.PRNGKey(0)
        a = render_image(p_xla, params, H, W, K, c2w, key, EvalMode.FULL_NERF)
        b = render_image(p_pal, params, H, W, K, c2w, key, EvalMode.FULL_NERF)
        assert b["depth_net_rgb_map"].shape == (H, W, 3)
        err = np.abs(
            np.asarray(a["depth_net_rgb_map"]) - np.asarray(b["depth_net_rgb_map"])
        )
        assert float(err.mean()) < 0.01, float(err.mean())  # bf16 budget


class TestFusedRenderAroundDepth:
    def test_matches_depth_net_eval_path(self, rng):
        """Populate-and-shade kernel vs sample_points_around_mean + MLP +
        raw2outputs (the DEPTH_NET eval mode, reference nerf_utils.py:837-865)."""
        from nerf_sampling_tpu.core.sampling import sample_points_around_mean
        from nerf_sampling_tpu.kernels.fused_render import fused_render_around_depth

        cfg = NeRFConfig(
            D=8, W=256, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(4,), use_viewdirs=True,
        )
        params = nerf_init(jax.random.PRNGKey(0), cfg)
        ro, rd = make_rays(150, rng)
        depth = jnp.asarray(
            rng.uniform(2.5, 5.5, (150, 1)).astype(np.float32)
        )
        n, std = 16, 0.5
        got = fused_render_around_depth(
            params, cfg, ro, rd, depth, n_samples=n, std=std,
            dtype=jnp.float32, interpret=True,
        )
        pts, z = sample_points_around_mean(
            ro, rd, depth, n_samples=n, mode="uniform", std=std
        )
        vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        emb = jnp.concatenate(
            [
                positional_encoding(pts, 10),
                jnp.broadcast_to(
                    positional_encoding(vd, 4)[:, None, :], (*pts.shape[:2], 27)
                ),
            ],
            -1,
        )
        want = raw2outputs(nerf_apply(params, cfg, emb), z, rd, 0.0, True)
        np.testing.assert_allclose(
            np.asarray(got["rgb_map"]), np.asarray(want.rgb_map), rtol=3e-4, atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["depth_map"]), np.asarray(want.depth_map),
            rtol=3e-4, atol=3e-4,
        )


class TestFusedShade:
    def test_shades_arbitrary_z(self, rng):
        """fused_shade must match nerf_apply + raw2outputs for caller-supplied
        (e.g. gaussian-populated or hierarchical) z values."""
        from nerf_sampling_tpu.kernels.fused_render import fused_shade

        cfg = NeRFConfig(
            D=8, W=256, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(4,), use_viewdirs=True,
        )
        params = nerf_init(jax.random.PRNGKey(0), cfg)
        ro, rd = make_rays(140, rng)
        z = jnp.sort(
            jnp.asarray(rng.uniform(2.0, 6.0, (140, 16)).astype(np.float32)), axis=-1
        )
        got = fused_shade(
            params, cfg, ro, rd, z, dtype=jnp.float32, interpret=True
        )
        pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
        vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        emb = jnp.concatenate(
            [
                positional_encoding(pts, 10),
                jnp.broadcast_to(
                    positional_encoding(vd, 4)[:, None, :], (*pts.shape[:2], 27)
                ),
            ],
            -1,
        )
        want = raw2outputs(nerf_apply(params, cfg, emb), z, rd, 0.0, True)
        np.testing.assert_allclose(
            np.asarray(got["rgb_map"]), np.asarray(want.rgb_map), rtol=3e-4, atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["acc_map"]), np.asarray(want.acc_map), rtol=3e-4, atol=3e-4
        )
