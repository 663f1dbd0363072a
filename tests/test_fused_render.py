"""Fully-fused render kernel vs the composable pipeline (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sampling_tpu.core.compositing import raw2outputs
from nerf_sampling_tpu.core.encoding import positional_encoding
from nerf_sampling_tpu.core.sampling import stratified_z_vals, z_to_points
from nerf_sampling_tpu.kernels.fused_render import fused_render
from nerf_sampling_tpu.models import NeRFConfig, nerf_apply, nerf_init_active


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
        params = nerf_init_active(jax.random.PRNGKey(0), cfg)
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
        params = nerf_init_active(jax.random.PRNGKey(1), cfg)
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
        params = nerf_init_active(jax.random.PRNGKey(2), cfg)
        ro, rd = make_rays(128, rng)
        got = fused_render(
            params, cfg, ro, rd, n_samples=8, white_bkgd=False,
            dtype=jnp.float32, interpret=True,
        )
        want = reference_render(params, cfg, ro, rd, 8, 2.0, 6.0, False)
        np.testing.assert_allclose(
            np.asarray(got["rgb_map"]), np.asarray(want.rgb_map), rtol=2e-4, atol=2e-4
        )


class TestFusedRenderLargeS:
    def test_s128_streaming_chunks(self, rng):
        """S=128 exercises the fori_loop streaming path (round-1 capped at 64)."""
        cfg = NeRFConfig(
            D=2, W=32, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(), use_viewdirs=True,
        )
        params = nerf_init_active(jax.random.PRNGKey(3), cfg)
        ro, rd = make_rays(128, rng)
        got = fused_render(
            params, cfg, ro, rd, n_samples=128, dtype=jnp.float32, interpret=True
        )
        want = reference_render(params, cfg, ro, rd, 128, 2.0, 6.0, True)
        np.testing.assert_allclose(
            np.asarray(got["rgb_map"]), np.asarray(want.rgb_map), rtol=3e-4, atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["depth_map"]), np.asarray(want.depth_map),
            rtol=3e-4, atol=3e-4,
        )

    def test_lindisp(self, rng):
        """linear-in-disparity z spacing (reference Trainer.py:611)."""
        from nerf_sampling_tpu.core.sampling import stratified_z_vals, z_to_points

        cfg = NeRFConfig(
            D=2, W=32, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(), use_viewdirs=True,
        )
        params = nerf_init_active(jax.random.PRNGKey(4), cfg)
        ro, rd = make_rays(128, rng)
        got = fused_render(
            params, cfg, ro, rd, n_samples=8, lindisp=True,
            dtype=jnp.float32, interpret=True,
        )
        z = stratified_z_vals(
            jnp.full((128, 1), 2.0), jnp.full((128, 1), 6.0), 8,
            perturb=0.0, lindisp=True,
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
        want = raw2outputs(nerf_apply(params, cfg, emb), z, rd, 0.0, True)
        np.testing.assert_allclose(
            np.asarray(got["rgb_map"]), np.asarray(want.rgb_map), rtol=3e-4, atol=3e-4
        )


class TestRotationPE:
    """The rotation-recurrence PE (ops.pe_rotation_consts) vs jnp.sin."""

    def _consts(self, rng, R):
        from nerf_sampling_tpu.kernels.fused_nerf import _pe_matrices

        F, P = _pe_matrices(10, 4)
        o = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (R, 1))
        d = (rng.standard_normal((R, 3)) * 0.2).astype(np.float32)
        d[:, 2] = -1.0
        vd = d / np.linalg.norm(d, axis=1, keepdims=True)
        XDIM = F.shape[0]
        X_o = np.concatenate([o, vd, np.zeros((R, XDIM - 6), np.float32)], 1)
        X_d = np.concatenate([d, np.zeros((R, XDIM - 3), np.float32)], 1)
        return (jnp.asarray(X_o @ F + P), jnp.asarray(X_d @ F)), jnp.asarray(P)

    def test_recurrence_drift_bounded(self, rng):
        """fp32 drift over S=64 steps stays in the 1e-3 class even on the
        2^9 frequency lanes (the phase error of the fp32 rotation constant
        accumulates linearly) — 8x below bf16 resolution, which is why the
        production kernels enable the recurrence for bf16 only. Raw
        passthrough lanes must carry the exact affine values."""
        from nerf_sampling_tpu.kernels import ops
        from nerf_sampling_tpu.kernels.fused_nerf import raw_base

        consts, P = self._consts(rng, 64)
        AF, BF = consts
        rb = raw_base(10, 4)
        S, near, far = 64, 2.0, 6.0
        dz = (far - near) / (S - 1)
        state, rot = ops.pe_rotation_consts(consts, P, near, dz, rb)
        got, _ = ops.pe_rotate_chunk(state, rot, S, jnp.float32)  # [S*R, PAD]
        z = near + dz * np.arange(S, dtype=np.float32)
        arg = (AF[None] + z[:, None, None] * BF[None]).reshape(got.shape)
        want = jnp.where(ops.raw_lane_mask(arg.shape[1], rb), arg, jnp.sin(arg))
        err = float(jnp.max(jnp.abs(got - want)))
        assert err < 2e-3, err

    def test_kernel_bf16_rotation_matches_sin(self, rng):
        """Auto mode (bf16) takes the recurrence; the delta vs the
        transcendental path must stay within bf16 rounding noise."""
        cfg = NeRFConfig(
            D=2, W=32, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(), use_viewdirs=True,
        )
        params = nerf_init_active(jax.random.PRNGKey(7), cfg)
        ro, rd = make_rays(128, rng)
        a = fused_render(params, cfg, ro, rd, n_samples=16, interpret=True)
        b = fused_render(
            params, cfg, ro, rd, n_samples=16, interpret=True, pe_rotation=False
        )
        err = float(jnp.max(jnp.abs(a["rgb_map"] - b["rgb_map"])))
        assert err < 0.02, err

    def test_offset_rotation_matches_sin(self, rng):
        """The statically-scheduled offset rotation (uniform populate,
        ops.PEOffsetRotation) must match the transcendental path including
        CLIPPED samples (depths near both bounds at std=1.0 force the
        boundary emits)."""
        from nerf_sampling_tpu.kernels.fused_render import (
            fused_render_around_depth,
        )

        cfg = NeRFConfig(
            D=2, W=32, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(), use_viewdirs=True,
        )
        params = nerf_init_active(jax.random.PRNGKey(9), cfg)
        ro, rd = make_rays(128, rng)
        depth = jnp.asarray(
            np.linspace(2.05, 5.95, 128, dtype=np.float32).reshape(128, 1)
        )
        for S in (2, 16):
            a = fused_render_around_depth(
                params, cfg, ro, rd, depth, n_samples=S, std=1.0,
                interpret=True, pe_rotation=True,
            )
            b = fused_render_around_depth(
                params, cfg, ro, rd, depth, n_samples=S, std=1.0,
                interpret=True, pe_rotation=False,
            )
            err = float(jnp.max(jnp.abs(a["rgb_map"] - b["rgb_map"])))
            assert err < 0.02, (S, err)
        # the offset deltas are small (B*delta ~ exact rotation constants),
        # so even forced-fp32 agreement is tight — this pins the boundary
        # emit + schedule correctness well below the bf16 noise floor
        e = fused_render_around_depth(
            params, cfg, ro, rd, depth, n_samples=64, std=1.0,
            dtype=jnp.float32, interpret=True, pe_rotation=True,
        )
        f = fused_render_around_depth(
            params, cfg, ro, rd, depth, n_samples=64, std=1.0,
            dtype=jnp.float32, interpret=True, pe_rotation=False,
        )
        err = float(jnp.max(jnp.abs(e["rgb_map"] - f["rgb_map"])))
        assert err < 1e-3, err

    def test_offset_rotation_traced_scale(self, rng):
        """The offset rotation's schedule is keyed on the UNIT grid and the
        actual std is recovered from the traced z input — a non-unit,
        non-round distance must still match the transcendental path, and
        sweeping the distance must NOT add a kernel compile cache entry."""
        from nerf_sampling_tpu.kernels import fused_render as fr
        from nerf_sampling_tpu.kernels.fused_render import (
            fused_render_around_depth,
        )

        cfg = NeRFConfig(
            D=2, W=32, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(), use_viewdirs=True,
        )
        params = nerf_init_active(jax.random.PRNGKey(9), cfg)
        ro, rd = make_rays(128, rng)
        depth = jnp.asarray(
            np.linspace(2.2, 5.8, 128, dtype=np.float32).reshape(128, 1)
        )
        for std in (0.37, 0.7):
            a = fused_render_around_depth(
                params, cfg, ro, rd, depth, n_samples=16, std=std,
                dtype=jnp.float32, interpret=True, pe_rotation=True,
            )
            b = fused_render_around_depth(
                params, cfg, ro, rd, depth, n_samples=16, std=std,
                dtype=jnp.float32, interpret=True, pe_rotation=False,
            )
            err = float(jnp.max(jnp.abs(a["rgb_map"] - b["rgb_map"])))
            assert err < 1e-3, (std, err)
        # the two stds above shared ONE rotation-kernel compile: only the
        # first call may add a cache entry for this (n, flags) point
        n_before = fr._call._cache_size()
        fused_render_around_depth(
            params, cfg, ro, rd, depth, n_samples=16, std=0.51,
            dtype=jnp.float32, interpret=True, pe_rotation=True,
        )
        assert fr._call._cache_size() == n_before

    def test_fp32_auto_keeps_transcendental(self, rng):
        """fp32 diagnostic kernels must stay bit-identical to the
        transcendental path (auto gating)."""
        cfg = NeRFConfig(
            D=2, W=32, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(), use_viewdirs=True,
        )
        params = nerf_init_active(jax.random.PRNGKey(8), cfg)
        ro, rd = make_rays(128, rng)
        a = fused_render(
            params, cfg, ro, rd, n_samples=16, dtype=jnp.float32, interpret=True
        )
        b = fused_render(
            params, cfg, ro, rd, n_samples=16, dtype=jnp.float32,
            interpret=True, pe_rotation=False,
        )
        assert float(jnp.max(jnp.abs(a["rgb_map"] - b["rgb_map"]))) == 0.0


class TestUnsortedCompositing:
    def test_shuffled_z_matches_sorted(self, rng):
        """The order-free compositor (assume_sorted=False) must reproduce the
        stable-sorted render exactly — this is what makes in-kernel gaussian
        population sort-free."""
        from nerf_sampling_tpu.kernels.fused_render import fused_shade

        cfg = NeRFConfig(
            D=2, W=32, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(), use_viewdirs=True,
        )
        params = nerf_init_active(jax.random.PRNGKey(5), cfg)
        ro, rd = make_rays(128, rng)
        z_sorted = jnp.sort(
            jnp.asarray(rng.uniform(2.0, 6.0, (128, 16)).astype(np.float32)), -1
        )
        perm = rng.permutation(16)
        z_shuf = z_sorted[:, perm]
        a = fused_shade(
            params, cfg, ro, rd, z_sorted, dtype=jnp.float32, interpret=True
        )
        b = fused_shade(
            params, cfg, ro, rd, z_shuf, dtype=jnp.float32, interpret=True,
            assume_sorted=False,
        )
        for k in ("rgb_map", "acc_map", "depth_map", "disp_map"):
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), rtol=1e-5, atol=1e-5
            )

    def test_duplicate_z_ties(self, rng):
        """Stable tie-breaking: duplicated z values must match the sorted
        compositor (sort is stable; first-in-storage wins)."""
        from nerf_sampling_tpu.kernels.fused_render import fused_shade

        cfg = NeRFConfig(
            D=2, W=32, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(), use_viewdirs=True,
        )
        params = nerf_init_active(jax.random.PRNGKey(6), cfg)
        ro, rd = make_rays(128, rng)
        base = jnp.sort(
            jnp.asarray(rng.uniform(2.0, 6.0, (128, 8)).astype(np.float32)), -1
        )
        z = jnp.repeat(base, 2, axis=-1)  # every value duplicated, sorted
        a = fused_shade(params, cfg, ro, rd, z, dtype=jnp.float32, interpret=True)
        b = fused_shade(
            params, cfg, ro, rd, z, dtype=jnp.float32, interpret=True,
            assume_sorted=False,
        )
        for k in ("rgb_map", "acc_map", "depth_map"):
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), rtol=1e-5, atol=1e-5
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
        params = NeRFParams(coarse=nerf_init_active(jax.random.PRNGKey(0), cfg))
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
        params = nerf_init_active(jax.random.PRNGKey(0), cfg)
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
        params = nerf_init_active(jax.random.PRNGKey(0), cfg)
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


class TestFusedHier:
    def _setup(self, rng, seed=7):
        cfg = NeRFConfig(
            D=2, W=32, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(), use_viewdirs=True,
        )
        coarse = nerf_init_active(jax.random.PRNGKey(seed), cfg)
        fine = nerf_init_active(jax.random.PRNGKey(seed + 1), cfg)
        ro, rd = make_rays(130, rng)  # ragged vs tile=128 -> exercises pad
        return cfg, coarse, fine, ro, rd

    def _xla_reference(self, cfg, coarse, fine, ro, rd, n_c, n_f, lindisp=False):
        from nerf_sampling_tpu.render import (
            EvalMode, NeRFParams, Pipeline, make_ray_batch, render_rays_eval,
        )

        p = Pipeline(
            nerf=cfg, fine=cfg, N_samples=n_c, N_importance=n_f,
            lindisp=lindisp, mlp_impl="xla",
        )
        rays = make_ray_batch(p, ro, rd)
        params = NeRFParams(coarse=coarse, fine=fine)
        return render_rays_eval(
            p, params, rays, jax.random.PRNGKey(0), EvalMode.FULL_NERF
        )

    def test_matches_full_nerf_eval(self, rng):
        """Fused hierarchical kernel vs the composable FULL_NERF eval path
        (reference sample_as_in_NeRF at perturb=0, nerf_utils.py:497-611)."""
        from nerf_sampling_tpu.kernels.fused_hier import fused_render_hier

        cfg, coarse, fine, ro, rd = self._setup(rng)
        n_c, n_f = 8, 16
        got = fused_render_hier(
            coarse, cfg, fine, cfg, ro, rd, n_coarse=n_c, n_importance=n_f,
            dtype=jnp.float32, interpret=True,
        )
        want = self._xla_reference(cfg, coarse, fine, ro, rd, n_c, n_f)
        np.testing.assert_allclose(
            np.asarray(got["rgb_map"]),
            np.asarray(want["depth_net_rgb_map"]), rtol=3e-4, atol=3e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got["max_z"]),
            np.asarray(want["max_z_vals"])[:, 0], rtol=3e-4, atol=3e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got["max_w"]),
            np.asarray(want["max_weights"])[:, 0], rtol=3e-4, atol=3e-4,
        )

    def test_shared_coarse_fine(self, rng):
        """fine_params=None must reuse the coarse net (reference
        create_nerf with N_importance>0 but no separate fine)."""
        from nerf_sampling_tpu.kernels.fused_hier import fused_render_hier

        cfg, coarse, _, ro, rd = self._setup(rng, seed=9)
        got = fused_render_hier(
            coarse, cfg, None, None, ro, rd, n_coarse=8, n_importance=8,
            dtype=jnp.float32, interpret=True,
        )
        from nerf_sampling_tpu.render import (
            EvalMode, NeRFParams, Pipeline, make_ray_batch, render_rays_eval,
        )

        p = Pipeline(nerf=cfg, N_samples=8, N_importance=8, mlp_impl="xla")
        rays = make_ray_batch(p, ro, rd)
        want = render_rays_eval(
            p, NeRFParams(coarse=coarse), rays, jax.random.PRNGKey(0),
            EvalMode.FULL_NERF,
        )
        np.testing.assert_allclose(
            np.asarray(got["rgb_map"]),
            np.asarray(want["depth_net_rgb_map"]), rtol=3e-4, atol=3e-4,
        )

    def test_lindisp_hier(self, rng):
        from nerf_sampling_tpu.kernels.fused_hier import fused_render_hier

        cfg, coarse, fine, ro, rd = self._setup(rng, seed=11)
        got = fused_render_hier(
            coarse, cfg, fine, cfg, ro, rd, n_coarse=8, n_importance=8,
            lindisp=True, dtype=jnp.float32, interpret=True,
        )
        want = self._xla_reference(cfg, coarse, fine, ro, rd, 8, 8, lindisp=True)
        np.testing.assert_allclose(
            np.asarray(got["rgb_map"]),
            np.asarray(want["depth_net_rgb_map"]), rtol=3e-4, atol=3e-4,
        )


class TestFusedModeDispatch:
    """render_image must route COMPARE_NERF / NERF_MAX / hierarchical
    FULL_NERF to the fused kernels and agree with the XLA path."""

    def _setup(self):
        import dataclasses
        from nerf_sampling_tpu.models import DepthNetConfig, depth_net_init
        from nerf_sampling_tpu.render import NeRFParams, Pipeline

        cfg = NeRFConfig(
            D=2, W=32, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(), use_viewdirs=True,
        )
        dcfg = DepthNetConfig(hidden_sizes=(16, 16), cat_hidden_sizes=(16, 16))
        params = NeRFParams(
            coarse=nerf_init_active(jax.random.PRNGKey(0), cfg),
            fine=nerf_init_active(jax.random.PRNGKey(1), cfg),
            depth=depth_net_init(jax.random.PRNGKey(2), dcfg),
        )
        p_xla = Pipeline(
            nerf=cfg, fine=cfg, depth=dcfg, N_samples=8, N_importance=8,
            n_depth_samples=8, sampling_mode="uniform", distance=0.5,
            mlp_impl="xla",
        )
        p_pal = dataclasses.replace(p_xla, mlp_impl="pallas")
        H, W, focal = 6, 8, 10.0
        K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1.0]], np.float32)
        c2w = np.array(
            [[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.0]], np.float32
        )
        return params, p_xla, p_pal, H, W, K, c2w

    def test_hier_full_nerf(self):
        from nerf_sampling_tpu.render import EvalMode, render_image

        params, p_xla, p_pal, H, W, K, c2w = self._setup()
        key = jax.random.PRNGKey(0)
        a = render_image(p_xla, params, H, W, K, c2w, key, EvalMode.FULL_NERF)
        b = render_image(p_pal, params, H, W, K, c2w, key, EvalMode.FULL_NERF)
        np.testing.assert_allclose(
            np.asarray(a["depth_net_rgb_map"]),
            np.asarray(b["depth_net_rgb_map"]), rtol=0, atol=0.02,
        )

    def test_nerf_max(self):
        from nerf_sampling_tpu.render import EvalMode, render_image

        params, p_xla, p_pal, H, W, K, c2w = self._setup()
        key = jax.random.PRNGKey(0)
        a = render_image(p_xla, params, H, W, K, c2w, key, EvalMode.NERF_MAX)
        b = render_image(p_pal, params, H, W, K, c2w, key, EvalMode.NERF_MAX)
        assert b["depth_net_rgb_map"].shape == (H, W, 3)
        assert b["max_z_vals"].shape == a["max_z_vals"].shape
        np.testing.assert_allclose(
            np.asarray(a["max_z_vals"]), np.asarray(b["max_z_vals"]),
            rtol=0, atol=0.05,
        )
        np.testing.assert_allclose(
            np.asarray(a["depth_net_rgb_map"]),
            np.asarray(b["depth_net_rgb_map"]), rtol=0, atol=0.02,
        )

    def test_compare_nerf(self):
        from nerf_sampling_tpu.render import EvalMode, render_image

        params, p_xla, p_pal, H, W, K, c2w = self._setup()
        key = jax.random.PRNGKey(0)
        a = render_image(p_xla, params, H, W, K, c2w, key, EvalMode.COMPARE_NERF)
        b = render_image(p_pal, params, H, W, K, c2w, key, EvalMode.COMPARE_NERF)
        # depth-net half: per-sample z kept for the compare MSE diagnostic.
        # COMPARE is the parity-diagnostic mode and runs its kernels in
        # fp32 (engine._fused_fast_paths), so everything lands in the
        # 3e-4 class (the r2 bf16 dispatch needed 0.05 here).
        assert b["depth_net_z_vals"].shape == a["depth_net_z_vals"].shape
        np.testing.assert_allclose(
            np.asarray(a["depth_net_z_vals"]),
            np.asarray(b["depth_net_z_vals"]), rtol=0, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(a["max_z_vals"]), np.asarray(b["max_z_vals"]),
            rtol=0, atol=3e-4,
        )
        np.testing.assert_allclose(
            np.asarray(a["depth_net_rgb_map"]),
            np.asarray(b["depth_net_rgb_map"]), rtol=0, atol=3e-4,
        )

    def test_depth_net_gaussian_cpu(self):
        """Gaussian DEPTH_NET on CPU: fused branch draws in XLA + shades
        in-kernel; sanity (shapes + finiteness; PRNG streams differ)."""
        import dataclasses
        from nerf_sampling_tpu.render import EvalMode, render_image

        params, p_xla, p_pal, H, W, K, c2w = self._setup()
        p_pal = dataclasses.replace(p_pal, sampling_mode="gaussian")
        out = render_image(
            p_pal, params, H, W, K, c2w, jax.random.PRNGKey(3), EvalMode.DEPTH_NET
        )
        rgb = np.asarray(out["depth_net_rgb_map"])
        assert rgb.shape == (H, W, 3) and np.isfinite(rgb).all()

    def test_compare_nerf_fallback_forces_fp32_xla(self):
        """A COMPARE config the fused fast path rejects (depth_only
        populate) must keep the fp32 precision contract: the pallas
        pipeline's fallback forces the fp32 XLA path, so its output is
        bit-identical to an explicitly-XLA pipeline — without the fix the
        hierarchical max_z target ran through bf16 kernels and carried
        ~1e-3-z noise the tightened tolerances assume away."""
        import dataclasses
        from nerf_sampling_tpu.render import EvalMode, render_image

        params, p_xla, p_pal, H, W, K, c2w = self._setup()
        p_xla = dataclasses.replace(
            p_xla, sampling_mode="depth_only", n_depth_samples=1
        )
        p_pal = dataclasses.replace(
            p_pal, sampling_mode="depth_only", n_depth_samples=1
        )
        key = jax.random.PRNGKey(0)
        a = render_image(p_xla, params, H, W, K, c2w, key, EvalMode.COMPARE_NERF)
        b = render_image(p_pal, params, H, W, K, c2w, key, EvalMode.COMPARE_NERF)
        for k in ("depth_net_rgb_map", "max_z_vals", "depth_net_z_vals"):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
