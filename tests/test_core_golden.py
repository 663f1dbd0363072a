"""Golden-value parity tests: core jnp math vs the reference torch formulas.

Each test re-derives the reference computation in torch (implementing the
formulas cited from /root/reference file:line — not importing the reference)
and asserts our jnp implementation matches to float32 tolerance. This is the
mechanism SURVEY.md §4 calls for: golden tests for raw2outputs / sample_pdf /
positional encoding / ray generation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from nerf_sampling_tpu.core import (
    get_rays,
    get_rays_np,
    ndc_rays,
    positional_encoding,
    raw2outputs,
    sample_pdf,
    sample_points_around_mean,
    stratified_z_vals,
)


def torch_embed(x: torch.Tensor, multires: int) -> torch.Tensor:
    """Reference Embedder.embed (run_nerf_helpers.py:15-45)."""
    out = [x]
    freqs = 2.0 ** torch.linspace(0.0, multires - 1, steps=multires)
    for freq in freqs:
        for fn in [torch.sin, torch.cos]:
            out.append(fn(x * freq))
    return torch.cat(out, -1)


def torch_raw2outputs(raw, z_vals, rays_d, white_bkgd=True):
    """Reference DepthNetTrainer.raw2outputs (sampling_trainer.py:153-230)."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = torch.cat([dists, torch.tensor([1e10]).expand(dists[..., :1].shape)], -1)
    dists = dists * torch.norm(rays_d[..., None, :], dim=-1)
    rgb = torch.sigmoid(raw[..., :3])
    density = raw[..., 3]
    alphas = 1.0 - torch.exp(-F.relu(density) * dists)
    weights = (
        alphas
        * torch.cumprod(
            torch.cat([torch.ones((alphas.shape[0], 1)), 1.0 - alphas + 1e-10], -1), -1
        )[:, :-1]
    )
    rgb_map = torch.sum(weights[..., None] * rgb, -2)
    depth_map = torch.sum(weights * z_vals, -1)
    disp_map = 1.0 / torch.max(
        1e-10 * torch.ones_like(depth_map), depth_map / (torch.sum(weights, -1) + 1e-10)
    )
    acc_map = torch.sum(weights, -1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, disp_map, acc_map, depth_map, density, alphas, weights


def torch_sample_pdf(bins, weights, N_samples, u):
    """Reference sample_pdf with injected u (run_nerf_helpers.py:250-293)."""
    weights = weights + 1e-5
    pdf = weights / torch.sum(weights, -1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = u.contiguous()
    inds = torch.searchsorted(cdf, u, right=True)
    below = torch.max(torch.zeros_like(inds - 1), inds - 1)
    above = torch.min((cdf.shape[-1] - 1) * torch.ones_like(inds), inds)
    inds_g = torch.stack([below, above], -1)
    matched_shape = [inds_g.shape[0], inds_g.shape[1], cdf.shape[-1]]
    cdf_g = torch.gather(cdf.unsqueeze(1).expand(matched_shape), 2, inds_g)
    bins_g = torch.gather(bins.unsqueeze(1).expand(matched_shape), 2, inds_g)
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g[..., 0]) / denom
    return bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])


class TestPositionalEncoding:
    @pytest.mark.parametrize("multires,dims", [(10, 3), (4, 3), (10, 6), (5, 3)])
    def test_matches_torch(self, rng, multires, dims):
        x = rng.standard_normal((17, dims)).astype(np.float32)
        ours = positional_encoding(jnp.asarray(x), multires)
        theirs = torch_embed(torch.from_numpy(x), multires).numpy()
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-6, atol=1e-6)

    def test_out_dim(self):
        # multires * 2 * d + d (tests.py:122 in the reference suite)
        assert positional_encoding(jnp.zeros((1, 3)), 10).shape[-1] == 63
        assert positional_encoding(jnp.zeros((1, 6)), 10).shape[-1] == 126
        assert positional_encoding(jnp.zeros((1, 3)), 4).shape[-1] == 27


class TestRays:
    def test_get_rays_matches_np(self):
        H, W = 12, 16
        focal = 20.0
        K = np.array(
            [[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], dtype=np.float32
        )
        theta = 0.7
        c2w = np.array(
            [
                [np.cos(theta), 0, -np.sin(theta), 1.0],
                [0, 1, 0, 2.0],
                [np.sin(theta), 0, np.cos(theta), 4.0],
            ],
            dtype=np.float32,
        )
        ro_np, rd_np = get_rays_np(H, W, K, c2w)
        ro, rd = get_rays(H, W, jnp.asarray(K), jnp.asarray(c2w))
        np.testing.assert_allclose(np.asarray(ro), ro_np, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(rd), rd_np, rtol=1e-5, atol=1e-6)

    def test_ndc_rays_matches_torch(self, rng):
        H, W, focal = 24, 32, 30.0
        ro = rng.standard_normal((10, 3)).astype(np.float32)
        rd = rng.standard_normal((10, 3)).astype(np.float32)
        rd[:, 2] = -np.abs(rd[:, 2]) - 0.5  # rays go forward (-z)
        ro[:, 2] = -np.abs(ro[:, 2]) - 2.0

        # reference ndc_rays (run_nerf_helpers.py:221-246) in torch
        t_ro, t_rd = torch.from_numpy(ro), torch.from_numpy(rd)
        t = -(1.0 + t_ro[..., 2]) / t_rd[..., 2]
        t_ro = t_ro + t[..., None] * t_rd
        o0 = -1.0 / (W / (2.0 * focal)) * t_ro[..., 0] / t_ro[..., 2]
        o1 = -1.0 / (H / (2.0 * focal)) * t_ro[..., 1] / t_ro[..., 2]
        o2 = 1.0 + 2.0 * 1.0 / t_ro[..., 2]
        d0 = -1.0 / (W / (2.0 * focal)) * (
            t_rd[..., 0] / t_rd[..., 2] - t_ro[..., 0] / t_ro[..., 2]
        )
        d1 = -1.0 / (H / (2.0 * focal)) * (
            t_rd[..., 1] / t_rd[..., 2] - t_ro[..., 1] / t_ro[..., 2]
        )
        d2 = -2.0 * 1.0 / t_ro[..., 2]
        want_o = torch.stack([o0, o1, o2], -1).numpy()
        want_d = torch.stack([d0, d1, d2], -1).numpy()

        got_o, got_d = ndc_rays(H, W, focal, 1.0, jnp.asarray(ro), jnp.asarray(rd))
        np.testing.assert_allclose(np.asarray(got_o), want_o, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-5, atol=1e-6)


class TestRaw2Outputs:
    def test_matches_torch(self, rng):
        N, S = 32, 64
        raw = rng.standard_normal((N, S, 4)).astype(np.float32) * 2
        z_vals = np.sort(rng.uniform(2, 6, (N, S)).astype(np.float32), axis=-1)
        rays_d = rng.standard_normal((N, 3)).astype(np.float32)

        ours = raw2outputs(
            jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d), white_bkgd=True
        )
        theirs = torch_raw2outputs(
            torch.from_numpy(raw),
            torch.from_numpy(z_vals),
            torch.from_numpy(rays_d),
            white_bkgd=True,
        )
        names = ["rgb_map", "disp_map", "acc_map", "depth_map", "density", "alphas", "weights"]
        for name, got, want in zip(names, ours, theirs):
            np.testing.assert_allclose(
                np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5, err_msg=name
            )

    def test_no_white_bkgd(self, rng):
        N, S = 8, 16
        raw = rng.standard_normal((N, S, 4)).astype(np.float32)
        z_vals = np.sort(rng.uniform(0, 1, (N, S)).astype(np.float32), axis=-1)
        rays_d = rng.standard_normal((N, 3)).astype(np.float32)
        ours = raw2outputs(
            jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d), white_bkgd=False
        )
        theirs = torch_raw2outputs(
            torch.from_numpy(raw), torch.from_numpy(z_vals), torch.from_numpy(rays_d),
            white_bkgd=False,
        )
        np.testing.assert_allclose(
            np.asarray(ours.rgb_map), theirs[0].numpy(), rtol=1e-5, atol=1e-5
        )

    def test_density_noise_injection(self, rng):
        # pytest=True mechanism: identical injected noise -> identical alphas.
        N, S = 4, 8
        raw = rng.standard_normal((N, S, 4)).astype(np.float32)
        z_vals = np.sort(rng.uniform(2, 6, (N, S)).astype(np.float32), axis=-1)
        rays_d = rng.standard_normal((N, 3)).astype(np.float32)
        np.random.seed(0)
        noise = (np.random.rand(N, S) * 1.0).astype(np.float32)
        out = raw2outputs(
            jnp.asarray(raw),
            jnp.asarray(z_vals),
            jnp.asarray(rays_d),
            raw_noise_std=1.0,
            noise=jnp.asarray(noise),
        )
        # torch mirror with the same noise
        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
        dists = dists * np.linalg.norm(rays_d[:, None, :], axis=-1)
        want_alpha = 1.0 - np.exp(-np.maximum(raw[..., 3] + noise, 0) * dists)
        np.testing.assert_allclose(np.asarray(out.alphas), want_alpha, rtol=1e-5, atol=1e-5)


class TestSamplePdf:
    @pytest.mark.parametrize("det", [False, True])
    def test_matches_torch(self, rng, det):
        N, B, S = 16, 63, 128
        bins = np.sort(rng.uniform(2, 6, (N, B)).astype(np.float32), axis=-1)
        weights = rng.uniform(0, 1, (N, B - 1)).astype(np.float32)
        if det:
            u = np.broadcast_to(np.linspace(0.0, 1.0, S), (N, S)).astype(np.float64)
        else:
            np.random.seed(0)
            u = np.random.rand(N, S)
        ours = sample_pdf(
            jnp.asarray(bins), jnp.asarray(weights), S, u=jnp.asarray(u, dtype=jnp.float32)
        )
        theirs = torch_sample_pdf(
            torch.from_numpy(bins), torch.from_numpy(weights), S, torch.tensor(u)
        )
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-4
        )

    def test_samples_within_bins(self):
        key = jax.random.PRNGKey(0)
        bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 63), (4, 63))
        weights = jax.random.uniform(key, (4, 62))
        s = sample_pdf(bins, weights, 128, key=key)
        assert bool(jnp.all(s >= 2.0)) and bool(jnp.all(s <= 6.0))


class TestStratified:
    def test_linear_and_lindisp(self):
        near = jnp.full((5, 1), 2.0)
        far = jnp.full((5, 1), 6.0)
        z = stratified_z_vals(near, far, 64)
        assert z.shape == (5, 64)
        np.testing.assert_allclose(np.asarray(z[:, 0]), 2.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(z[:, -1]), 6.0, rtol=1e-6)
        zl = stratified_z_vals(near, far, 64, lindisp=True)
        np.testing.assert_allclose(np.asarray(zl[:, 0]), 2.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(zl[:, -1]), 6.0, rtol=1e-5)

    def test_perturb_injection_matches_torch(self, rng):
        # reference Trainer.py:612-626 with pytest=True noise injection
        near = jnp.full((3, 1), 2.0)
        far = jnp.full((3, 1), 6.0)
        np.random.seed(0)
        t_rand = np.random.rand(3, 8)
        z = stratified_z_vals(near, far, 8, perturb=1.0, t_rand=jnp.asarray(t_rand))

        t_vals = torch.linspace(0.0, 1.0, steps=8)
        z_t = 2.0 * (1.0 - t_vals) + 6.0 * t_vals
        z_t = z_t.expand([3, 8])
        mids = 0.5 * (z_t[..., 1:] + z_t[..., :-1])
        upper = torch.cat([mids, z_t[..., -1:]], -1)
        lower = torch.cat([z_t[..., :1], mids], -1)
        want = lower + (upper - lower) * torch.tensor(t_rand)
        np.testing.assert_allclose(np.asarray(z), want.numpy(), rtol=1e-5, atol=1e-6)

    def test_perturbed_in_strata(self):
        near = jnp.full((16, 1), 2.0)
        far = jnp.full((16, 1), 6.0)
        z = stratified_z_vals(near, far, 64, key=jax.random.PRNGKey(1), perturb=1.0)
        assert bool(jnp.all(z[:, 1:] > z[:, :-1]))
        assert bool(jnp.all(z >= 2.0)) and bool(jnp.all(z <= 6.0))


class TestSamplePointsAroundMean:
    def test_depth_only(self, rng):
        ro = rng.standard_normal((6, 3)).astype(np.float32)
        rd = rng.standard_normal((6, 3)).astype(np.float32)
        mean = rng.uniform(2, 6, (6, 1)).astype(np.float32)
        pts, z = sample_points_around_mean(
            jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(mean), mode="depth_only"
        )
        np.testing.assert_allclose(np.asarray(z), mean)
        want = ro[:, None, :] + rd[:, None, :] * mean[:, :, None]
        np.testing.assert_allclose(np.asarray(pts), want, rtol=1e-6)

    def test_uniform_matches_torch(self, rng):
        ro = rng.standard_normal((6, 3)).astype(np.float32)
        rd = rng.standard_normal((6, 3)).astype(np.float32)
        mean = rng.uniform(2, 6, (6, 1)).astype(np.float32)
        n, std = 8, 0.3
        _, z = sample_points_around_mean(
            jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(mean),
            n_samples=n, mode="uniform", std=std,
        )
        grid = torch.linspace(-std, std, steps=n - 1)
        expanded = grid.view(1, -1).expand(6, -1)
        want, _ = torch.cat(
            [torch.from_numpy(mean) + expanded, torch.from_numpy(mean)], dim=-1
        ).sort(dim=-1)
        want = torch.clip(want, 2, 6)
        np.testing.assert_allclose(np.asarray(z), want.numpy(), rtol=1e-5, atol=1e-6)

    def test_gaussian_sorted_and_contains_mean(self):
        key = jax.random.PRNGKey(0)
        ro = jnp.zeros((4, 3))
        rd = jnp.ones((4, 3))
        mean = jnp.full((4, 1), 4.0)
        _, z = sample_points_around_mean(
            ro, rd, mean, n_samples=16, mode="gaussian", std=0.1, key=key
        )
        assert z.shape == (4, 16)
        assert bool(jnp.all(z[:, 1:] >= z[:, :-1]))
        assert bool(jnp.any(jnp.isclose(z, 4.0), axis=-1).all())
