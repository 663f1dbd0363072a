"""Model parity tests: NeRF MLP and DepthNet vs torch mirrors.

The torch mirrors re-implement the reference architectures
(/root/reference/nerf_sampling/nerf_pytorch/run_nerf_helpers.py:67-134,
 depth_nets/depth_net.py:10-169) from spec and are loaded with OUR params, so
any forward-pass mismatch is a real numerics/architecture divergence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from nerf_sampling_tpu.core.encoding import positional_encoding
from nerf_sampling_tpu.models import (
    DepthNetConfig,
    NeRFConfig,
    depth_net_apply,
    depth_net_init,
    nerf_apply,
    nerf_init,
)


def as_torch_linear(p):
    """Our [in, out] layer dict -> torch (weight [out, in], bias)."""
    w = torch.from_numpy(np.asarray(p["weight"]).T.copy())
    b = torch.from_numpy(np.asarray(p["bias"]).copy())
    return w, b


def torch_linear(x, p):
    w, b = as_torch_linear(p)
    return F.linear(x, w, b)


def torch_nerf_forward(params, cfg: NeRFConfig, x: torch.Tensor) -> torch.Tensor:
    """Reference NeRF.forward (run_nerf_helpers.py:109-134) on our params."""
    input_pts, input_views = torch.split(x, [cfg.input_ch, cfg.input_ch_views], dim=-1)
    h = input_pts
    for i, layer in enumerate(params["pts_linears"]):
        h = F.relu(torch_linear(h, layer))
        if i in cfg.skips:
            h = torch.cat([input_pts, h], -1)
    if cfg.use_viewdirs:
        alpha = torch_linear(h, params["alpha_linear"])
        feature = torch_linear(h, params["feature_linear"])
        h = torch.cat([feature, input_views], -1)
        for layer in params["views_linears"]:
            h = F.relu(torch_linear(h, layer))
        rgb = torch_linear(h, params["rgb_linear"])
        return torch.cat([rgb, alpha], -1)
    return torch_linear(h, params["output_linear"])


class TestNeRF:
    def test_viewdirs_matches_torch(self, rng):
        cfg = NeRFConfig(
            D=8, W=256, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(4,), use_viewdirs=True,
        )
        params = nerf_init(jax.random.PRNGKey(0), cfg)
        x = rng.standard_normal((37, 90)).astype(np.float32)
        ours = nerf_apply(params, cfg, jnp.asarray(x))
        theirs = torch_nerf_forward(params, cfg, torch.from_numpy(x))
        assert ours.shape == (37, 4)
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-5
        )

    def test_no_viewdirs_matches_torch(self, rng):
        cfg = NeRFConfig(D=4, W=64, input_ch=63, input_ch_views=0, output_ch=4,
                         skips=(2,), use_viewdirs=False)
        params = nerf_init(jax.random.PRNGKey(1), cfg)
        x = rng.standard_normal((10, 63)).astype(np.float32)
        ours = nerf_apply(params, cfg, jnp.asarray(x))
        theirs = torch_nerf_forward(params, cfg, torch.from_numpy(x))
        assert ours.shape == (10, 4)
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-5
        )

    def test_param_shapes_match_reference_architecture(self):
        # Skip layer (index 4) takes W + input_ch inputs (run_nerf_helpers.py:87-93).
        cfg = NeRFConfig(D=8, W=256, input_ch=63, input_ch_views=27, use_viewdirs=True)
        params = nerf_init(jax.random.PRNGKey(0), cfg)
        assert params["pts_linears"][0]["weight"].shape == (63, 256)
        assert params["pts_linears"][5]["weight"].shape == (256 + 63, 256)
        assert params["pts_linears"][1]["weight"].shape == (256, 256)
        assert params["views_linears"][0]["weight"].shape == (27 + 256, 128)
        assert params["rgb_linear"]["weight"].shape == (128, 3)
        assert params["alpha_linear"]["weight"].shape == (256, 1)


def torch_depth_net_forward(params, cfg: DepthNetConfig, ro, rd):
    """Reference DepthNet.forward (depth_net.py:117-169) on our params.

    Towers have NO inter-layer activation (the reference constructs-but-never-
    applies nn.LeakyReLU, depth_net.py:140-156); cat trunk applies LeakyReLU.
    """
    def embed(x, multires):
        out = [x]
        freqs = 2.0 ** torch.linspace(0.0, multires - 1, steps=multires)
        for f in freqs:
            out += [torch.sin(x * f), torch.cos(x * f)]
        return torch.cat(out, -1)

    o_emb = embed(ro, cfg.multires)
    d_emb = embed(rd, cfg.multires)
    oc = ro  # sphere at origin
    b = 2 * (rd * oc).sum(dim=1)
    c = torch.norm(oc, dim=1) ** 2 - cfg.sphere_radius**2
    a = (rd * rd).sum(dim=1)
    delta = b**2 - 4 * a * c
    pm = torch.stack([torch.ones_like(delta), -torch.ones_like(delta)])
    t = ((-b - pm * torch.sqrt(delta)) / (2 * a)).T
    pts = ro.unsqueeze(1) + t.unsqueeze(2) * rd.unsqueeze(1)
    i_emb = embed(torch.flatten(pts, start_dim=1), cfg.multires)

    def tower(layers, emb):
        h = emb
        for layer in layers:
            h = torch_linear(torch.cat([h, emb], -1), layer)
        return h

    o_out = tower(params["origin_layers"], o_emb)
    d_out = tower(params["direction_layers"], d_emb)
    i_out = tower(params["intersection_layers"], i_emb)
    h = torch.cat([o_out, d_out, i_out, o_emb, d_emb, i_emb], -1)
    for layer in params["cat_layers"]:
        h = F.leaky_relu(torch_linear(h, layer))
    depth = torch.sigmoid(torch_linear(h, params["to_depth"]))
    return cfg.near * (1 - depth) + cfg.far * depth


class TestDepthNet:
    def test_matches_torch(self, rng):
        cfg = DepthNetConfig(
            hidden_sizes=(32, 32, 32), cat_hidden_sizes=(32, 64), multires=6
        )
        params = depth_net_init(jax.random.PRNGKey(0), cfg)
        # rays guaranteed to hit the r=2 sphere
        ro = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (9, 1))
        rd = rng.standard_normal((9, 3)).astype(np.float32) * 0.1
        rd[:, 2] = -1.0
        ours = depth_net_apply(params, cfg, jnp.asarray(ro), jnp.asarray(rd))
        theirs = torch_depth_net_forward(
            params, cfg, torch.from_numpy(ro), torch.from_numpy(rd)
        )
        assert ours.shape == (9, 1)
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_output_shape_and_range(self):
        # reference tests.py:188-194 shape contract
        cfg = DepthNetConfig()
        params = depth_net_init(jax.random.PRNGKey(0), cfg)
        ro = jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (4, 1))
        rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1))
        z = depth_net_apply(params, cfg, ro, rd)
        assert z.shape == (4, 1)
        assert bool(jnp.all(z >= cfg.near)) and bool(jnp.all(z <= cfg.far))

    def test_layer_dims_match_reference_contract(self):
        # reference tests.py:114-175: skip-concat in_features per layer.
        cfg = DepthNetConfig(
            hidden_sizes=(16, 32, 64), cat_hidden_sizes=(32, 64, 128), multires=5
        )
        params = depth_net_init(jax.random.PRNGKey(0), cfg)
        emb = 5 * 2 * 3 + 3  # 33
        iemb = 5 * 2 * 6 + 6  # 66
        assert params["origin_layers"][0]["weight"].shape == (2 * emb, 16)
        assert params["origin_layers"][1]["weight"].shape == (16 + emb, 32)
        assert params["origin_layers"][2]["weight"].shape == (32 + emb, 64)
        assert params["intersection_layers"][0]["weight"].shape == (2 * iemb, 16)
        assert params["cat_layers"][0]["weight"].shape == (64 * 3 + emb * 2 + iemb, 32)
        assert params["cat_layers"][1]["weight"].shape == (32, 64)
        assert params["cat_layers"][2]["weight"].shape == (64, 128)
        assert params["to_depth"]["weight"].shape == (128, 1)

    def test_miss_rays_produce_nan(self):
        cfg = DepthNetConfig()
        params = depth_net_init(jax.random.PRNGKey(0), cfg)
        ro = jnp.array([[0.0, 0.0, 4.0], [0.0, 0.0, 4.0]])
        rd = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])  # second ray points away... still hits line
        rd = rd.at[1].set(jnp.array([1.0, 0.0, 0.0]))  # parallel miss
        z = depth_net_apply(params, cfg, ro, rd)
        assert not bool(jnp.isnan(z[0, 0]))
        assert bool(jnp.isnan(z[1, 0]))


class TestEmbedderColumnOrder:
    def test_nerf_input_embedding_matches_run_network(self, rng):
        """run_network embeds pts then dirs and concatenates (Trainer.py:789-806)."""
        pts = rng.standard_normal((5, 3)).astype(np.float32)
        dirs = rng.standard_normal((5, 3)).astype(np.float32)
        emb = jnp.concatenate(
            [
                positional_encoding(jnp.asarray(pts), 10),
                positional_encoding(jnp.asarray(dirs), 4),
            ],
            -1,
        )
        assert emb.shape == (5, 63 + 27)
