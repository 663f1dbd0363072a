"""Exported .tar checkpoints load into reference-shaped torch modules.

Closes the checkpoint-parity loop (VERDICT r1 missing #4): round 1 only
round-tripped export through our own importer. Here the exported .tar is
loaded into torch nn.Modules built with the REFERENCE's exact module/layer
names (run_nerf_helpers.py:67-134, depth_nets/depth_net.py:10-169) via
``load_state_dict(strict=True)`` — any key or shape drift fails loudly —
and the torch forward pass must equal our jax forward pass.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

from nerf_sampling_tpu.core.encoding import positional_encoding
from nerf_sampling_tpu.models import (
    DepthNetConfig,
    NeRFConfig,
    depth_net_apply,
    depth_net_init,
    nerf_apply,
    nerf_init,
)
from nerf_sampling_tpu.train.checkpoint import export_torch_checkpoint


class RefNeRF(nn.Module):
    """Reference NeRF module, names and all (run_nerf_helpers.py:67-134)."""

    def __init__(self, D, W, input_ch, input_ch_views, skips):
        super().__init__()
        self.input_ch, self.input_ch_views, self.skips = input_ch, input_ch_views, skips
        self.pts_linears = nn.ModuleList(
            [nn.Linear(input_ch, W)]
            + [
                nn.Linear(W + input_ch if i in skips else W, W)
                for i in range(D - 1)
            ]
        )
        self.views_linears = nn.ModuleList([nn.Linear(input_ch_views + W, W // 2)])
        self.feature_linear = nn.Linear(W, W)
        self.alpha_linear = nn.Linear(W, 1)
        self.rgb_linear = nn.Linear(W // 2, 3)

    def forward(self, x):
        input_pts, input_views = torch.split(
            x, [self.input_ch, self.input_ch_views], dim=-1
        )
        h = input_pts
        for i, layer in enumerate(self.pts_linears):
            h = F.relu(layer(h))
            if i in self.skips:
                h = torch.cat([input_pts, h], -1)
        alpha = self.alpha_linear(h)
        feature = self.feature_linear(h)
        h = torch.cat([feature, input_views], -1)
        for layer in self.views_linears:
            h = F.relu(layer(h))
        return torch.cat([self.rgb_linear(h), alpha], -1)


class RefDepthNet(nn.Module):
    """Reference DepthNet module structure (depth_net.py:22-116): towers are
    Sequentials of Linears (no activation — the reference constructs but
    never applies LeakyReLU there), cat trunk interleaves LeakyReLU, head is
    Sequential(Linear, Sigmoid)."""

    def __init__(self, hidden_sizes, cat_hidden_sizes, multires=10,
                 near=2.0, far=6.0, sphere_radius=2.0):
        super().__init__()
        self.multires, self.near, self.far = multires, near, far
        self.sphere_radius = sphere_radius
        odim = 3 * (1 + 2 * multires)
        idim = 6 * (1 + 2 * multires)

        def tower(in_dim):
            layers = [nn.Linear(in_dim + in_dim, hidden_sizes[0])]
            for i, size in enumerate(hidden_sizes[:-1]):
                layers.append(nn.Linear(size + in_dim, hidden_sizes[i + 1]))
            return nn.Sequential(*layers)

        self.origin_layers = tower(odim)
        self.direction_layers = tower(odim)
        self.intersection_layers = tower(idim)
        cat_layers = [
            nn.Linear(hidden_sizes[-1] * 3 + odim * 2 + idim, cat_hidden_sizes[0]),
            nn.LeakyReLU(),
        ]
        for i, size in enumerate(cat_hidden_sizes[:-1]):
            cat_layers += [nn.Linear(size, cat_hidden_sizes[i + 1]), nn.LeakyReLU()]
        self.cat_layers = nn.Sequential(*cat_layers)
        self.to_depth = nn.Sequential(nn.Linear(cat_hidden_sizes[-1], 1), nn.Sigmoid())

    def _embed(self, x):
        out = [x]
        freqs = 2.0 ** torch.linspace(0.0, self.multires - 1, steps=self.multires)
        for f in freqs:
            out += [torch.sin(x * f), torch.cos(x * f)]
        return torch.cat(out, -1)

    def forward(self, ro, rd):
        o_emb, d_emb = self._embed(ro), self._embed(rd)
        b = 2 * (rd * ro).sum(dim=1)
        c = torch.norm(ro, dim=1) ** 2 - self.sphere_radius**2
        a = (rd * rd).sum(dim=1)
        delta = b**2 - 4 * a * c
        pm = torch.stack([torch.ones_like(delta), -torch.ones_like(delta)])
        t = ((-b - pm * torch.sqrt(delta)) / (2 * a)).T
        pts = ro.unsqueeze(1) + t.unsqueeze(2) * rd.unsqueeze(1)
        i_emb = self._embed(torch.flatten(pts, start_dim=1))

        def run_tower(seq, emb):
            h = emb
            for layer in seq:
                h = layer(torch.cat([h, emb], -1))
            return h

        h = torch.cat(
            [
                run_tower(self.origin_layers, o_emb),
                run_tower(self.direction_layers, d_emb),
                run_tower(self.intersection_layers, i_emb),
                o_emb,
                d_emb,
                i_emb,
            ],
            -1,
        )
        depth = self.to_depth(self.cat_layers(h))
        return self.near * (1 - depth) + self.far * depth


class TestTorchInterop:
    def test_exported_tar_forward_equivalence(self, tmp_path, rng):
        nerf_cfg = NeRFConfig(
            D=8, W=64, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(4,), use_viewdirs=True,
        )
        depth_cfg = DepthNetConfig(
            hidden_sizes=(32, 32), cat_hidden_sizes=(32, 32), multires=10,
            near=2.0, far=6.0, sphere_radius=2.0,
        )
        coarse = nerf_init(jax.random.PRNGKey(0), nerf_cfg)
        fine = nerf_init(jax.random.PRNGKey(1), nerf_cfg)
        depth = depth_net_init(jax.random.PRNGKey(2), depth_cfg)

        tar = os.path.join(tmp_path, "000007.tar")
        export_torch_checkpoint(tar, 7, coarse, fine, depth)
        data = torch.load(tar, weights_only=True)
        assert data["global_step"] == 7

        # --- NeRF: strict load + forward parity (coarse and fine)
        for key, params in (
            ("network_fn_state_dict", coarse),
            ("network_fine_state_dict", fine),
        ):
            model = RefNeRF(8, 64, 63, 27, skips=[4])
            model.load_state_dict(data[key], strict=True)
            x = rng.standard_normal((23, 90)).astype(np.float32)
            theirs = model(torch.from_numpy(x)).detach().numpy()
            ours = np.asarray(nerf_apply(params, nerf_cfg, jnp.asarray(x)))
            np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)

        # --- DepthNet: strict load + forward parity on sphere-hitting rays
        dmodel = RefDepthNet((32, 32), (32, 32))
        dmodel.load_state_dict(data["depth_network"], strict=True)
        ro = np.zeros((17, 3), np.float32)
        ro[:, 2] = 0.5
        rd = rng.standard_normal((17, 3)).astype(np.float32)
        theirs = dmodel(torch.from_numpy(ro), torch.from_numpy(rd)).detach().numpy()
        ours = np.asarray(
            depth_net_apply(depth, depth_cfg, jnp.asarray(ro), jnp.asarray(rd))
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

        # --- optimizer state dicts are torch-Adam loadable (resume parity)
        opt = torch.optim.Adam(dmodel.parameters(), lr=1e-4)
        opt.load_state_dict(data["sampling_optimizer_state_dict"])

    def test_adam_moments_round_trip_bitwise(self, tmp_path, rng):
        """SURVEY §7: optimizer state must round-trip on export. Live optax
        Adam moments (after real update steps) export into the .tar's torch
        Adam state dicts; loading them into torch.optim.Adam over
        reference-shaped modules (exactly what the reference's load_nerf /
        load_depth_network do, utils.py:92-122) must reproduce our mu/nu
        BITWISE as exp_avg/exp_avg_sq, keyed in the reference's
        parameters() order, with optax's count as the per-param step."""
        import optax

        from nerf_sampling_tpu.render.engine import NeRFParams
        from nerf_sampling_tpu.train import checkpoint as ckpt_lib
        from nerf_sampling_tpu.train.state import (
            init_state,
            make_depth_optimizer,
            make_nerf_optimizer,
        )

        nerf_cfg = NeRFConfig(
            D=3, W=16, input_ch=63, input_ch_views=27, output_ch=5,
            skips=(1,), use_viewdirs=True,
        )
        depth_cfg = DepthNetConfig(
            hidden_sizes=(8, 8), cat_hidden_sizes=(8, 8), multires=10,
            near=2.0, far=6.0, sphere_radius=2.0,
        )
        nerf_params = NeRFParams(
            coarse=nerf_init(jax.random.PRNGKey(0), nerf_cfg),
            fine=nerf_init(jax.random.PRNGKey(1), nerf_cfg),
        )
        depth_params = depth_net_init(jax.random.PRNGKey(2), depth_cfg)

        # real optax steps so mu/nu/count are non-trivial
        def advance(opt, params, key, n=3):
            state = init_state(params, opt)
            for i in range(n):
                k = jax.random.fold_in(key, i)
                grads = jax.tree.map(
                    lambda p: jax.random.normal(
                        jax.random.fold_in(k, hash(p.shape) % 1000), p.shape
                    ),
                    params,
                )
                upd, new_opt = opt.update(grads, state.opt_state, state.params)
                state = state._replace(
                    params=optax.apply_updates(state.params, upd),
                    opt_state=new_opt,
                )
            return state

        nerf_state = advance(
            make_nerf_optimizer(5e-4, 250), nerf_params, jax.random.PRNGKey(7)
        )
        depth_state = advance(
            make_depth_optimizer(1e-4), depth_params, jax.random.PRNGKey(8)
        )

        step = 12345
        tar = os.path.join(tmp_path, f"{step:06d}.tar")
        ckpt_lib.export_torch_checkpoint(
            tar, step,
            nerf_state.params.coarse, nerf_state.params.fine,
            depth_state.params,
            nerf_opt_state=nerf_state.opt_state,
            depth_opt_state=depth_state.opt_state,
            lrate=5e-4, depth_net_lr=1e-4, lrate_decay=250,
        )
        data = torch.load(tar, weights_only=True)

        # decayed lr at the export step (reference Trainer.py:546-551)
        want_lr = 5e-4 * 0.1 ** (step / (250 * 1000))
        np.testing.assert_allclose(
            data["optimizer_state_dict"]["param_groups"][0]["lr"], want_lr
        )

        # NeRF: one torch Adam over coarse+fine grad_vars (nerf_utils.py:417-442)
        coarse_m = RefNeRF(3, 16, 63, 27, skips=[1])
        fine_m = RefNeRF(3, 16, 63, 27, skips=[1])
        coarse_m.load_state_dict(data["network_fn_state_dict"], strict=True)
        fine_m.load_state_dict(data["network_fine_state_dict"], strict=True)
        grad_vars = list(coarse_m.parameters()) + list(fine_m.parameters())
        topt = torch.optim.Adam(grad_vars, lr=5e-4, betas=(0.9, 0.999))
        topt.load_state_dict(data["optimizer_state_dict"])

        _, mu, nu = ckpt_lib._find_adam_moments(nerf_state.opt_state)
        order_c = ckpt_lib._nerf_param_order(nerf_state.params.coarse)
        mu_sd = ckpt_lib.nerf_params_to_torch(mu.coarse)
        nu_sd = ckpt_lib.nerf_params_to_torch(nu.coarse)
        mu_sd.update(
            {f"F.{k}": v for k, v in
             ckpt_lib.nerf_params_to_torch(mu.fine).items()}
        )
        nu_sd.update(
            {f"F.{k}": v for k, v in
             ckpt_lib.nerf_params_to_torch(nu.fine).items()}
        )
        names = order_c + [f"F.{n}" for n in order_c]
        assert len(names) == len(grad_vars)
        for p, nm in zip(grad_vars, names):
            st = topt.state[p]
            assert float(st["step"]) == 3.0  # optax count after 3 updates
            np.testing.assert_array_equal(
                st["exp_avg"].numpy(), mu_sd[nm].numpy(), err_msg=nm
            )
            np.testing.assert_array_equal(
                st["exp_avg_sq"].numpy(), nu_sd[nm].numpy(), err_msg=nm
            )
            assert st["exp_avg"].shape == p.shape

        # DepthNet: the sampling optimizer (sampling_trainer.py:78-80)
        dmodel = RefDepthNet((8, 8), (8, 8))
        dmodel.load_state_dict(data["depth_network"], strict=True)
        dopt = torch.optim.Adam(dmodel.parameters(), lr=1e-4)
        dopt.load_state_dict(data["sampling_optimizer_state_dict"])
        _, dmu, dnu = ckpt_lib._find_adam_moments(depth_state.opt_state)
        dmu_sd = ckpt_lib.depth_net_params_to_torch(dmu)
        dnu_sd = ckpt_lib.depth_net_params_to_torch(dnu)
        dorder = ckpt_lib._depth_param_order(depth_state.params)
        dparams = list(dmodel.parameters())
        assert len(dorder) == len(dparams)
        for p, nm in zip(dparams, dorder):
            st = dopt.state[p]
            assert float(st["step"]) == 3.0
            np.testing.assert_array_equal(
                st["exp_avg"].numpy(), dmu_sd[nm].numpy(), err_msg=nm
            )
            np.testing.assert_array_equal(
                st["exp_avg_sq"].numpy(), dnu_sd[nm].numpy(), err_msg=nm
            )
            assert st["exp_avg"].shape == p.shape
