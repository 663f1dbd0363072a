"""Train-layer tests: checkpoints (native + torch interop), steps, sampler,
convergence smokes, and an end-to-end Trainer run on the example dataset."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerf_sampling_tpu.data.example import generate_example_dataset, make_example_scene
from nerf_sampling_tpu.models import (
    DepthNetConfig,
    NeRFConfig,
    depth_net_apply,
    depth_net_init,
    nerf_init,
)
from nerf_sampling_tpu.render import NeRFParams, Pipeline, make_ray_batch
from nerf_sampling_tpu.train import (
    RaySampler,
    SamplerConfig,
    Trainer,
    export_torch_checkpoint,
    import_torch_checkpoint,
    load_checkpoint,
    make_depth_net_train_step,
    make_depth_optimizer,
    make_nerf_optimizer,
    make_nerf_train_step,
    save_checkpoint,
)
from nerf_sampling_tpu.train.state import init_state
from nerf_sampling_tpu.utils.config import TrainerConfig


def trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    return len(la) == len(lb) and all(
        np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb)
    )


def tiny_pipeline():
    nerf_cfg = NeRFConfig(
        D=3, W=32, input_ch=63, input_ch_views=27, output_ch=5,
        skips=(1,), use_viewdirs=True,
    )
    depth_cfg = DepthNetConfig(hidden_sizes=(16, 16), cat_hidden_sizes=(16, 16))
    return Pipeline(
        nerf=nerf_cfg, fine=nerf_cfg, depth=depth_cfg, N_samples=8, N_importance=8
    )


def tiny_bundle(p):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return NeRFParams(
        coarse=nerf_init(ks[0], p.nerf),
        fine=nerf_init(ks[1], p.fine),
        depth=depth_net_init(ks[2], p.depth),
    )


class TestCheckpoints:
    def test_native_roundtrip(self, tmp_path):
        """Analog of reference tests.py:29-77: params + optimizer state
        round-trip exactly."""
        p = tiny_pipeline()
        params = tiny_bundle(p)
        opt = make_depth_optimizer(1e-4)
        state = init_state(params.depth, opt, 0)
        tree = {"params": params, "opt_state": state.opt_state}
        path = str(tmp_path / "ckpt_002000.npz")
        save_checkpoint(path, tree, 2000)
        restored, step = load_checkpoint(path, tree)
        assert step == 2000
        assert trees_equal(tree, restored)

    def test_torch_tar_roundtrip(self, tmp_path):
        p = tiny_pipeline()
        params = tiny_bundle(p)
        path = str(tmp_path / "002000.tar")
        export_torch_checkpoint(
            path, 2000, params.coarse, params.fine, params.depth
        )
        data = import_torch_checkpoint(path)
        assert data["global_step"] == 2000
        assert trees_equal(params.coarse, data["nerf_coarse"])
        assert trees_equal(params.fine, data["nerf_fine"])
        assert trees_equal(params.depth, data["depth"])

    def test_tar_has_reference_keys_and_shapes(self, tmp_path):
        """The exported .tar must carry the reference key layout
        (utils.py:79-88) with torch's [out, in] Linear convention."""
        import torch

        p = tiny_pipeline()
        params = tiny_bundle(p)
        path = str(tmp_path / "000100.tar")
        export_torch_checkpoint(path, 100, params.coarse, params.fine, params.depth)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        for key in (
            "global_step",
            "network_fn_state_dict",
            "network_fine_state_dict",
            "optimizer_state_dict",
            "sampling_optimizer_state_dict",
            "depth_network",
        ):
            assert key in ckpt, key
        sd = ckpt["network_fn_state_dict"]
        assert sd["pts_linears.0.weight"].shape == (32, 63)  # [out, in]
        dsd = ckpt["depth_network"]
        assert "cat_layers.0.weight" in dsd and "cat_layers.2.weight" in dsd
        assert "cat_layers.1.weight" not in dsd  # LeakyReLU slot
        assert "to_depth.0.weight" in dsd


class TestSampler:
    def test_per_image_shapes(self):
        scene = make_example_scene(H=20, W=20, n_train=3, n_val=1, n_test=1)
        s = RaySampler(scene, SamplerConfig(N_rand=64))
        ro, rd, t = s.sample(0)
        assert ro.shape == (64, 3) and rd.shape == (64, 3) and t.shape == (64, 3)
        assert ro.dtype == np.float32

    def test_precrop(self):
        scene = make_example_scene(H=20, W=20, n_train=3, n_val=1, n_test=1)
        s = RaySampler(
            scene, SamplerConfig(N_rand=16, precrop_iters=5, precrop_frac=0.5)
        )
        # During precrop, all rays come from the central half of the image:
        # their directions are bounded away from the image corners.
        ro_c, rd_c, _ = s.sample(0)
        ro_f, rd_f, _ = s.sample(10)
        assert rd_c.shape == (16, 3) and rd_f.shape == (16, 3)

    def test_single_ray(self):
        scene = make_example_scene(H=20, W=20, n_train=3, n_val=1, n_test=1)
        s = RaySampler(scene, SamplerConfig(N_rand=16, single_ray=True))
        ro, rd, t = s.sample(0)
        assert ro.shape == (1, 3)

    def test_batching_epoch(self):
        scene = make_example_scene(H=8, W=8, n_train=2, n_val=1, n_test=1)
        s = RaySampler(scene, SamplerConfig(N_rand=32, use_batching=True))
        total = 2 * 8 * 8
        seen = 0
        for i in range(2 * total // 32 + 1):  # cross an epoch boundary
            ro, rd, t = s.sample(i)
            assert ro.shape == (32, 3)
            seen += 32


class TestSteps:
    def test_depth_step_updates_depth_only(self):
        p = tiny_pipeline()
        params = tiny_bundle(p)
        opt = make_depth_optimizer(1e-3)
        state = init_state(params.depth, opt)
        step = make_depth_net_train_step(p, opt)
        ro = jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (16, 1))
        rd = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-0.2, maxval=0.2)
        rd = rd.at[:, 2].set(-1.0)
        rays = make_ray_batch(p, ro, rd)
        target = jnp.ones((16, 3)) * 0.5
        # snapshot: the step donates its input state's buffers
        before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
        new_state, metrics = step(params, state, (rays, target), jax.random.PRNGKey(0))
        assert int(new_state.step) == 1
        assert not trees_equal(before, new_state.params)
        for k in ("loss", "depth_net_loss", "psnr"):
            assert np.isfinite(float(metrics[k])), k
        # fg/bg depth-loss diagnostics (drift investigation, RESULTS.md)
        for k in ("depth_loss_fg", "depth_loss_bg", "fg_frac"):
            assert np.isfinite(float(metrics[k])), k
        assert 0.0 <= float(metrics["fg_frac"]) <= 1.0

    def test_bg_depth_loss_weight_extension(self):
        """bg_depth_loss_weight=0 masks background rays out of the depth
        objective: the logged depth_net_loss must equal
        depth_loss_fg * fg_frac (sum over fg rays / all rays). Default 1.0
        is the exact reference objective (img2mse path)."""
        import dataclasses

        p0 = tiny_pipeline()
        params = tiny_bundle(p0)
        opt = make_depth_optimizer(1e-3)
        ro = jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (16, 1))
        rd = jax.random.uniform(
            jax.random.PRNGKey(1), (16, 3), minval=-0.4, maxval=0.4
        )
        rd = rd.at[:, 2].set(-1.0)
        rays = make_ray_batch(p0, ro, rd)
        target = jnp.full((16, 3), 0.5)

        p_masked = dataclasses.replace(p0, bg_depth_loss_weight=0.0)
        step = make_depth_net_train_step(p_masked, opt)
        state = init_state(params.depth, opt)
        _, m = step(params, state, (rays, target), jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            float(m["depth_net_loss"]),
            float(m["depth_loss_fg"]) * float(m["fg_frac"]),
            rtol=1e-5,
        )

    def test_nerf_step_decreases_loss(self):
        p = tiny_pipeline()
        params = tiny_bundle(p)._replace(depth=None)
        opt = make_nerf_optimizer(5e-3, 250)
        state = init_state(params, opt)
        step = make_nerf_train_step(p, opt)
        ro = jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (32, 1))
        rd = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.3, maxval=0.3)
        rd = rd.at[:, 2].set(-1.0)
        rays = make_ray_batch(p, ro, rd)
        target = jnp.zeros((32, 3))  # black target against white bkgd
        losses = []
        for i in range(30):
            state, metrics = step(state, (rays, target), jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses[::10]


    def test_multi_step_matches_sequential(self):
        """make_multi_step(K) is bit-identical to K sequential steps with the
        trainer's fold_in(base_key, i) key stream."""
        from nerf_sampling_tpu.train import make_multi_step

        p = tiny_pipeline()
        params = tiny_bundle(p)._replace(depth=None)
        opt = make_nerf_optimizer(5e-3, 250)
        step = make_nerf_train_step(p, opt)
        rng = np.random.default_rng(0)
        K, N = 4, 16
        stack = np.zeros((K, N, 9), np.float32)
        stack[..., 2] = 4.0  # rays_o z
        stack[..., 3:6] = rng.uniform(-0.3, 0.3, (K, N, 3))
        stack[..., 5] = -1.0  # rays_d z
        stack[..., 6:9] = rng.uniform(0, 1, (K, N, 3))
        base_key = jax.random.PRNGKey(7)
        i0 = 3

        # the steps donate their state: each run needs its own param buffers
        fresh = lambda: jax.tree.map(lambda x: jnp.array(np.asarray(x)), params)
        seq_state = init_state(fresh(), opt)
        seq_metrics = []
        for j in range(K):
            seq_state, m = step(
                seq_state, jnp.asarray(stack[j]), jax.random.fold_in(base_key, i0 + j)
            )
            seq_metrics.append(float(m["loss"]))

        multi = make_multi_step(step, n_states=1)
        m_state, ms = multi(init_state(fresh(), opt), jnp.asarray(stack), base_key, i0)
        assert int(m_state.step) == K
        np.testing.assert_allclose(
            np.asarray(ms["loss"]), np.asarray(seq_metrics), rtol=0, atol=0
        )
        for a, b in zip(jax.tree.leaves(seq_state.params), jax.tree.leaves(m_state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_multi_step_with_const_matches_frozen(self):
        """The scanned depth step with the frozen NeRF as a loop-invariant
        ARGUMENT (checkpoint-independent compile) must match sequential
        steps of the frozen-as-constants variant exactly."""
        from nerf_sampling_tpu.train import make_multi_step

        p = tiny_pipeline()
        bundle = tiny_bundle(p)
        nerf_only = bundle._replace(depth=None)
        opt = make_depth_optimizer(1e-3)
        rng = np.random.default_rng(2)
        K, N = 3, 16
        stack = np.zeros((K, N, 9), np.float32)
        stack[..., 2] = 4.0
        stack[..., 3:6] = rng.uniform(-0.2, 0.2, (K, N, 3))
        stack[..., 5] = -1.0
        stack[..., 6:9] = rng.uniform(0, 1, (K, N, 3))
        base_key = jax.random.PRNGKey(5)

        fresh = lambda: jax.tree.map(lambda x: jnp.array(np.asarray(x)), bundle.depth)
        frozen_step = make_depth_net_train_step(p, opt, frozen_nerf=bundle)
        seq = init_state(fresh(), opt)
        for j in range(K):
            seq, m = frozen_step(
                seq, jnp.asarray(stack[j]), jax.random.fold_in(base_key, 1 + j)
            )

        arg_step = make_depth_net_train_step(p, opt)  # nerf as argument
        multi = make_multi_step(arg_step, n_states=1, with_const=True)
        ms_state, ms = multi(
            nerf_only, init_state(fresh(), opt), jnp.asarray(stack), base_key, 1
        )
        assert np.asarray(ms["loss"]).shape == (K,)
        for a, b in zip(jax.tree.leaves(seq.params), jax.tree.leaves(ms_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)

    def test_multi_step_joint(self):
        """Two-state (joint) variant runs and advances both states."""
        from nerf_sampling_tpu.train import make_multi_step
        from nerf_sampling_tpu.train.steps import make_joint_train_step

        p = tiny_pipeline()
        bundle = tiny_bundle(p)
        n_opt = make_nerf_optimizer(5e-3, 250)
        d_opt = make_depth_optimizer(1e-3)
        step = make_joint_train_step(p, n_opt, d_opt)
        ns = init_state(bundle._replace(depth=None), n_opt)
        ds = init_state(bundle.depth, d_opt)
        rng = np.random.default_rng(1)
        stack = np.zeros((3, 8, 9), np.float32)
        stack[..., 2] = 4.0
        stack[..., 3:6] = rng.uniform(-0.2, 0.2, (3, 8, 3))
        stack[..., 5] = -1.0
        multi = make_multi_step(step, n_states=2)
        ns2, ds2, ms = multi(ns, ds, jnp.asarray(stack), jax.random.PRNGKey(0), 1)
        assert int(ns2.step) == 3 and int(ds2.step) == 3
        assert np.asarray(ms["loss"]).shape == (3,)
        assert np.all(np.isfinite(np.asarray(ms["loss"])))


class TestDepthNetConvergence:
    def test_overfits_fixed_depths(self):
        """Reference tests/depth_network_test_mse.py: DepthNet overfits a few
        target depths in ~100 Adam steps."""
        cfg = DepthNetConfig(hidden_sizes=(32, 32), cat_hidden_sizes=(32, 32))
        params = depth_net_init(jax.random.PRNGKey(0), cfg)
        ro = jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (5, 1))
        rd = jnp.array(
            [[0.05, 0.0, -1.0], [0.0, 0.05, -1.0], [-0.05, 0.0, -1.0],
             [0.0, -0.05, -1.0], [0.0, 0.0, -1.0]]
        )
        targets = jnp.array([[2.5], [3.0], [4.2], [5.0], [5.5]])
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(prm):
                z = depth_net_apply(prm, cfg, ro, rd)
                return jnp.mean((z - targets) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        first = None
        for i in range(150):
            params, opt_state, loss = step(params, opt_state)
            if first is None:
                first = float(loss)
        assert float(loss) < 0.05, (first, float(loss))


@pytest.mark.slow
class TestTrainerE2E:
    def test_nerf_then_depth_net(self, tmp_path):
        """End-to-end slice (SURVEY.md §7): pretrain a tiny NeRF on the
        example scene, checkpoint it, then train DepthNet against it frozen."""
        datadir = generate_example_dataset(
            str(tmp_path / "data"), H=24, W=24, n_train=4, n_val=1, n_test=2
        )
        common = dict(
            dataset_type="blender",
            datadir=datadir,
            basedir=str(tmp_path / "logs"),
            half_res=False,
            testskip=1,
            N_rand=64,
            N_samples=8,
            N_importance=8,
            netdepth=3,
            netwidth=32,
            netdepth_fine=3,
            netwidth_fine=32,
            n_layers=2,
            layer_width=16,
            i_print=20,
            i_weights=20,
            i_testset=10_000,
            i_video=10_000_000,
            lrate=5e-3,
        )
        # NeRFConfig skips=(4,) assumes D>4; tiny D=3 needs skips inside range.
        # Use netdepth=8? too slow; instead rely on default skip logic being
        # valid for D=3: skip index 4 is out of range -> never triggers, and
        # layer dims stay [W -> W]; that's a valid (skipless) MLP.
        nerf_cfg = TrainerConfig(
            expname="nerf_pre", train_mode="nerf", train_depth_net_only=False, **common
        )
        t1 = Trainer(nerf_cfg)
        psnr = t1.train(N_iters=41)
        assert np.isfinite(psnr)
        ckpt = os.path.join(t1.expdir, "000040.npz")
        assert os.path.exists(ckpt)
        assert os.path.exists(os.path.join(t1.expdir, "000040.tar"))
        assert os.path.exists(os.path.join(t1.expdir, "psnr.txt"))

        depth_cfg = TrainerConfig(
            expname="depth_net",
            train_mode="depth_net",
            ft_path=os.path.join(t1.expdir, "000040.tar"),
            **common,
        )
        t2 = Trainer(depth_cfg)
        psnr2 = t2.train(N_iters=21)
        assert np.isfinite(psnr2)

        # render-only path over the test split using the trained ckpt
        render_cfg = TrainerConfig(
            expname="depth_net",
            train_mode="depth_net",
            ft_path=os.path.join(t1.expdir, "000040.tar"),
            depth_net_path=os.path.join(t2.expdir, "depth_000020.npz"),
            render_only=True,
            render_test=True,
            n_depth_samples=2,
            sampling_mode="uniform",
            distance=0.01,
            **common,
        )
        t3 = Trainer(render_cfg)
        avg_psnr = t3.train(N_iters=1)
        assert np.isfinite(avg_psnr)
        out_dir = os.path.join(t3.expdir, "renderonly_test_000020")
        assert os.path.exists(os.path.join(out_dir, "000.png"))
        assert os.path.exists(os.path.join(out_dir, "psnr.txt"))


    def test_scanned_trainer_loop(self, tmp_path):
        """The scanned train loop (explicit steps_per_dispatch, CPU) drives
        both modes end-to-end: checkpoints land on cadence, metrics finite,
        and the depth mode uses the checkpoint-independent const-arg path."""
        datadir = generate_example_dataset(
            str(tmp_path / "data"), H=16, W=16, n_train=3, n_val=1, n_test=1
        )
        common = dict(
            dataset_type="blender", datadir=datadir,
            basedir=str(tmp_path / "logs"), half_res=False, testskip=1,
            N_rand=32, N_samples=8, N_importance=8, netdepth=3, netwidth=32,
            netdepth_fine=3, netwidth_fine=32, n_layers=2, layer_width=16,
            i_print=10, i_weights=20, i_testset=10_000, i_video=10_000_000,
            lrate=5e-3, steps_per_dispatch=5,
        )
        t1 = Trainer(TrainerConfig(
            expname="nerf_scan", train_mode="nerf",
            train_depth_net_only=False, **common,
        ))
        psnr = t1.train(N_iters=21)
        assert np.isfinite(psnr)
        assert os.path.exists(os.path.join(t1.expdir, "000020.npz"))

        t2 = Trainer(TrainerConfig(
            expname="depth_scan", train_mode="depth_net",
            ft_path=os.path.join(t1.expdir, "000020.npz"), **common,
        ))
        psnr2 = t2.train(N_iters=21)
        assert np.isfinite(psnr2)
        assert os.path.exists(os.path.join(t2.expdir, "depth_000020.npz"))


class TestJointTraining:
    def test_joint_step_updates_both(self):
        """Both NeRF and DepthNet must change under the joint step (the
        reference's NeRF optimizer never stepped; SURVEY.md defect #4)."""
        from nerf_sampling_tpu.train.steps import make_joint_train_step

        p = tiny_pipeline()
        params = tiny_bundle(p)
        nopt = make_nerf_optimizer(1e-3, 250)
        dopt = make_depth_optimizer(1e-3)
        ns = init_state(params._replace(depth=None), nopt)
        ds = init_state(params.depth, dopt)
        step = make_joint_train_step(p, nopt, dopt)
        ro = jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (16, 1))
        rd = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-0.2, maxval=0.2)
        rd = rd.at[:, 2].set(-1.0)
        rays = make_ray_batch(p, ro, rd)
        target = jnp.full((16, 3), 0.5)
        before_n = jax.tree.map(lambda x: np.asarray(x).copy(), ns.params)
        before_d = jax.tree.map(lambda x: np.asarray(x).copy(), ds.params)
        ns2, ds2, m = step(ns, ds, (rays, target), jax.random.PRNGKey(0))
        assert not trees_equal(before_n, ns2.params)
        assert not trees_equal(before_d, ds2.params)
        for k in ("loss", "img_loss", "depth_net_loss", "psnr"):
            assert np.isfinite(float(m[k])), k

    def test_joint_step_honors_bg_depth_loss_weight(self):
        """Joint mode must apply bg_depth_loss_weight and emit the fg/bg
        diagnostics like the depth_net mode (review finding: it silently
        trained the full background-noise objective)."""
        import dataclasses

        from nerf_sampling_tpu.train.steps import make_joint_train_step

        p = tiny_pipeline()
        nopt = make_nerf_optimizer(1e-3, 250)
        dopt = make_depth_optimizer(1e-3)
        ro = jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (16, 1))
        rd = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-0.2, maxval=0.2)
        rd = rd.at[:, 2].set(-1.0)
        target = jnp.full((16, 3), 0.5)

        metrics = {}
        for w in (1.0, 0.0):
            pw = dataclasses.replace(p, bg_depth_loss_weight=w)
            # fresh copies per arm: the jitted step donates its state
            # buffers, which would delete a shared bundle's leaves
            params = jax.tree.map(jnp.array, tiny_bundle(p))
            ns = init_state(params._replace(depth=None), nopt)
            ds = init_state(params.depth, dopt)
            step = make_joint_train_step(pw, nopt, dopt)
            rays = make_ray_batch(pw, ro, rd)
            _, _, m = step(ns, ds, (rays, target), jax.random.PRNGKey(0))
            metrics[w] = m
        for m in metrics.values():
            for k in ("depth_loss_fg", "depth_loss_bg", "fg_frac"):
                assert k in m, k
        # identical inputs: diagnostics agree, but the trained objective
        # drops the background term under w=0
        assert np.allclose(
            float(metrics[1.0]["depth_loss_fg"]), float(metrics[0.0]["depth_loss_fg"])
        )
        assert float(metrics[0.0]["depth_net_loss"]) != float(
            metrics[1.0]["depth_net_loss"]
        )

    def test_joint_depth_warmup_gate(self):
        """With joint_depth_warmup=N, the depth net (params AND optimizer
        state) must stay exactly frozen while step < N and start moving at
        step >= N; the NeRF trains throughout."""
        import dataclasses

        from nerf_sampling_tpu.train.steps import make_joint_train_step

        p = dataclasses.replace(tiny_pipeline(), joint_depth_warmup=2)
        params = tiny_bundle(p)
        nopt = make_nerf_optimizer(1e-3, 250)
        dopt = make_depth_optimizer(1e-3)
        ns = init_state(params._replace(depth=None), nopt)
        ds = init_state(params.depth, dopt)
        step = make_joint_train_step(p, nopt, dopt)
        ro = jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (16, 1))
        rd = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-0.2, maxval=0.2)
        rd = rd.at[:, 2].set(-1.0)
        rays = make_ray_batch(p, ro, rd)
        target = jnp.full((16, 3), 0.5)
        d0 = jax.tree.map(lambda x: np.asarray(x).copy(), ds.params)
        d0_opt = jax.tree.map(lambda x: np.asarray(x).copy(), ds.opt_state)
        # steps 0 and 1: warmup — depth frozen, NeRF moves
        for i in range(2):
            n_before = jax.tree.map(lambda x: np.asarray(x).copy(), ns.params)
            ns, ds, m = step(ns, ds, (rays, target), jax.random.PRNGKey(i))
            assert not trees_equal(n_before, ns.params)
            assert trees_equal(d0, ds.params), f"depth moved during warmup @{i}"
            assert trees_equal(d0_opt, ds.opt_state), f"depth opt moved @{i}"
            assert np.isfinite(float(m["loss"]))
        # step 2: warmup over — depth starts moving
        ns, ds, m = step(ns, ds, (rays, target), jax.random.PRNGKey(2))
        assert not trees_equal(d0, ds.params)

    def test_trainer_joint_mode(self, tmp_path):
        datadir = generate_example_dataset(
            str(tmp_path / "data"), H=20, W=20, n_train=3, n_val=1, n_test=1
        )
        cfg = TrainerConfig(
            dataset_type="blender", datadir=datadir, basedir=str(tmp_path / "logs"),
            expname="joint", train_mode="joint", half_res=False, testskip=1,
            N_rand=32, N_samples=8, N_importance=8, netdepth=3, netwidth=32,
            netdepth_fine=3, netwidth_fine=32, n_layers=2, layer_width=16,
            i_print=10, i_weights=10, i_testset=10**9, i_video=10**9,
        )
        t = Trainer(cfg)
        psnr = t.train(N_iters=11)
        assert np.isfinite(psnr)
        assert os.path.exists(os.path.join(t.expdir, "000010.npz"))

    def test_trainer_joint_mode_resume(self, tmp_path):
        """Joint-mode resume must restore BOTH nets and BOTH optimizer
        moments from the (non-depth_-prefixed) joint checkpoint; a bug here
        silently re-initialized the depth net on resume."""
        datadir = generate_example_dataset(
            str(tmp_path / "data"), H=20, W=20, n_train=3, n_val=1, n_test=1
        )
        common = dict(
            dataset_type="blender", datadir=datadir, basedir=str(tmp_path / "logs"),
            expname="joint_res", train_mode="joint", half_res=False, testskip=1,
            N_rand=32, N_samples=8, N_importance=8, netdepth=3, netwidth=32,
            netdepth_fine=3, netwidth_fine=32, n_layers=2, layer_width=16,
            i_print=10, i_weights=10, i_testset=10**9, i_video=10**9,
        )
        t1 = Trainer(TrainerConfig(**common))
        t1.train(N_iters=11)
        ckpt = os.path.join(t1.expdir, "000010.npz")
        assert os.path.exists(ckpt)
        # the joint checkpoint carries the depth optimizer moments
        saved = np.load(ckpt)
        assert any(k.startswith("tree:['depth_opt_state']") for k in saved.keys())

        t2 = Trainer(TrainerConfig(**common))  # same expdir -> newest ckpt
        t2.scene = t2.load_data()
        t2.setup_models()
        assert t2.start == 10
        for a, b in zip(
            jax.tree.leaves(t1.params.depth), jax.tree.leaves(t2.params.depth)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(t1.params.fine), jax.tree.leaves(t2.params.fine)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        psnr = t2.train(N_iters=21)
        assert np.isfinite(psnr)
        assert os.path.exists(os.path.join(t2.expdir, "000020.npz"))


class TestKeepBestEarlyStop:
    def test_policy(self, tmp_path, monkeypatch):
        """keep_best snapshots the best-eval checkpoint into best/ and
        early_stop_patience halts training when eval PSNR stops improving
        (mitigation for the documented depth-net long-train drift)."""
        import nerf_sampling_tpu.train.trainer as trainer_mod

        datadir = str(tmp_path / "scene")
        generate_example_dataset(datadir, H=16, W=16, n_train=2, n_val=1, n_test=1)

        psnrs = iter([20.0, 25.0, 24.0, 23.0, 22.0, 21.0, 20.0])

        def fake_render_path(*args, **kwargs):
            import numpy as np

            p = next(psnrs)
            return np.zeros((1, 4, 4, 3)), np.zeros((1, 4, 4)), p

        monkeypatch.setattr(trainer_mod, "render_path", fake_render_path)
        cfg = TrainerConfig(
            dataset_type="blender",
            datadir=datadir,
            basedir=str(tmp_path / "logs"),
            expname="kb",
            train_mode="nerf",
            netdepth=2, netwidth=16, netdepth_fine=2, netwidth_fine=16,
            N_samples=4, N_importance=4, N_rand=8,
            half_res=False, testskip=1, precrop_iters=0,
            i_testset=2, i_weights=10**9, i_video=10**9, i_print=10**9,
            export_torch_ckpt=False,
            keep_best=True, early_stop_patience=2,
        )
        tr = trainer_mod.Trainer(cfg)
        tr.train(N_iters=40)
        # evals at 2 (20.0, best), 4 (25.0, best), 6 (24.0), 8 (23.0) -> stop
        assert tr._stop_early
        assert tr.global_step == 8
        assert abs(tr._best_psnr - 25.0) < 1e-6
        best = os.listdir(os.path.join(tr.expdir, "best"))
        assert "000004.npz" in best  # best snapshot kept


@pytest.mark.slow
class TestLoaderTrainerSmokes:
    """Drive the three non-blender loaders through real Trainer.train e2e
    (5 iters + one mid-train testset render, tiny nets), covering the
    dataset-specific near/far and NDC wiring (load_llff_scene /
    load_linemod_scene / load_deepvoxels_scene mutate cfg.near/far BEFORE
    setup_models builds the pipeline). Parity anchors: reference
    trainers/LLF.py:45-86, Linemod.py:44-63, deepvoxels.py:44-58."""

    _COMMON = dict(
        train_mode="nerf",
        N_rand=32, N_samples=4, N_importance=4,
        netdepth=2, netwidth=16, netdepth_fine=2, netwidth_fine=16,
        precrop_iters=0, i_print=2, i_weights=10**9, i_video=10**9,
        i_testset=4, export_torch_ckpt=False, lrate=5e-3,
    )

    def test_llff_ndc_e2e(self, tmp_path):
        from tests.test_data_loaders import TestLLFF

        root = TestLLFF()._make_llff(str(tmp_path / "llff"))
        cfg = TrainerConfig(
            dataset_type="llff", datadir=root, basedir=str(tmp_path / "logs"),
            expname="llff_smoke", factor=2, llffhold=3, **self._COMMON,
        )
        tr = Trainer(cfg)
        psnr = tr.train(N_iters=6)
        assert np.isfinite(psnr)
        # NDC pipeline: llff without no_ndc reprojects rays, bounds [0, 1]
        assert tr.pipeline.ndc and tr.pipeline.near == 0.0 and tr.pipeline.far == 1.0
        out = os.path.join(tr.expdir, "testset_000004")
        assert os.path.exists(os.path.join(out, "000.png"))

    def test_linemod_e2e(self, tmp_path):
        from tests.test_data_loaders import TestLinemod

        root = TestLinemod()._make(str(tmp_path / "lm"))
        cfg = TrainerConfig(
            dataset_type="LINEMOD", datadir=root, basedir=str(tmp_path / "logs"),
            expname="lm_smoke", half_res=False, testskip=1, white_bkgd=False,
            **self._COMMON,
        )
        tr = Trainer(cfg)
        psnr = tr.train(N_iters=6)
        assert np.isfinite(psnr)
        # near/far from the LINEMOD json, floored/ceiled (load_LINEMOD.py:105-106)
        assert tr.pipeline.near == 1.0 and tr.pipeline.far == 6.0
        assert os.path.exists(
            os.path.join(tr.expdir, "testset_000004", "000.png")
        )

    def test_deepvoxels_e2e(self, tmp_path):
        from tests.test_data_loaders import TestDeepVoxels

        # the loader targets the fixed 512^2 deepvoxels resolution; the
        # sampler indexes images at hwf size, so the fixture must match
        root = TestDeepVoxels()._make(str(tmp_path / "dv"), H=512)
        cfg = TrainerConfig(
            dataset_type="deepvoxels", datadir=root,
            basedir=str(tmp_path / "logs"), expname="dv_smoke",
            shape="greek", testskip=1, **self._COMMON,
        )
        tr = Trainer(cfg)
        psnr = tr.train(N_iters=6)
        assert np.isfinite(psnr)
        # hemisphere-derived near/far (load_deepvoxels.py + deepvoxels.py:44-58)
        assert tr.pipeline.far - tr.pipeline.near == pytest.approx(2.0)
        assert os.path.exists(
            os.path.join(tr.expdir, "testset_000004", "000.png")
        )


class _StubTrial:
    """Trial-shaped object matching the optuna surface _report_trial uses
    (report/should_prune) — lets the HPO pruning path run without optuna."""

    def __init__(self, prune_after: int):
        self.reports = []
        self.prune_after = prune_after

    def report(self, value, step):
        self.reports.append((float(value), int(step)))

    def should_prune(self):
        return len(self.reports) >= self.prune_after


class TestTrialPruning:
    def _cfg(self, tmp_path, **over):
        datadir = str(tmp_path / "scene")
        generate_example_dataset(datadir, H=16, W=16, n_train=2, n_val=1, n_test=1)
        base = dict(
            dataset_type="blender", datadir=datadir,
            basedir=str(tmp_path / "logs"), expname="hpo", train_mode="nerf",
            netdepth=2, netwidth=16, netdepth_fine=2, netwidth_fine=16,
            N_samples=4, N_importance=4, N_rand=8, half_res=False, testskip=1,
            precrop_iters=0, i_print=2, i_weights=10**9, i_testset=10**9,
            i_video=10**9, export_torch_ckpt=False,
        )
        base.update(over)
        return TrainerConfig(**base)

    def test_prunes_mid_train(self, tmp_path):
        """The pruning hook (reference Trainer.py:393-398) reports PSNR at
        the i_print cadence and raises TrialPruned when the trial says so.

        NB: asserts on the exception NAME, not identity — when another
        test has stubbed ``optuna`` into sys.modules (reference-parity
        suite), the hook correctly raises that module's TrialPruned."""
        trial = _StubTrial(prune_after=2)
        tr = Trainer(self._cfg(tmp_path), trial=trial)
        raised = None
        try:
            tr.train(N_iters=11)
        except Exception as e:  # noqa: BLE001 - identity checked below
            raised = e
        assert raised is not None and type(raised).__name__ == "TrialPruned", raised
        # reports landed at steps 2 and 4, then the prune fired
        assert [s for _, s in trial.reports] == [2, 4]
        assert all(np.isfinite(v) for v, _ in trial.reports)

    def test_completes_without_prune(self, tmp_path):
        trial = _StubTrial(prune_after=10**9)
        tr = Trainer(self._cfg(tmp_path, expname="hpo2"), trial=trial)
        psnr = tr.train(N_iters=7)
        assert np.isfinite(psnr)
        assert [s for _, s in trial.reports] == [2, 4, 6]


class TestScanStepsResolution:
    def test_explicit_value_rounded_to_cadence_divisor(self, tmp_path):
        """An explicit steps_per_dispatch that doesn't divide the logging
        cadences would let log() see end-of-chunk state mid-chunk; the
        trainer rounds it down to a divisor of gcd(cadences)."""
        cfg = TrainerConfig(
            dataset_type="blender", datadir="unused", basedir=str(tmp_path),
            expname="x", i_print=10, i_weights=20, i_testset=10, i_video=10,
            steps_per_dispatch=7,
        )
        tr = Trainer(cfg)
        assert tr._resolve_scan_steps(N_iters=1000) == 5  # 7 -> 5 | gcd=10
        cfg2 = TrainerConfig(
            dataset_type="blender", datadir="unused", basedir=str(tmp_path),
            expname="x", i_print=10, i_weights=20, i_testset=10, i_video=10,
            steps_per_dispatch=5,
        )
        assert Trainer(cfg2)._resolve_scan_steps(N_iters=1000) == 5  # kept

    def test_auto_picks_largest_cadence_divisor_up_to_100(
        self, tmp_path, monkeypatch
    ):
        """Auto mode fuses up to 100 steps per dispatch: the sustained
        REAL-Trainer rate measured 155/226/250 it/s at K=25/50/100
        (scripts/bench_sustained.py), so the cap sits where the host-side
        sampling + metrics read are fully hidden behind the device."""
        import nerf_sampling_tpu.train.trainer as tm

        cfg = TrainerConfig(
            dataset_type="blender", datadir="unused", basedir=str(tmp_path),
            expname="x", i_print=100, i_weights=10000, i_testset=20000,
            i_video=100000, steps_per_dispatch=0,
        )
        tr = Trainer(cfg)
        monkeypatch.setattr(tm.jax, "default_backend", lambda: "tpu")
        assert tr._resolve_scan_steps(N_iters=100000) == 100
        # on cpu there is no dispatch latency to amortize: stays per-step
        monkeypatch.setattr(tm.jax, "default_backend", lambda: "cpu")
        assert tr._resolve_scan_steps(N_iters=100000) == 1


class TestHardExampleScene:
    def test_multi_variant(self):
        scene = make_example_scene(
            H=24, W=24, n_train=2, n_val=1, n_test=1, variant="multi"
        )
        import numpy as np

        imgs = scene.images
        assert imgs.shape == (4, 24, 24, 3)
        assert np.isfinite(imgs).all() and imgs.min() >= 0 and imgs.max() <= 1
        # hard variant must actually contain content + high-frequency detail:
        # more texture variance than the single smooth sphere
        easy = make_example_scene(
            H=24, W=24, n_train=2, n_val=1, n_test=1, variant="sphere"
        )
        grad_hard = np.abs(np.diff(imgs, axis=2)).mean()
        grad_easy = np.abs(np.diff(easy.images, axis=2)).mean()
        assert grad_hard > grad_easy

    def test_generate_and_load(self, tmp_path):
        from nerf_sampling_tpu.data.blender import load_blender_data

        d = str(tmp_path / "hard")
        generate_example_dataset(
            d, H=16, W=16, n_train=2, n_val=1, n_test=1, variant="multi"
        )
        scene = load_blender_data(d, half_res=False, testskip=1)
        assert scene.images.shape[0] == 4


class TestDistributedInitOrdering:
    def test_distributed_init_precedes_backend_touch(self, tmp_path, monkeypatch):
        """jax.distributed.initialize must run BEFORE anything that
        initializes the XLA backend: _enable_compilation_cache calls
        jax.default_backend(), and jax raises RuntimeError if the backend
        already exists when initialize() is called. Regression for the
        --multihost CLI path (the cluster smoke worker pre-initializes in
        its own main(), which masked the Trainer-internal ordering)."""
        import nerf_sampling_tpu.parallel as par
        import nerf_sampling_tpu.train.trainer as trainer_mod

        calls = []
        monkeypatch.setattr(
            par, "maybe_initialize_distributed",
            lambda cfg: calls.append("distributed_init"),
        )
        monkeypatch.setattr(
            trainer_mod, "_enable_compilation_cache",
            lambda: calls.append("cache_enable"),
        )
        datadir = generate_example_dataset(
            str(tmp_path / "data"), H=16, W=16, n_train=2, n_val=1, n_test=1
        )
        cfg = TrainerConfig(
            expname="order",
            train_mode="nerf",
            dataset_type="blender",
            datadir=datadir,
            basedir=str(tmp_path / "logs"),
            half_res=False,
            testskip=1,
            N_rand=16,
            N_samples=4,
            N_importance=0,
            netdepth=2,
            netwidth=8,
            i_print=1000,
            i_weights=1000,
            i_testset=100000,
            i_video=10_000_000,
        )
        from nerf_sampling_tpu.train.trainer import Trainer

        Trainer(cfg).train(N_iters=2)
        assert calls.index("distributed_init") < calls.index("cache_enable"), calls
