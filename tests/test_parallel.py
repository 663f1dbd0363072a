"""GSPMD sharding tests on the 8-virtual-device CPU mesh (see conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_sampling_tpu.models import (
    DepthNetConfig,
    NeRFConfig,
    depth_net_init,
    nerf_init,
)
from nerf_sampling_tpu.parallel import (
    make_mesh,
    make_sharded_depth_train_step,
    make_sharded_eval,
    make_sharded_nerf_train_step,
    shard_ray_batch,
)
from nerf_sampling_tpu.render import (
    EvalMode,
    NeRFParams,
    Pipeline,
    make_ray_batch,
    render_rays_eval,
)
from nerf_sampling_tpu.train.state import init_state, make_depth_optimizer, make_nerf_optimizer
from nerf_sampling_tpu.train.steps import make_nerf_train_step


def tiny_pipeline():
    nerf_cfg = NeRFConfig(
        D=3, W=32, input_ch=63, input_ch_views=27, output_ch=5,
        skips=(1,), use_viewdirs=True,
    )
    return Pipeline(
        nerf=nerf_cfg, fine=nerf_cfg,
        depth=DepthNetConfig(hidden_sizes=(16, 16), cat_hidden_sizes=(16, 16)),
        N_samples=8, N_importance=8,
    )


def bundle(p):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return NeRFParams(
        coarse=nerf_init(ks[0], p.nerf),
        fine=nerf_init(ks[1], p.fine),
        depth=depth_net_init(ks[2], p.depth),
    )


def rays_for(p, n):
    ro = jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (n, 1))
    t = jnp.linspace(-0.2, 0.2, n)
    rd = jnp.stack([t, -t, -jnp.ones_like(t)], -1)
    return make_ray_batch(p, ro, rd)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(jax.devices()[:8])


class TestShardedEval:
    def test_matches_unsharded(self, mesh):
        p = tiny_pipeline()
        params = bundle(p)
        rays = rays_for(p, 64)
        key = jax.random.PRNGKey(0)
        want = render_rays_eval(p, params, rays, key, EvalMode.FULL_NERF)
        sharded = make_sharded_eval(p, mesh, EvalMode.FULL_NERF)
        got = sharded(params, shard_ray_batch(mesh, rays), key)
        # atol note: partitioning changes XLA fusion; a 1-ulp cdf difference
        # can flip a searchsorted bin in sample_pdf (see TestRenderImage).
        np.testing.assert_allclose(
            np.asarray(got["depth_net_rgb_map"]),
            np.asarray(want["depth_net_rgb_map"]),
            atol=5e-4,
        )
        # outputs keep the ray sharding
        assert got["depth_net_rgb_map"].sharding.spec[0] == "rays"


class TestShardedTrain:
    def test_depth_step_runs_and_replicates(self, mesh):
        p = tiny_pipeline()
        params = bundle(p)
        opt = make_depth_optimizer(1e-3)
        state = init_state(params.depth, opt)
        step = make_sharded_depth_train_step(p, opt, mesh)
        rays = shard_ray_batch(mesh, rays_for(p, 64))
        target = jax.device_put(
            jnp.full((64, 3), 0.5),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("rays")),
        )
        new_state, metrics = step(params, state, (rays, target), jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        leaf = jax.tree.leaves(new_state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_nerf_grads_match_unsharded(self, mesh):
        """DP gradient all-reduce must reproduce the single-device step."""
        p = tiny_pipeline()
        params = bundle(p)._replace(depth=None)
        opt = make_nerf_optimizer(1e-3, 250)
        rays = rays_for(p, 64)
        target = jnp.full((64, 3), 0.25)
        key = jax.random.PRNGKey(3)

        # fresh copies: the steps donate their input state buffers
        copy = lambda t: jax.tree.map(lambda x: jnp.array(x, copy=True), t)
        s1 = init_state(copy(params), opt)
        ref_step = make_nerf_train_step(p, opt)
        s1, m1 = ref_step(s1, (rays, target), key)

        s2 = init_state(copy(params), opt)
        dp_step = make_sharded_nerf_train_step(p, opt, mesh)
        s2, m2 = dp_step(s2, shard_ray_batch(mesh, (rays, target)), key)

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )


class TestShardedRenderImage:
    def test_matches_single_device(self):
        """render_image_sharded (shard_map over the 8-device CPU mesh) must
        equal the single-device render_image bit-for-eps."""
        import numpy as np

        from nerf_sampling_tpu.parallel.render import render_image_sharded
        from nerf_sampling_tpu.render import render_image

        p = tiny_pipeline()
        params = bundle(p)
        mesh = make_mesh()
        H, W, focal = 8, 8, 10.0
        K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1.0]], np.float32)
        c2w = np.array(
            [[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.0]], np.float32
        )
        key = jax.random.PRNGKey(0)
        a = render_image(p, params, H, W, K, c2w, key, EvalMode.FULL_NERF)
        b = render_image_sharded(
            p, params, H, W, K, c2w, key, mesh, mode=EvalMode.FULL_NERF
        )
        assert b["depth_net_rgb_map"].shape == (H, W, 3)
        # deterministic FULL_NERF eval: identical math, per-shard keys unused
        np.testing.assert_allclose(
            np.asarray(a["depth_net_rgb_map"]),
            np.asarray(b["depth_net_rgb_map"]),
            rtol=2e-5, atol=2e-5,
        )

    def test_ragged_ray_count(self):
        """H*W not divisible by the mesh size exercises the pad/unpad path."""
        import numpy as np

        from nerf_sampling_tpu.parallel.render import render_image_sharded

        p = tiny_pipeline()
        params = bundle(p)
        mesh = make_mesh()
        H, W, focal = 5, 7, 10.0  # 35 rays over 8 devices
        K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1.0]], np.float32)
        c2w = np.array(
            [[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.0]], np.float32
        )
        out = render_image_sharded(
            p, params, H, W, K, c2w, jax.random.PRNGKey(1), mesh,
            mode=EvalMode.DEPTH_NET,
        )
        rgb = np.asarray(out["depth_net_rgb_map"])
        assert rgb.shape == (H, W, 3) and np.isfinite(rgb).all()


class TestShardedTrainerSteps:
    def test_joint_step_sharded(self):
        import numpy as np

        from nerf_sampling_tpu.parallel import (
            make_sharded_joint_train_step,
            ray_sharding,
        )
        from nerf_sampling_tpu.train.state import (
            init_state, make_depth_optimizer, make_nerf_optimizer,
        )

        p = tiny_pipeline()
        params = bundle(p)
        mesh = make_mesh()
        nopt = make_nerf_optimizer(5e-4, 250)
        dopt = make_depth_optimizer(1e-4)
        nstate = init_state(params._replace(depth=None), nopt)
        dstate = init_state(params.depth, dopt)
        step = make_sharded_joint_train_step(p, nopt, dopt, mesh)
        n = 16
        batch = np.concatenate(
            [
                np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (n, 1)),
                np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (n, 1)),
                np.full((n, 3), 0.5, np.float32),
            ],
            -1,
        )
        batch = jax.device_put(batch, ray_sharding(mesh))
        nstate, dstate, metrics = step(nstate, dstate, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert int(nstate.step) == 1 and int(dstate.step) == 1
