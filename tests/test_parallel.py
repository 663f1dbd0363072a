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


class TestScanMeshComposition:
    """make_multi_step(mesh=...) — scan-fused dispatch composed with GSPMD.

    The scanned+sharded program must reproduce the per-step sharded loop
    exactly (same fold_in key stream, same psum'd grads), closing the r2
    gap where the scan forced n_scan=1 under a mesh."""

    def _stack(self, K, N, seed):
        rng = np.random.default_rng(seed)
        stack = np.zeros((K, N, 9), np.float32)
        stack[..., 2] = 4.0
        stack[..., 3:6] = rng.uniform(-0.2, 0.2, (K, N, 3))
        stack[..., 5] = -1.0
        stack[..., 6:9] = rng.uniform(0, 1, (K, N, 3))
        return stack

    def test_nerf_scan_matches_per_step_sharded(self, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from nerf_sampling_tpu.train.steps import make_multi_step

        p = tiny_pipeline()
        params = bundle(p)._replace(depth=None)
        opt = make_nerf_optimizer(1e-3, 250)
        K, N = 3, 64
        stack = self._stack(K, N, 0)
        base_key = jax.random.PRNGKey(11)
        copy = lambda t: jax.tree.map(lambda x: jnp.array(x, copy=True), t)

        # per-step sharded loop (the r2 production mesh path)
        dp_step = make_sharded_nerf_train_step(p, opt, mesh)
        s1 = init_state(copy(params), opt)
        seq_losses = []
        rs = NamedSharding(mesh, P("rays"))
        for j in range(K):
            s1, m = dp_step(
                s1, jax.device_put(stack[j], rs),
                jax.random.fold_in(base_key, 1 + j),
            )
            seq_losses.append(float(m["loss"]))

        # scanned + sharded: one dispatch, batch stack sharded on dim 1
        step = make_nerf_train_step(p, opt)
        multi = make_multi_step(step, n_states=1, mesh=mesh)
        s2, ms = multi(init_state(copy(params), opt), stack, base_key, 1)
        assert jax.tree.leaves(s2.params)[0].sharding.is_fully_replicated
        np.testing.assert_allclose(
            np.asarray(ms["loss"]), np.asarray(seq_losses), rtol=1e-6, atol=0
        )
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )

    def test_depth_scan_with_const_under_mesh(self, mesh):
        """with_const (frozen NeRF as replicated loop-invariant arg) +
        mesh: matches the per-step sharded depth loop."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from nerf_sampling_tpu.train.steps import (
            make_depth_net_train_step,
            make_multi_step,
        )

        p = tiny_pipeline()
        b = bundle(p)
        nerf_only = b._replace(depth=None)
        opt = make_depth_optimizer(1e-3)
        K, N = 3, 64
        stack = self._stack(K, N, 1)
        base_key = jax.random.PRNGKey(5)
        copy = lambda t: jax.tree.map(lambda x: jnp.array(x, copy=True), t)
        rs = NamedSharding(mesh, P("rays"))
        rep = NamedSharding(mesh, P())

        dp_step = make_sharded_depth_train_step(p, opt, mesh)
        s1 = init_state(copy(b.depth), opt)
        frozen = jax.device_put(nerf_only, rep)
        seq_losses = []
        for j in range(K):
            s1, m = dp_step(
                frozen, s1, jax.device_put(stack[j], rs),
                jax.random.fold_in(base_key, 1 + j),
            )
            seq_losses.append(float(m["loss"]))

        arg_step = make_depth_net_train_step(p, opt)
        multi = make_multi_step(arg_step, n_states=1, with_const=True, mesh=mesh)
        s2, ms = multi(frozen, init_state(copy(b.depth), opt), stack, base_key, 1)
        np.testing.assert_allclose(
            np.asarray(ms["loss"]), np.asarray(seq_losses), rtol=1e-6, atol=0
        )
        for a, c in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-7
            )


    def test_joint_scan_under_mesh(self, mesh):
        """n_states=2 (joint mode) scanned under the mesh: runs, advances
        both states, metrics finite and stacked [K]."""
        from nerf_sampling_tpu.train.steps import (
            make_joint_train_step,
            make_multi_step,
        )

        p = tiny_pipeline()
        b = bundle(p)
        nopt = make_nerf_optimizer(5e-4, 250)
        dopt = make_depth_optimizer(1e-4)
        ns = init_state(b._replace(depth=None), nopt)
        ds = init_state(b.depth, dopt)
        stack = self._stack(2, 64, 2)
        multi = make_multi_step(make_joint_train_step(p, nopt, dopt),
                                n_states=2, mesh=mesh)
        ns2, ds2, ms = multi(ns, ds, stack, jax.random.PRNGKey(0), 1)
        assert int(ns2.step) == 2 and int(ds2.step) == 2
        assert np.all(np.isfinite(np.asarray(ms["loss"])))
        assert jax.tree.leaves(ns2.params)[0].sharding.is_fully_replicated


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


class TestHybridMesh:
    """make_hybrid_mesh — 2-D [dcn, rays] mesh for DCN-connected pods.

    Single-process stand-in: ``groups=2`` splits the 8 virtual CPU devices
    into a [2, 4] mesh (two fake "hosts" of four chips). Every sharded entry
    point is axis-name generic via ray_sharding, so the hybrid shape must
    reproduce the single-device math exactly — these tests pin that."""

    @pytest.fixture(scope="class")
    def hmesh(self):
        from nerf_sampling_tpu.parallel import make_hybrid_mesh

        assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
        return make_hybrid_mesh(jax.devices()[:8], groups=2)

    def test_shape_and_ray_spec(self, hmesh):
        from nerf_sampling_tpu.parallel import ray_sharding

        assert hmesh.axis_names == ("dcn", "rays")
        assert dict(hmesh.shape) == {"dcn": 2, "rays": 4}
        # leading dim shards over BOTH axes, DCN-major
        assert tuple(ray_sharding(hmesh).spec[0]) == ("dcn", "rays")

    def test_groups_must_divide(self):
        from nerf_sampling_tpu.parallel import make_hybrid_mesh

        with pytest.raises(ValueError, match="divisible"):
            make_hybrid_mesh(jax.devices()[:8], groups=3)

    def test_single_process_defaults_to_one_row(self):
        from nerf_sampling_tpu.parallel import make_hybrid_mesh

        m = make_hybrid_mesh(jax.devices()[:8])
        assert dict(m.shape) == {"dcn": 1, "rays": 8}

    def test_eval_matches_unsharded(self, hmesh):
        p = tiny_pipeline()
        params = bundle(p)
        rays = rays_for(p, 64)
        key = jax.random.PRNGKey(0)
        want = render_rays_eval(p, params, rays, key, EvalMode.FULL_NERF)
        sharded = make_sharded_eval(p, hmesh, EvalMode.FULL_NERF)
        got = sharded(params, shard_ray_batch(hmesh, rays), key)
        np.testing.assert_allclose(
            np.asarray(got["depth_net_rgb_map"]),
            np.asarray(want["depth_net_rgb_map"]),
            atol=5e-4,
        )

    def test_nerf_grads_match_unsharded(self, hmesh):
        """The hierarchical (2-axis) gradient all-reduce must reproduce the
        single-device step — same psum sum, just decomposed per mesh row."""
        p = tiny_pipeline()
        params = bundle(p)._replace(depth=None)
        opt = make_nerf_optimizer(1e-3, 250)
        rays = rays_for(p, 64)
        target = jnp.full((64, 3), 0.25)
        key = jax.random.PRNGKey(3)

        copy = lambda t: jax.tree.map(lambda x: jnp.array(x, copy=True), t)
        s1 = init_state(copy(params), opt)
        ref_step = make_nerf_train_step(p, opt)
        s1, m1 = ref_step(s1, (rays, target), key)

        s2 = init_state(copy(params), opt)
        dp_step = make_sharded_nerf_train_step(p, opt, hmesh)
        s2, m2 = dp_step(s2, shard_ray_batch(hmesh, (rays, target)), key)

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

    def test_render_image_matches_single_device(self, hmesh):
        from nerf_sampling_tpu.parallel.render import render_image_sharded
        from nerf_sampling_tpu.render import render_image

        p = tiny_pipeline()
        params = bundle(p)
        H, W, focal = 8, 8, 10.0
        K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1.0]], np.float32)
        c2w = np.array([[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.0]], np.float32)
        key = jax.random.PRNGKey(0)
        a = render_image(p, params, H, W, K, c2w, key, EvalMode.FULL_NERF)
        b = render_image_sharded(
            p, params, H, W, K, c2w, key, hmesh, mode=EvalMode.FULL_NERF
        )
        assert b["depth_net_rgb_map"].shape == (H, W, 3)
        np.testing.assert_allclose(
            np.asarray(a["depth_net_rgb_map"]),
            np.asarray(b["depth_net_rgb_map"]),
            rtol=2e-5, atol=2e-5,
        )

    def test_scan_matches_per_step_hybrid(self, hmesh):
        """make_multi_step(mesh=hybrid): the scanned [K, N, 9] stack shards
        dim 1 over both axes and matches the per-step hybrid-sharded loop."""
        from nerf_sampling_tpu.parallel import ray_sharding
        from nerf_sampling_tpu.train.steps import make_multi_step

        p = tiny_pipeline()
        params = bundle(p)._replace(depth=None)
        opt = make_nerf_optimizer(1e-3, 250)
        K, N = 2, 64
        rng = np.random.default_rng(7)
        stack = np.zeros((K, N, 9), np.float32)
        stack[..., 2] = 4.0
        stack[..., 3:6] = rng.uniform(-0.2, 0.2, (K, N, 3))
        stack[..., 5] = -1.0
        stack[..., 6:9] = rng.uniform(0, 1, (K, N, 3))
        base_key = jax.random.PRNGKey(11)
        copy = lambda t: jax.tree.map(lambda x: jnp.array(x, copy=True), t)

        dp_step = make_sharded_nerf_train_step(p, opt, hmesh)
        s1 = init_state(copy(params), opt)
        seq_losses = []
        rs = ray_sharding(hmesh)
        for j in range(K):
            s1, m = dp_step(
                s1, jax.device_put(stack[j], rs),
                jax.random.fold_in(base_key, 1 + j),
            )
            seq_losses.append(float(m["loss"]))

        step = make_nerf_train_step(p, opt)
        multi = make_multi_step(step, n_states=1, mesh=hmesh)
        s2, ms = multi(init_state(copy(params), opt), stack, base_key, 1)
        assert jax.tree.leaves(s2.params)[0].sharding.is_fully_replicated
        np.testing.assert_allclose(
            np.asarray(ms["loss"]), np.asarray(seq_losses), rtol=1e-6, atol=0
        )
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )
