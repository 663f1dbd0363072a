"""Depth-net training with the Pallas hierarchical pass (interpret on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sampling_tpu.models import depth_net_init, nerf_init
from nerf_sampling_tpu.render import NeRFParams, make_ray_batch
from nerf_sampling_tpu.train import make_depth_net_train_step
from nerf_sampling_tpu.train.state import init_state, make_depth_optimizer

from test_render_engine import tiny_pipeline, tiny_params, sphere_hitting_rays


def test_depth_step_with_pallas_hier_matches_xla_direction():
    """The pallas hierarchical pass only changes the (stop-gradient) depth
    target by bf16 noise; the step must run, update params, and produce a
    depth target close to the xla path's."""
    p_xla = tiny_pipeline()
    p_pal = dataclasses.replace(p_xla, mlp_impl="pallas")
    params = tiny_params(p_xla)
    rays = sphere_hitting_rays(p_xla, 16)
    target = jnp.full((16, 3), 0.5)
    key = jax.random.PRNGKey(0)

    results = {}
    for name, p in (("xla", p_xla), ("pallas", p_pal)):
        opt = make_depth_optimizer(1e-3)
        st = init_state(jax.tree.map(lambda x: jnp.array(x, copy=True), params.depth), opt)
        step = make_depth_net_train_step(p, opt)
        st, m = step(params, st, (rays, target), key)
        assert np.isfinite(float(m["loss"])), name
        assert np.isfinite(float(m["depth_net_loss"])), name
        results[name] = (st.params, {k: float(v) for k, v in m.items()})

    # depth_net_loss = mse(depth_z, max_z): identical depth_z (xla depthnet
    # both times), max_z differs only by kernel-dtype noise in the target.
    a, b = results["xla"][1], results["pallas"][1]
    assert abs(a["depth_net_loss"] - b["depth_net_loss"]) < 0.05 * (
        abs(a["depth_net_loss"]) + 0.01
    ), (a, b)


def test_hier_oracle_eligibility():
    """The fused stochastic oracle is TPU-only and config-gated."""
    from nerf_sampling_tpu.train.steps import _can_use_hier_oracle

    p = tiny_pipeline()
    # cpu backend in tests -> never eligible (no PRNG lowering)
    assert not _can_use_hier_oracle(dataclasses.replace(p, mlp_impl="pallas"))
    assert not _can_use_hier_oracle(dataclasses.replace(p, mlp_impl="xla"))
