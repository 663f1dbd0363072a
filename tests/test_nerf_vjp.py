"""Custom-VJP fused MLP gradients vs jax.grad of the XLA path (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_sampling_tpu.core.encoding import positional_encoding
from nerf_sampling_tpu.kernels.fused_nerf_vjp import fused_nerf_train_apply
from nerf_sampling_tpu.models import NeRFConfig, nerf_apply, nerf_init


def xla_apply(params, cfg, pts, viewdirs, multires=10, multires_views=4):
    emb = jnp.concatenate(
        [
            positional_encoding(pts, multires),
            jnp.broadcast_to(
                positional_encoding(viewdirs, multires_views)[:, None, :],
                (*pts.shape[:-1], 3 * (1 + 2 * multires_views)),
            ),
        ],
        -1,
    )
    return nerf_apply(params, cfg, emb)


def make_inputs(rng, n=96, s=2):
    pts = jnp.asarray(rng.uniform(-1.5, 1.5, (n, s, 3)).astype(np.float32))
    vd = rng.standard_normal((n, 3)).astype(np.float32)
    vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
    return pts, jnp.asarray(vd)


@pytest.mark.parametrize(
    "cfg",
    [
        NeRFConfig(D=2, W=32, input_ch=63, input_ch_views=27, output_ch=5,
                   skips=(), use_viewdirs=True),
        NeRFConfig(D=8, W=32, input_ch=63, input_ch_views=27, output_ch=5,
                   skips=(4,), use_viewdirs=True),
    ],
    ids=["noskip", "skip4"],
)
def test_param_and_input_grads_match_xla(cfg, rng):
    params = nerf_init(jax.random.PRNGKey(0), cfg)
    pts, vd = make_inputs(rng)
    # random cotangent via a scalar loss over all outputs
    wmat = jnp.asarray(rng.standard_normal((96, 2, 4)).astype(np.float32))

    def loss_pallas(params, pts):
        raw = fused_nerf_train_apply(
            params, cfg, pts, vd[:, None, :], dtype=jnp.float32, interpret=True
        )
        return jnp.sum(raw * wmat)

    def loss_xla(params, pts):
        return jnp.sum(xla_apply(params, cfg, pts, vd) * wmat)

    (gp_p, gx_p) = jax.grad(loss_pallas, argnums=(0, 1))(params, pts)
    (gp_x, gx_x) = jax.grad(loss_xla, argnums=(0, 1))(params, pts)

    flat_p, tree_p = jax.tree.flatten(gp_p)
    flat_x, tree_x = jax.tree.flatten(gp_x)
    assert tree_p == tree_x
    for a, b in zip(flat_p, flat_x):
        scale = max(float(jnp.abs(b).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-3 * scale
        )
    scale = max(float(jnp.abs(gx_x).max()), 1e-3)
    np.testing.assert_allclose(
        np.asarray(gx_p), np.asarray(gx_x), rtol=0, atol=2e-3 * scale
    )


def test_forward_matches_inference_kernel(rng):
    from nerf_sampling_tpu.kernels import fused_nerf_apply

    cfg = NeRFConfig(D=2, W=32, input_ch=63, input_ch_views=27, output_ch=5,
                     skips=(), use_viewdirs=True)
    params = nerf_init(jax.random.PRNGKey(1), cfg)
    pts, vd = make_inputs(rng, n=64)
    a = fused_nerf_train_apply(
        params, cfg, pts, vd[:, None, :], dtype=jnp.float32, interpret=True
    )
    b = fused_nerf_apply(
        params, cfg, pts, vd[:, None, :], dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_input_grads_false_matches_param_grads(rng):
    """input_grads=False must return IDENTICAL param grads (it only drops
    the dL/dx chain) and zero input cotangents."""
    cfg = NeRFConfig(D=8, W=32, input_ch=63, input_ch_views=27, output_ch=5,
                     skips=(4,), use_viewdirs=True)
    params = nerf_init(jax.random.PRNGKey(0), cfg)
    pts, vd = make_inputs(rng)
    wmat = jnp.asarray(rng.standard_normal((96, 2, 4)).astype(np.float32))

    def loss(params, pts, ig):
        raw = fused_nerf_train_apply(
            params, cfg, pts, vd[:, None, :], dtype=jnp.float32,
            interpret=True, input_grads=ig,
        )
        return jnp.sum(raw * wmat)

    gp_t, gx_t = jax.grad(loss, argnums=(0, 1))(params, pts, True)
    gp_f, gx_f = jax.grad(loss, argnums=(0, 1))(params, pts, False)
    for a, b in zip(jax.tree.leaves(gp_t), jax.tree.leaves(gp_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.abs(gx_t).max()) > 0  # the true dx is nonzero here
    np.testing.assert_array_equal(np.asarray(gx_f), 0.0)
