"""Keras weight import + depth-net scale helper tests."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sampling_tpu.core.sampling import scale_points_with_weights, scale_to_near_far
from nerf_sampling_tpu.models import NeRFConfig, nerf_apply
from nerf_sampling_tpu.train.checkpoint import nerf_params_from_keras


def test_keras_import_roundtrip(rng):
    """Keras Dense kernels are [in, out]; order per run_nerf_helpers.py:136-183."""
    D, W, Cp, Cv = 8, 32, 63, 27
    weights = []
    for i in range(D):
        in_dim = Cp if i == 0 else (W + Cp if i == 5 else W)
        weights += [rng.standard_normal((in_dim, W)).astype(np.float32),
                    rng.standard_normal((W,)).astype(np.float32)]
    weights += [rng.standard_normal((W, W)).astype(np.float32),
                rng.standard_normal((W,)).astype(np.float32)]  # feature
    weights += [rng.standard_normal((Cv + W, W // 2)).astype(np.float32),
                rng.standard_normal((W // 2,)).astype(np.float32)]  # views
    weights += [rng.standard_normal((W // 2, 3)).astype(np.float32),
                rng.standard_normal((3,)).astype(np.float32)]  # rgb
    weights += [rng.standard_normal((W, 1)).astype(np.float32),
                rng.standard_normal((1,)).astype(np.float32)]  # alpha

    params = nerf_params_from_keras(weights, D=D)
    cfg = NeRFConfig(D=D, W=W, input_ch=Cp, input_ch_views=Cv,
                     skips=(4,), use_viewdirs=True)
    x = jnp.asarray(rng.standard_normal((5, Cp + Cv)).astype(np.float32))
    out = nerf_apply(params, cfg, x)
    assert out.shape == (5, 4)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(
        np.asarray(params["pts_linears"][0]["weight"]), weights[0]
    )


def test_scale_to_near_far(rng):
    """reference depth_nets/utils.py:14-19 semantics."""
    ro = jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32))
    rd = jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32))
    outputs = jnp.asarray(rng.uniform(0, 1, (4, 6)).astype(np.float32))
    pts, z = scale_to_near_far(outputs, ro, rd, 2.0, 6.0)
    assert z.shape == (4, 6) and pts.shape == (4, 6, 3)
    assert bool(jnp.all(z >= 2.0)) and bool(jnp.all(z <= 6.0))
    assert bool(jnp.all(z[:, 1:] >= z[:, :-1]))  # sorted
    np.testing.assert_allclose(
        np.asarray(pts),
        np.asarray(scale_points_with_weights(z, ro, rd)),
    )


def test_adam_export_rejects_non_viewdirs_order():
    """The torch NeRF registers views_linears unconditionally
    (run_nerf_helpers.py:96), so positional Adam-moment keying is undefined
    for a use_viewdirs=False tree; the order helper must refuse rather than
    silently misalign output_linear's moments."""
    import pytest as _pytest

    from nerf_sampling_tpu.train.checkpoint import _nerf_param_order

    with _pytest.raises(ValueError, match="use_viewdirs"):
        _nerf_param_order({"pts_linears": [None, None], "output_linear": None})
