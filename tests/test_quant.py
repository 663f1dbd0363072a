"""W8A8 int8 fused-kernel path vs the fp32 composable pipeline.

The int8 kernels approximate the same reference compute as the bf16 ones
(run_nerf_helpers.py:109-134 via the fused kernels); on-chip the
acceptance gate is the measured PSNR delta on trained fields (RESULTS.md
round 4). These CPU interpret tests pin the machinery: the requant
integer math, calibration-scale chain, pack/unpack layout, and that the
end-to-end int8 render stays close to fp32 on a non-vacuous field.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_sampling_tpu.kernels.fused_hier import fused_render_hier
from nerf_sampling_tpu.kernels.fused_render import (
    fused_render,
    fused_render_around_depth,
    fused_shade,
)
from nerf_sampling_tpu.kernels.quant import (
    QuantCalib,
    _decompose,
    calibrate_nerf_quant,
    flatten_qpacked,
    qpack_nerf_params,
)
from nerf_sampling_tpu.models import NeRFConfig, nerf_init_active

from tests.test_fused_render import make_rays, reference_render

CFG = NeRFConfig(
    D=8, W=256, input_ch=63, input_ch_views=27, output_ch=5,
    skips=(4,), use_viewdirs=True,
)


def _requant_host(a, step):
    _, p, q, m = step
    if p > 0:
        a = (a + (1 << (p - 1))) >> p
    a = a * m
    if q > 0:
        a = (a + (1 << (q - 1))) >> q
    return a


class TestDecompose:
    def test_requant_tracks_division(self):
        # across the accumulator magnitudes the calibration can produce,
        # the (p, q, m) integer requant is within one LSB of a / S
        for S in (0.51, 3.7, 127.0, 5e3, 3.3e6):
            p, q, m = _decompose(S)
            step = ("int", p, q, m)
            a = np.linspace(0, 127 * S, 257).astype(np.int64)
            got = _requant_host(a, step)
            want = a / S
            assert np.abs(got - want).max() <= 1.0, (S, p, q, m)
            # int32 safety: the pre-shifted operand times m fits
            t_max = (a.max() + (1 << max(p - 1, 0))) >> p if p else a.max()
            assert t_max * m + (1 << max(q - 1, 0)) < 2**31, (S, p, q, m)


class TestQuantRender:
    def _setup(self, rng, seed=0):
        params = nerf_init_active(jax.random.PRNGKey(seed), CFG)
        ro, rd = make_rays(200, rng)
        calib = calibrate_nerf_quant(
            params, CFG, ro, rd, near=2.0, far=6.0, n_rays=64, n_z=9
        )
        return params, ro, rd, calib

    def test_calib_is_static_hashable(self, rng):
        params, ro, rd, calib = self._setup(rng)
        assert isinstance(calib, QuantCalib)
        hash(calib)  # jit static arg requirement
        assert len(calib.steps) == CFG.D - 1
        kinds = [s[0] for s in calib.steps]
        assert kinds.count("skip") == len(CFG.skips)

    def test_qpack_layout_roundtrip(self, rng):
        from nerf_sampling_tpu.kernels.quant import unpack_qwrefs

        params, ro, rd, calib = self._setup(rng)
        qp = qpack_nerf_params(params, CFG, calib)
        flat = flatten_qpacked(qp)
        d = unpack_qwrefs(CFG, flat, calib)
        assert d["trunk_wq"][1].dtype == jnp.int8
        assert d["feature_wq"].dtype == jnp.int8
        assert d["views_wq"].dtype == jnp.int8
        assert d["trunk_row"][1].dtype == jnp.int32  # non-skip: bias row
        assert d["trunk_row"][5].dtype == jnp.float32  # skip: dequant row
        # every flat entry consumed exactly once
        consumed = [d["w0x"], d["w0s"], d["b0"]]
        consumed += [x for x in d["trunk_wq"] if x is not None]
        consumed += [x for x in d["trunk_row"] if x is not None]
        for i in sorted(d["skip"]):
            consumed += list(d["skip"][i])
        consumed += [
            d["views_wx"], d["views_ws"], d["views_wq"], d["views_sw"],
            d["views_b"], d["feature_wq"], d["feature_bz"],
            d["head_rgb4"], d["head_alpha4"], d["head_b4"],
        ]
        assert len(consumed) == len(flat)

    def test_int8_render_close_to_f32(self, rng):
        params, ro, rd, calib = self._setup(rng)
        got = fused_render(
            params, CFG, ro, rd, n_samples=16, interpret=True, quant=calib
        )
        want = reference_render(params, CFG, ro, rd, 16, 2.0, 6.0, True)
        rgb_err = np.abs(np.asarray(got["rgb_map"]) - np.asarray(want.rgb_map))
        acc_err = np.abs(np.asarray(got["acc_map"]) - np.asarray(want.acc_map))
        assert np.isfinite(np.asarray(got["rgb_map"])).all()
        assert float(rgb_err.mean()) < 0.03, float(rgb_err.mean())
        assert float(acc_err.mean()) < 0.03, float(acc_err.mean())
        # non-vacuous: the field must have structure for this to mean much
        assert float(np.asarray(want.acc_map).mean()) > 0.2

    def test_int8_vs_bf16_populate_and_shade(self, rng):
        params, ro, rd, calib = self._setup(rng, seed=3)
        depth = jnp.full((ro.shape[0],), 4.0)
        for fn, kwargs in (
            (fused_render_around_depth, dict(depth=depth, n_samples=8,
                                             std=0.4)),
            (fused_shade, dict(z_vals=jnp.broadcast_to(
                jnp.linspace(2.5, 5.5, 12), (ro.shape[0], 12)))),
        ):
            got_q = fn(params, CFG, ro, rd, interpret=True, quant=calib,
                       **kwargs)
            got_b = fn(params, CFG, ro, rd, interpret=True, **kwargs)
            err = np.abs(
                np.asarray(got_q["rgb_map"]) - np.asarray(got_b["rgb_map"])
            )
            assert np.isfinite(np.asarray(got_q["rgb_map"])).all()
            assert float(err.mean()) < 0.03, (fn.__name__, float(err.mean()))

    def test_int8_hier_close_to_bf16(self, rng):
        params, ro, rd, calib = self._setup(rng, seed=5)
        got_q = fused_render_hier(
            params, CFG, None, None, ro, rd, n_coarse=12, n_importance=8,
            interpret=True, quant=calib,
        )
        got_b = fused_render_hier(
            params, CFG, None, None, ro, rd, n_coarse=12, n_importance=8,
            interpret=True,
        )
        for k in ("rgb_map", "acc_map"):
            err = np.abs(np.asarray(got_q[k]) - np.asarray(got_b[k]))
            assert np.isfinite(np.asarray(got_q[k])).all()
            assert float(err.mean()) < 0.04, (k, float(err.mean()))
        # the depth-supervision target: max_z should track within the
        # coarse grid spacing for most rays
        dz = np.abs(np.asarray(got_q["max_z"]) - np.asarray(got_b["max_z"]))
        assert float(np.median(dz)) < (6.0 - 2.0) / 12, float(np.median(dz))


class TestEngineInt8:
    def _setup(self):
        import dataclasses

        from nerf_sampling_tpu.render import EvalMode, render_flat_rays
        from nerf_sampling_tpu.render.quantize import calibrate_pipeline

        from tests.test_render_engine import (
            sphere_hitting_rays,
            tiny_params,
            tiny_pipeline,
        )

        pipe_bf = tiny_pipeline(mlp_impl="pallas")
        params = tiny_params(pipe_bf)
        rays = sphere_hitting_rays(pipe_bf, n=40)
        ro, rd = rays.rays_o, rays.rays_d

        class _Scene:  # minimal SceneData surface for calibrate_pipeline
            hwf = (8, 8, 10.0)
            K = None
            i_train = np.array([0])
            poses = np.broadcast_to(np.eye(4, dtype=np.float32), (1, 4, 4))

        pipe_q = calibrate_pipeline(
            dataclasses.replace(pipe_bf, mlp_impl="pallas_int8"),
            params,
            _Scene(),
        )
        assert pipe_q.quant_calib is not None
        return pipe_bf, pipe_q, params, ro, rd, render_flat_rays, EvalMode

    def test_eval_modes_match_bf16(self):
        pipe_bf, pipe_q, params, ro, rd, render_flat_rays, EvalMode = (
            self._setup()
        )
        key = jax.random.PRNGKey(0)
        for mode in (EvalMode.DEPTH_NET, EvalMode.FULL_NERF):
            out_q = render_flat_rays(pipe_q, params, ro, rd, key, mode=mode)
            out_b = render_flat_rays(pipe_bf, params, ro, rd, key, mode=mode)
            err = np.abs(
                np.asarray(out_q["depth_net_rgb_map"])
                - np.asarray(out_b["depth_net_rgb_map"])
            )
            assert np.isfinite(np.asarray(out_q["depth_net_rgb_map"])).all()
            assert float(err.mean()) < 0.05, (mode, float(err.mean()))

    def test_missing_calib_raises(self):
        import dataclasses

        import pytest

        from nerf_sampling_tpu.render import EvalMode, render_flat_rays

        from tests.test_render_engine import (
            sphere_hitting_rays,
            tiny_params,
            tiny_pipeline,
        )

        pipe = tiny_pipeline(mlp_impl="pallas_int8")
        params = tiny_params(pipe)
        rays = sphere_hitting_rays(pipe, n=8)
        ro, rd = rays.rays_o, rays.rays_d
        with pytest.raises(ValueError, match="quant_calib"):
            render_flat_rays(
                pipe, params, ro, rd, jax.random.PRNGKey(0),
                mode=EvalMode.FULL_NERF,
            )


class TestRequantSaturation:
    def test_overflow_saturates_high_not_wraps(self):
        """An accumulator far beyond the calibrated range must clip to the
        HIGH rail (127), not wrap int32 through t*m and land at the low
        rail — the 'saturates gracefully' contract of the module docstring.
        Regression for the pre-shift clamp in _requant_int."""
        import jax.numpy as jnp
        import numpy as np

        from nerf_sampling_tpu.kernels.quant import _decompose, _requant_int

        # a step calibrated for amax_int ~ 2^20 (p>0 so the pre-shift runs)
        step = ("int",) + _decompose((2.0**20) / 127.0)
        assert step[1] > 0
        in_range = jnp.array([2**19], jnp.int32)
        assert int(_requant_int(in_range, step, 0)[0]) > 0
        # 100x the calibrated amax: must saturate at 127 on both clip modes
        huge = jnp.array([np.int32(2**31 - 1)], jnp.int32)
        assert int(_requant_int(huge, step, 0)[0]) == 127
        assert int(_requant_int(huge, step, -127)[0]) == 127
        assert int(_requant_int(-huge, step, -127)[0]) == -127


class TestInt8TrainModeGuard:
    @pytest.mark.parametrize("mode", ["nerf", "joint"])
    def test_int8_rejected_when_nerf_updates(self, tmp_path, mode):
        """mlp_impl='pallas_int8' calibrates activation scales ONCE on the
        restored params (train/trainer.py setup_models); train modes that
        then update the NeRF would eval/keep_best through increasingly
        stale scales. Those modes must be rejected up front."""
        from nerf_sampling_tpu.data.example import generate_example_dataset
        from nerf_sampling_tpu.train.trainer import Trainer
        from nerf_sampling_tpu.utils.config import TrainerConfig

        datadir = generate_example_dataset(
            str(tmp_path / "data"), H=16, W=16, n_train=2, n_val=1, n_test=1
        )
        cfg = TrainerConfig(
            expname=f"int8_{mode}",
            train_mode=mode,
            mlp_impl="pallas_int8",
            dataset_type="blender",
            datadir=datadir,
            basedir=str(tmp_path / "logs"),
            half_res=False,
            testskip=1,
            N_rand=16,
            N_samples=4,
            N_importance=4,
            netdepth=3,
            netwidth=16,
            netdepth_fine=3,
            netwidth_fine=16,
            n_layers=2,
            layer_width=8,
        )
        with pytest.raises(ValueError, match="frozen NeRF"):
            Trainer(cfg).train(N_iters=3)
