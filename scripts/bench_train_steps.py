"""On-chip it/s for the train steps: single-dispatch vs scan-fused (K steps).

Measures the depth-net step (frozen NeRF, fused hierarchical oracle) and the
vanilla NeRF step (custom-VJP kernels) at the reference operating point
(N_rand=1024, 64+128 samples). Run with the chip otherwise idle.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/nerf_sampling_tpu_jax")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from nerf_sampling_tpu.models import depth_net_init, nerf_init
from nerf_sampling_tpu.render import NeRFParams
from nerf_sampling_tpu.train.state import (
    init_state,
    make_depth_optimizer,
    make_nerf_optimizer,
)
from nerf_sampling_tpu.train.steps import (
    make_depth_net_train_step,
    make_multi_step,
    make_nerf_train_step,
)
from nerf_sampling_tpu.utils.config import TrainerConfig

K = 25
N_RAND = 1024
STEPS = 100  # per timing (single) / 4*K (multi)

cfg = TrainerConfig(mlp_impl="pallas", matmul_precision="high")
rng = np.random.default_rng(0)


def batches(n):
    b = np.zeros((n, N_RAND, 9), np.float32)
    b[..., 2] = 4.0
    b[..., 3:6] = rng.uniform(-0.35, 0.35, (n, N_RAND, 3)).astype(np.float32)
    b[..., 5] = -1.0
    b[..., 6:9] = rng.uniform(0, 1, (n, N_RAND, 3)).astype(np.float32)
    return b


def run_single(step, state, extra=()):
    key = jax.random.PRNGKey(0)
    bs = batches(1)[0]
    state, m = step(*extra, state, bs, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, m = step(*extra, state, jnp.asarray(bs), jax.random.fold_in(key, i))
        if i % 32 == 0:
            float(m["loss"])
    float(m["loss"])
    return STEPS / (time.perf_counter() - t0)


def run_multi(step, state):
    multi = make_multi_step(step, n_states=1)
    key = jax.random.PRNGKey(0)
    stack = jnp.asarray(batches(K))
    state, m = multi(state, stack, key, 0)
    float(m["loss"][0])
    t0 = time.perf_counter()
    n = 0
    for c in range(4):
        state, m = multi(state, stack, key, c * K)
        float(m["loss"][0])
        n += K
    return n / (time.perf_counter() - t0)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)

    # --- depth-net mode
    p = cfg.pipeline(with_depth=True)
    nerf_params = NeRFParams(
        coarse=nerf_init(ks[0], p.nerf), fine=nerf_init(ks[1], p.fine)
    )
    opt = make_depth_optimizer(1e-4)
    dstate = init_state(depth_net_init(ks[2], p.depth), opt)
    step = make_depth_net_train_step(p, opt, frozen_nerf=nerf_params)
    print(f"depth single: {run_single(step, dstate):.1f} it/s", flush=True)
    dstate = init_state(depth_net_init(ks[2], p.depth), opt)
    print(f"depth scan-{K}: {run_multi(step, dstate):.1f} it/s", flush=True)

    # --- depth-net mode, int8 oracle (W8A8 frozen-NeRF pass)
    import dataclasses

    from nerf_sampling_tpu.kernels.quant import calibrate_nerf_quant

    b0 = batches(1)[0]
    calib_c = calibrate_nerf_quant(nerf_params.coarse, p.nerf, b0[:, 0:3], b0[:, 3:6])
    calib_f = calibrate_nerf_quant(nerf_params.fine, p.fine, b0[:, 0:3], b0[:, 3:6])
    p_q = dataclasses.replace(
        p, mlp_impl="pallas_int8", quant_calib=(calib_c, calib_f)
    )
    step_q = make_depth_net_train_step(p_q, opt, frozen_nerf=nerf_params)
    dstate = init_state(depth_net_init(ks[2], p.depth), opt)
    print(f"depth int8 single: {run_single(step_q, dstate):.1f} it/s", flush=True)
    dstate = init_state(depth_net_init(ks[2], p.depth), opt)
    print(f"depth int8 scan-{K}: {run_multi(step_q, dstate):.1f} it/s", flush=True)

    # --- vanilla nerf mode
    p2 = cfg.pipeline(with_depth=False)
    nopt = make_nerf_optimizer(5e-4, 250)
    nstate = init_state(
        NeRFParams(coarse=nerf_init(ks[0], p2.nerf), fine=nerf_init(ks[1], p2.fine)),
        nopt,
    )
    nstep = make_nerf_train_step(p2, nopt)
    print(f"nerf single: {run_single(nstep, nstate):.1f} it/s", flush=True)
    nstate = init_state(
        NeRFParams(coarse=nerf_init(ks[0], p2.nerf), fine=nerf_init(ks[1], p2.fine)),
        nopt,
    )
    print(f"nerf scan-{K}: {run_multi(nstep, nstate):.1f} it/s", flush=True)


if __name__ == "__main__":
    main()
