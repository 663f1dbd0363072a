"""NeRF pretrain step: custom-VJP fused kernel vs XLA, rate + convergence.

Runs on the real TPU. Trains vanilla NeRF on the in-memory example scene
with both mlp_impl settings for a few hundred steps, printing it/s and the
loss/psnr trajectory — the bf16 fused path must track the fp32-high XLA
path (memory: DEFAULT-precision bf16 XLA training diverges; the kernel
keeps fp32 PE + fp32 accumulation, so this validates it empirically).
"""

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/nerf_sampling_tpu_jax"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from nerf_sampling_tpu.data.example import make_example_scene
from nerf_sampling_tpu.render import NeRFParams
from nerf_sampling_tpu.models import nerf_init
from nerf_sampling_tpu.train.sampler import RaySampler, SamplerConfig
from nerf_sampling_tpu.train.state import init_state, make_nerf_optimizer
from nerf_sampling_tpu.train.steps import make_nerf_train_step
from nerf_sampling_tpu.utils.config import TrainerConfig


def run(mlp_impl: str, n_iters: int, scene, seed=0):
    cfg = TrainerConfig(mlp_impl=mlp_impl, N_samples=64, N_importance=128,
                        precrop_iters=250)
    pipe = cfg.pipeline(with_depth=False)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    params = NeRFParams(
        coarse=nerf_init(k1, pipe.nerf), fine=nerf_init(k2, pipe.fine)
    )
    opt = make_nerf_optimizer(cfg.lrate, cfg.lrate_decay)
    state = init_state(params._replace(depth=None), opt)
    step = make_nerf_train_step(pipe, opt)
    sampler = RaySampler(
        scene,
        SamplerConfig(N_rand=1024, use_batching=False, precrop_iters=250,
                      precrop_frac=0.5),
        seed=seed,
    )
    key = jax.random.PRNGKey(seed)
    losses, psnrs = [], []
    t_start = None
    for i in range(1, n_iters + 1):
        ro, rd, tgt = sampler.sample(i)
        batch = np.concatenate([ro, rd, tgt], -1)
        state, m = step(state, batch, jax.random.fold_in(key, i))
        if i == 1:
            float(m["loss"])  # sync after compile
            t_start = time.perf_counter()
        if i % 100 == 0:
            losses.append(float(m["loss"]))
            psnrs.append(float(m["psnr"]))
            print(
                f"[{mlp_impl}] iter {i}: loss {losses[-1]:.4f} "
                f"psnr {psnrs[-1]:.2f}",
                flush=True,
            )
        elif i % 32 == 0:
            float(m["loss"])  # drain the dispatch queue
    dt = time.perf_counter() - t_start
    rate = (n_iters - 1) / dt
    print(f"[{mlp_impl}] {rate:.1f} it/s over {n_iters} iters", flush=True)
    return rate, losses, psnrs


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    scene = make_example_scene(H=200, W=200, n_train=20, n_val=2, n_test=2)
    r_pal, l_pal, p_pal = run("pallas", n_iters, scene)
    r_xla, l_xla, p_xla = run("xla", n_iters, scene)
    print(
        f"SPEEDUP: {r_pal / r_xla:.2f}x "
        f"(pallas {r_pal:.1f} vs xla {r_xla:.1f} it/s); "
        f"final psnr pallas {p_pal[-1]:.2f} xla {p_xla[-1]:.2f}"
    )


if __name__ == "__main__":
    main()
