"""Attribute the vanilla NeRF train step's ~31 ms: MLP fwd+bwd vs XLA rest.

Times (a) the custom-VJP fused MLP grad alone at several backward tiles,
(b) the forward render, (c) the full step. Run with the chip idle.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/nerf_sampling_tpu_jax")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from nerf_sampling_tpu.models import nerf_init
from nerf_sampling_tpu.render import NeRFParams
from nerf_sampling_tpu.render.engine import make_ray_batch, render_rays_vanilla
from nerf_sampling_tpu.train.state import init_state, make_nerf_optimizer
from nerf_sampling_tpu.train.steps import make_nerf_train_step
from nerf_sampling_tpu.utils.config import TrainerConfig

cfg = TrainerConfig(mlp_impl="pallas", matmul_precision="high")
p = cfg.pipeline(with_depth=False)
rng = np.random.default_rng(0)
N = 1024
S_FINE = 192


def timeit(fn, *a, reps=20):
    out = fn(*a)
    jax.tree.leaves(out)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / reps


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    params = NeRFParams(
        coarse=nerf_init(ks[0], p.nerf), fine=nerf_init(ks[1], p.fine)
    )
    ro = np.zeros((N, 3), np.float32); ro[:, 2] = 4.0
    rd = rng.uniform(-0.35, 0.35, (N, 3)).astype(np.float32); rd[:, 2] = -1.0
    pts = jnp.asarray(
        ro[:, None] + rd[:, None] * np.linspace(2, 6, S_FINE)[None, :, None],
        jnp.float32,
    )
    vd = jnp.asarray(rd / np.linalg.norm(rd, axis=1, keepdims=True))

    from nerf_sampling_tpu.kernels import fused_nerf_vjp as fv

    for tile in (512, 1024, 2048):
        def loss(prm):
            raw = fv.fused_nerf_train_apply(
                prm, p.fine, pts, vd[:, None, :], tile=tile
            )
            return jnp.sum(raw * raw)

        g = jax.jit(jax.grad(loss))
        try:
            dt = timeit(g, params.fine)
            print(f"MLP grad tile={tile}: {dt*1e3:.2f} ms "
                  f"({N*S_FINE/dt/1e6:.0f} Mpts/s fwd+bwd)", flush=True)
        except Exception as e:
            print(f"MLP grad tile={tile}: FAIL {type(e).__name__} {str(e)[:100]}",
                  flush=True)

    def fwd_loss(prm):
        rays = make_ray_batch(p, jnp.asarray(ro), jnp.asarray(rd))
        out = render_rays_vanilla(p, prm, rays, jax.random.PRNGKey(1))
        return jnp.sum(out["rgb_map"]) + jnp.sum(out["rgb0"])

    dt = timeit(jax.jit(fwd_loss), params)
    print(f"render_rays_vanilla fwd: {dt*1e3:.2f} ms", flush=True)

    dt = timeit(jax.jit(jax.grad(fwd_loss)), params)
    print(f"render_rays_vanilla grad: {dt*1e3:.2f} ms", flush=True)

    opt = make_nerf_optimizer(5e-4, 250)
    step = make_nerf_train_step(p, opt)
    state = init_state(params, opt)
    batch = np.concatenate(
        [ro, rd, rng.uniform(0, 1, (N, 3)).astype(np.float32)], -1
    )
    key = jax.random.PRNGKey(0)
    state, m = step(state, batch, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(40):
        state, m = step(state, jnp.asarray(batch), jax.random.fold_in(key, i))
    float(m["loss"])
    print(f"full step: {(time.perf_counter()-t0)/40*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
