"""Decompose the production-arm rays/s gap (bench.py: 1.16M at 400^2 vs the
1.75-1.81M FULL_NERF headline at 800^2).

Hypotheses measured here, on the committed trained checkpoint:
  (a) fixed per-call overhead (tunnel dispatch + readback chain) that a
      400^2 frame amortizes 4x worse than an 800^2 frame;
  (b) the DEPTH_NET path's extra kernel launch (fused_depth_net_apply);
  (c) a genuinely slower around_depth kernel rate vs the vanilla grid.

Timing follows bench.py's rule for the axon backend: every rep ends with a
one-element host read of a value that depends on the full computation
(block_until_ready can return at enqueue time here).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import production_render_setup, PROD_CKPT  # noqa: E402

REPS = 12


def timed(fn, *args, **kw):
    fn(*args, **kw)  # warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn(*args, **kw)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    setup = production_render_setup(PROD_CKPT, "pallas")
    params = setup["params"]
    n400 = setup["n_rays"]

    def run400(i=0):
        out = setup["render"](params, key=jax.random.fold_in(jax.random.PRNGKey(1), i))
        return float(out["depth_net_rgb_map"][0, 0, 0])

    skip_measured = "--rest" in sys.argv  # sections (a)+400^2 already recorded

    if not skip_measured:
        dt400 = timed(run400)
        print(f"DEPTH_NET 400^2: {dt400*1e3:.1f} ms -> {n400/dt400/1e6:.3f} M rays/s")

    # (a) same render, 4x the rays: flat-ray entry at 800^2-equivalent count
    from nerf_sampling_tpu.render import render_flat_rays
    from nerf_sampling_tpu.render.engine import EvalMode

    import dataclasses
    import functools

    # recover the pipeline via a fresh setup (render closure hides it) — cheap
    from bench import production_render_setup as _prs  # noqa
    # instead: rebuild rays at two sizes directly
    from nerf_sampling_tpu.core import get_rays
    from nerf_sampling_tpu.data.blender import load_blender_data
    from nerf_sampling_tpu.definitions import ROOT_DIR

    scene = load_blender_data(f"{ROOT_DIR}/dataset/example", half_res=False, testskip=1)
    H, W, focal = scene.hwf
    H, W = int(H), int(W)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1.0]], np.float32)
    c2w = np.asarray(scene.poses[int(scene.i_test[0])][:3, :4], np.float32)
    ro, rd = get_rays(H, W, K, c2w)
    ro = jnp.asarray(np.asarray(ro).reshape(-1, 3))
    rd = jnp.asarray(np.asarray(rd).reshape(-1, 3))
    pipeline = setup["pipeline"]

    flat = jax.jit(functools.partial(render_flat_rays, pipeline, mode=EvalMode.DEPTH_NET))

    def run_flat(n, i=0):
        out = flat(params, ro[:n], rd[:n], jax.random.fold_in(jax.random.PRNGKey(1), i))
        return float(out["depth_net_rgb_map"][0, 0])

    if not skip_measured:
        for n in (160_000, 320_000, 640_000):
            dt = timed(run_flat, n)
            print(f"DEPTH_NET flat n={n}: {dt*1e3:.1f} ms -> {n/dt/1e6:.3f} M rays/s")

    # (b) the depth-net oracle alone
    from nerf_sampling_tpu.kernels import fused_depth_net_apply

    dnet = jax.jit(
        functools.partial(
            fused_depth_net_apply, cfg=pipeline.depth, dtype=jnp.bfloat16
        )
    )

    def run_dnet(n):
        d = dnet(params.depth, rays_o=ro[:n], rays_d=rd[:n])
        return float(jnp.asarray(d).reshape(-1)[0])

    for n in (160_000, 640_000):
        dt = timed(run_dnet, n)
        print(f"depth-net apply n={n}: {dt*1e3:.2f} ms")

    # (c) vanilla fused grid render on the same trained fine net, same counts
    fn = jax.jit(
        functools.partial(render_flat_rays, pipeline, mode=EvalMode.FULL_NERF)
    )
    pipe_nohier = dataclasses.replace(pipeline, N_importance=0, N_samples=64)
    fn = jax.jit(
        functools.partial(render_flat_rays, pipe_nohier, mode=EvalMode.FULL_NERF)
    )

    def run_full(n, i=0):
        out = fn(params, ro[:n], rd[:n], jax.random.fold_in(jax.random.PRNGKey(1), i))
        return float(out["depth_net_rgb_map"][0, 0])

    for n in (160_000, 640_000):
        dt = timed(run_full, n)
        print(f"FULL_NERF/64 flat n={n}: {dt*1e3:.1f} ms -> {n/dt/1e6:.3f} M rays/s")


if __name__ == "__main__":
    main()
