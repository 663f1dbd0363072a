"""Backward-kernel microbench: tile sweep + fwd/bwd rates on the real TPU.

Round-2 finding: the NeRF-pretrain recompute backward kernel runs at ~38%
of its issued-FLOP ceiling (fused_nerf_vjp._bwd_call at _TILE=512). Two
candidate causes, separable by this bench:
  (a) per-matmul fixed overhead — ~80 small matmuls per grid program at
      T=512 rows; if so, larger tiles amortize it and the rate climbs;
  (b) the sequential weight-grad accumulation chain across grid programs —
      if so, tile size barely matters and the two-phase (partials-to-HBM
      + XLA reduce) variant is needed.

For each tile it times the full fused_nerf_train_apply VJP (fwd+bwd, the
training configuration: input_grads=False) on the flagship 8x256 net at
the pretrain operating points (1024 rays x 64 coarse / x 192 fine), checks
grads match the tile=512 baseline, and prints achieved TFLOP/s against the
issued-FLOP estimate (fwd 2F + bwd 4F with F = forward MACs).

Usage: python scripts/bench_bwd_kernel.py [tiles...]
"""

from __future__ import annotations

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

from nerf_sampling_tpu.kernels.fused_nerf_vjp import fused_nerf_train_apply
from nerf_sampling_tpu.models import NeRFConfig, nerf_init_active


def forward_macs(cfg: NeRFConfig) -> int:
    """MACs per point through the packed kernel (XDIM=128 embedding path)."""
    m = 2 * 128 * cfg.W  # w0x + w0s
    m += (cfg.D - 1) * cfg.W * cfg.W  # trunk
    m += 2 * len(cfg.skips) * 128 * cfg.W  # skip re-injections
    m += cfg.W * cfg.W  # feature
    m += 128 * cfg.W + 128 * cfg.W + cfg.W * cfg.W  # views (wx, ws, wf @ W)
    m += cfg.W * 4 * 2  # heads
    return m


def sync(x):
    return float(np.asarray(x).ravel()[0])


def bench(cfg, params, n, tile, reps=3, chain=8):
    """Times ``chain`` fwd+bwd passes inside ONE dispatch (the ~30 ms axon
    round-trip would otherwise swamp per-pass compute), returns
    (grads_of_pass0, seconds_per_pass)."""
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (n, 1, 3)).astype(np.float32)
    )
    dirs = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (n, 1, 3)).astype(np.float32)
    )

    def grad_once(p, scale):
        def loss(q):
            out = fused_nerf_train_apply(
                q, cfg, pts * scale, dirs[:, 0][:, None, :], tile=tile,
                input_grads=False,
            )
            return jnp.sum(out * out)

        return jax.grad(loss)(p)

    @jax.jit
    def chained(p):
        def body(i, acc):
            g = grad_once(p, 1.0 + 1e-6 * i)  # i-dependence defeats CSE
            return jax.tree.map(lambda a, b: a + b, acc, g)

        zero = jax.tree.map(jnp.zeros_like, p)
        return jax.lax.fori_loop(0, chain, body, zero)

    g0 = jax.jit(lambda p: grad_once(p, 1.0))(params)
    acc = chained(params)
    jax.tree.map(sync, acc)  # compile + settle
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = chained(params)
        sync(jax.tree.leaves(acc)[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return g0, times[len(times) // 2] / chain


def main():
    tiles = [int(t) for t in sys.argv[1:]] or [512, 1024, 2048]
    cfg = NeRFConfig(
        D=8, W=256, input_ch=63, input_ch_views=27, output_ch=5,
        skips=(4,), use_viewdirs=True,
    )
    params = nerf_init_active(jax.random.PRNGKey(0), cfg)
    F = forward_macs(cfg)
    print(f"forward MACs/point: {F/1e6:.2f} M (fwd+bwd issued ~{6*F/1e6:.2f} M)")

    for n in (1024 * 64, 1024 * 192):
        base = None
        for tile in tiles:
            try:
                grads, dt = bench(cfg, params, n, tile)
            except Exception as e:  # Mosaic compile failures at big tiles
                print(f"n={n} tile={tile}: FAILED {type(e).__name__}: {e}")
                continue
            tf = 6 * F * n * 2 / dt / 1e12  # 2 flops/MAC
            if base is None:
                base = grads
                match = "baseline"
            else:
                errs = [
                    float(jnp.abs(a - b).max())
                    for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(grads))
                ]
                match = f"max grad delta vs t512 {max(errs):.2e}"
            print(
                f"n={n} tile={tile}: {dt*1e3:.2f} ms  {tf:.1f} TFLOP/s issued "
                f"({tf/197.7*100:.0f}% of peak)  [{match}]",
                flush=True,
            )


if __name__ == "__main__":
    main()
