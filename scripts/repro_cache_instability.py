"""Minimal repro: persistent-compile-cache key instability across processes.

Round-2 observation (ROADMAP.md): two processes compiling the IDENTICAL
scanned depth-train step produced DIFFERENT persistent-cache entries, so
relaunches paid the multi-minute remote AOT compile again.

This script isolates the question: is the jax persistent cache KEY stable
across processes for (a) a plain XLA program, (b) a Pallas/Mosaic program,
(c) the scanned depth-train step? Run it twice back to back:

    python scripts/repro_cache_instability.py --dir /tmp/cache_repro
    python scripts/repro_cache_instability.py --dir /tmp/cache_repro

First run prints the cache files created per section; the second run must
create ZERO new files if keys are stable. Any section that grows the cache
on run 2 has a nondeterministic compile key — diff the two key sets to
attribute it (jax derives the key from the serialized HLO + compile opts,
so instability means something in the serialized module differs run to
run; for Mosaic kernels the suspect is the embedded custom-call payload).

Findings (2026-08-17, jax on the axon backend — see ROADMAP.md):
documented after running on the round-3 chip session.
"""

from __future__ import annotations

import argparse
import os
import sys


def cache_files(d):
    if not os.path.isdir(d):
        return set()
    return {f for f in os.listdir(d) if not f.startswith(".")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/nerf_sampling_cache_repro")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu) before init")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", args.dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # log cache activity so hits/misses are visible in stderr (env vars
    # are bound at jax import time — config.update is the reliable path)
    jax.config.update("jax_explain_cache_misses", True)
    jax.config.update("jax_log_compiles", True)

    import jax.numpy as jnp
    import numpy as np

    report = []

    def section(name, fn):
        before = cache_files(args.dir)
        fn()
        after = cache_files(args.dir)
        new = sorted(after - before)
        report.append((name, new))
        print(f"[{name}] new cache entries: {len(new)}")
        for f in new:
            print(f"    {f}")

    # (a) plain XLA
    def xla_prog():
        x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
        f = jax.jit(lambda a: (a @ a.T).sum())
        float(f(x))

    # (b) a Pallas kernel (the fused depth net, bf16)
    def pallas_prog():
        import hashlib

        from nerf_sampling_tpu.kernels import fused_depth_net_apply
        from nerf_sampling_tpu.kernels.fused_depth_net import (
            _flatten, _fused_call, pack_depth_net_params,
        )
        from nerf_sampling_tpu.models import DepthNetConfig, depth_net_init

        cfg = DepthNetConfig(hidden_sizes=(16, 16), cat_hidden_sizes=(16, 16))
        params = depth_net_init(jax.random.PRNGKey(0), cfg)
        ro = jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (128, 1))
        rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (128, 1))
        out = fused_depth_net_apply(
            params, cfg, ro, rd,
            interpret=jax.default_backend() == "cpu",
        )
        float(np.asarray(out).ravel()[0])
        # attribution: hash the STABLEHLO TEXT of the exact jit that owns
        # the flaky key (jit__fused_call). If this hash is identical across
        # processes while the cache key differs, the nondeterminism is in
        # compile options/topology metadata, not the serialized module; if
        # it differs, diff the texts — the Mosaic custom-call payload is
        # the suspect.
        packed = tuple(_flatten(pack_depth_net_params(params, cfg, jnp.bfloat16)))
        A = jnp.zeros((128, 128), jnp.bfloat16)
        B = jnp.zeros((128, 128), jnp.bfloat16)
        txt = _fused_call.lower(
            A, B, packed, cfg, jnp.bfloat16, 128,
            jax.default_backend() == "cpu",
        ).as_text()
        print(f"    stablehlo sha256[jit__fused_call] = "
              f"{hashlib.sha256(txt.encode()).hexdigest()[:16]}")

    # (c) the scanned depth-train step; (d) same with the Mosaic hier
    # oracle INSIDE the scan (mlp_impl="pallas" — the r2 offender had the
    # fused stochastic kernel in the scan body, which is where a
    # nondeterministic serialized payload would live)
    def scanned_step(mlp_impl="xla"):
        from nerf_sampling_tpu.models import (
            DepthNetConfig, NeRFConfig, depth_net_init, nerf_init,
        )
        from nerf_sampling_tpu.render import NeRFParams, Pipeline
        from nerf_sampling_tpu.train.state import init_state, make_depth_optimizer
        from nerf_sampling_tpu.train.steps import (
            make_depth_net_train_step, make_multi_step,
        )

        ncfg = NeRFConfig(D=2, W=32, input_ch=63, input_ch_views=27,
                          output_ch=5, skips=(), use_viewdirs=True)
        dcfg = DepthNetConfig(hidden_sizes=(16, 16), cat_hidden_sizes=(16, 16))
        p = Pipeline(nerf=ncfg, fine=ncfg, depth=dcfg, N_samples=4,
                     N_importance=4, mlp_impl=mlp_impl)
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        bundle = NeRFParams(coarse=nerf_init(ks[0], p.nerf),
                            fine=nerf_init(ks[1], p.fine),
                            depth=depth_net_init(ks[2], p.depth))
        opt = make_depth_optimizer(1e-3)
        state = init_state(bundle.depth, opt)
        step = make_depth_net_train_step(p, opt)
        multi = make_multi_step(step, n_states=1, with_const=True)
        stack = np.zeros((4, 32, 9), np.float32)
        stack[..., 2] = 4.0
        stack[..., 5] = -1.0
        state, ms = multi(bundle._replace(depth=None), state,
                          jnp.asarray(stack), jax.random.PRNGKey(1), 0)
        float(np.asarray(ms["loss"])[0])

    section("xla", xla_prog)
    section("pallas_fused_depth_net", pallas_prog)
    section("scanned_depth_step", scanned_step)
    if jax.default_backend() != "cpu":
        # the fused stochastic hier oracle inside the scan body — the r2
        # offender's shape (no interpret-mode lowering for in-kernel PRNG,
        # so TPU only)
        section("scanned_depth_step_pallas_oracle",
                lambda: scanned_step("pallas"))

    total_new = sum(len(new) for _, new in report)
    print(f"TOTAL new entries this process: {total_new}")
    print("(run the script a second time: a stable cache adds 0 entries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
