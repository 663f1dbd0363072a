"""On-chip validation of the fused kernels: compile, correctness, timing.

Run on the real TPU (NOT under the test suite's CPU pin). Each section
prints one line; timings are medians of per-rep device->host-synced runs
(block_until_ready can return at enqueue on the axon backend).

Interpreting the hier-vs-XLA error on a RANDOM density field: the kernel
computes the CDF with a Hillis-Steele log-step cumsum (different fp32
summation ORDER than XLA's cumsum) and Mosaic's sin/exp approximations
differ from XLA's, so near-tie CDF bins flip and fine z samples land in
different bins at some rays — measured rgb mae ~0.01-0.025 with isolated
large per-ray maxima on the chaotic nerf_init_active field, IDENTICAL in
fp32 and bf16 kernels (i.e. reordering, not dtype). On smooth TRAINED
fields the paths agree to < 0.01 dB PSNR; bit-aligned semantics are
checked by the CPU interpret-mode suite (3e-4).

Usage: python scripts/validate_kernels_tpu.py [n_rays]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/nerf_sampling_tpu_jax"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from nerf_sampling_tpu.models import NeRFConfig, nerf_init_active  # noqa: E402


def sync(x) -> float:
    return float(np.asarray(x).ravel()[0])


def timeit(fn, reps=3):
    out = fn()
    jax.tree.map(lambda v: sync(v), out)  # warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.tree.map(lambda v: sync(v), out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return out, times[len(times) // 2]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
    cfg = NeRFConfig(
        D=8, W=256, input_ch=63, input_ch_views=27, output_ch=5,
        skips=(4,), use_viewdirs=True,
    )
    params = nerf_init_active(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ro = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (n, 1))
    rd = (rng.standard_normal((n, 3)) * 0.2).astype(np.float32)
    rd[:, 2] = -1.0
    ro_j, rd_j = jnp.asarray(ro), jnp.asarray(rd)
    depth = jnp.asarray(rng.uniform(3.0, 5.0, (n, 1)).astype(np.float32))

    from nerf_sampling_tpu.kernels.fused_hier import fused_render_hier
    from nerf_sampling_tpu.kernels.fused_render import (
        fused_render,
        fused_render_around_depth,
        fused_render_gaussian,
        fused_shade,
    )

    # 1. coarse-only at S=64 (the bench config) and the new large-S cases
    for S in (64, 128, 192, 256):
        fn = jax.jit(lambda S=S: fused_render(params, cfg, ro_j, rd_j, n_samples=S))
        out, dt = timeit(fn)
        ok = bool(jnp.isfinite(out["rgb_map"]).all())
        print(f"fused_render S={S}: {n / dt / 1e3:.0f} krays/s finite={ok}")

    # 2. hierarchical 64+128 (the reference production eval operating point)
    fn = jax.jit(
        lambda: fused_render_hier(
            params, cfg, None, None, ro_j, rd_j, n_coarse=64, n_importance=128
        )
    )
    out, dt = timeit(fn)
    ok = bool(jnp.isfinite(out["rgb_map"]).all())
    print(f"fused_hier 64+128: {n / dt / 1e3:.0f} krays/s finite={ok}")

    # correctness vs XLA on a small slice
    m = 1024
    from nerf_sampling_tpu.render import (
        EvalMode, NeRFParams, Pipeline, make_ray_batch, render_rays_eval,
    )

    p = Pipeline(nerf=cfg, N_samples=64, N_importance=128, mlp_impl="xla")
    rays = make_ray_batch(p, ro_j[:m], rd_j[:m])
    want = render_rays_eval(
        p, NeRFParams(coarse=params), rays, jax.random.PRNGKey(0),
        EvalMode.FULL_NERF,
    )
    got = fused_render_hier(
        params, cfg, None, None, ro_j[:m], rd_j[:m], n_coarse=64, n_importance=128
    )
    err = float(
        jnp.abs(got["rgb_map"] - want["depth_net_rgb_map"]).mean()
    )
    errz = float(jnp.abs(got["max_z"] - want["max_z_vals"][:, 0]).mean())
    print(
        f"hier vs XLA: rgb mae={err:.5f} max_z mae={errz:.5f} "
        "(random-field CDF-reorder budget ~0.01-0.025 — see module docstring; "
        "trained fields agree <0.01 dB)"
    )

    # 3. uniform populate at S=64 and 128
    for S in (64, 128):
        fn = jax.jit(
            lambda S=S: fused_render_around_depth(
                params, cfg, ro_j, rd_j, depth, n_samples=S, std=1.0
            )
        )
        out, dt = timeit(fn)
        print(f"around_depth S={S}: {n / dt / 1e3:.0f} krays/s")

    # 4. in-kernel gaussian vs XLA-draw + fused_shade (distribution check)
    fn = jax.jit(
        lambda: fused_render_gaussian(
            params, cfg, ro_j, rd_j, depth, 1234, n_samples=64, std=1.0
        )
    )
    out_g, dt = timeit(fn)
    print(f"gaussian in-kernel S=64: {n / dt / 1e3:.0f} krays/s")

    from nerf_sampling_tpu.core.sampling import sample_points_around_mean

    _, z = sample_points_around_mean(
        ro_j, rd_j, depth, n_samples=64, mode="gaussian", std=1.0,
        key=jax.random.PRNGKey(7),
    )
    fn = jax.jit(lambda: fused_shade(params, cfg, ro_j, rd_j, z))
    out_x, dt = timeit(fn)
    print(f"gaussian XLA-draw + fused_shade: {n / dt / 1e3:.0f} krays/s")
    dmean = float(jnp.abs(out_g["rgb_map"].mean(0) - out_x["rgb_map"].mean(0)).max())
    print(f"gaussian mean-rgb delta (different PRNG streams): {dmean:.5f}")

    # 4b. int8 (W8A8) kernels: on-chip throughput vs bf16 + closeness.
    # Tolerance context: int8 carries ~7-bit activations, so vs the bf16
    # kernel expect rgb mae in the 1e-2 class on this chaotic random
    # field; the real acceptance gate is the trained-field PSNR delta
    # (bench production arm / RESULTS.md).
    from nerf_sampling_tpu.kernels.quant import calibrate_nerf_quant

    calib = calibrate_nerf_quant(params, cfg, ro_j[:2048], rd_j[:2048])
    for S in (64,):
        fn_q = jax.jit(
            lambda S=S: fused_render(
                params, cfg, ro_j, rd_j, n_samples=S, quant=calib
            )
        )
        out_q, dt_q = timeit(fn_q)
        fn_b = jax.jit(lambda S=S: fused_render(params, cfg, ro_j, rd_j, n_samples=S))
        out_b, dt_b = timeit(fn_b)
        err = float(jnp.abs(out_q["rgb_map"] - out_b["rgb_map"]).mean())
        ok = bool(jnp.isfinite(out_q["rgb_map"]).all())
        print(
            f"int8 fused_render S={S}: {n / dt_q / 1e3:.0f} krays/s "
            f"(bf16 {n / dt_b / 1e3:.0f}, x{dt_b / dt_q:.2f}) "
            f"rgb mae vs bf16={err:.4f} finite={ok}"
        )
    fn_q = jax.jit(
        lambda: fused_render_hier(
            params, cfg, None, None, ro_j, rd_j, n_coarse=64,
            n_importance=128, quant=calib,
        )
    )
    out_q, dt_q = timeit(fn_q)
    fn_b = jax.jit(
        lambda: fused_render_hier(
            params, cfg, None, None, ro_j, rd_j, n_coarse=64, n_importance=128
        )
    )
    out_b, dt_b = timeit(fn_b)
    err = float(jnp.abs(out_q["rgb_map"] - out_b["rgb_map"]).mean())
    ok = bool(jnp.isfinite(out_q["rgb_map"]).all())
    print(
        f"int8 fused_hier 64+128: {n / dt_q / 1e3:.0f} krays/s "
        f"(bf16 {n / dt_b / 1e3:.0f}, x{dt_b / dt_q:.2f}) "
        f"rgb mae vs bf16={err:.4f} finite={ok}"
    )
    fn_q = jax.jit(
        lambda: fused_render_around_depth(
            params, cfg, ro_j, rd_j, depth, n_samples=64, std=1.0, quant=calib
        )
    )
    out_q, dt_q = timeit(fn_q)
    print(f"int8 around_depth S=64: {n / dt_q / 1e3:.0f} krays/s")

    # 5. COMPARE dispatch on chip: fp32 kernels (diagnostic mode) vs XLA.
    # Round 3 tightened the CPU-interpret tolerance to 3e-4; this checks the
    # same bound holds for the REAL Mosaic lowering (the bf16 dispatch
    # needed 0.05 here in round 2).
    import dataclasses as _dc

    from nerf_sampling_tpu.models import DepthNetConfig, depth_net_init
    from nerf_sampling_tpu.render import render_flat_rays

    dcfg = DepthNetConfig()
    dparams = depth_net_init(jax.random.PRNGKey(5), dcfg)
    p_cmp = Pipeline(
        nerf=cfg, depth=dcfg, N_samples=16, N_importance=16,
        n_depth_samples=16, sampling_mode="uniform", distance=0.1,
        mlp_impl="xla",
    )
    bundle = NeRFParams(coarse=params, depth=dparams)
    a = render_flat_rays(
        p_cmp, bundle, ro_j[:m], rd_j[:m], jax.random.PRNGKey(0),
        EvalMode.COMPARE_NERF,
    )
    b = render_flat_rays(
        _dc.replace(p_cmp, mlp_impl="pallas"), bundle, ro_j[:m], rd_j[:m],
        jax.random.PRNGKey(0), EvalMode.COMPARE_NERF,
    )
    # Rays missing the r=2 bounding sphere carry NaN depth BY DESIGN
    # (reference parity); parity there means the NaN masks agree, and the
    # numeric budget applies to the hitting rays only.
    za, zb = a["depth_net_z_vals"], b["depth_net_z_vals"]
    mask_match = bool(jnp.array_equal(jnp.isnan(za), jnp.isnan(zb)))
    # stats over rays finite in BOTH paths, so a mask mismatch (reported
    # above) can't NaN-poison the magnitudes of the remaining divergence
    hit = ~(jnp.isnan(za) | jnp.isnan(zb)).any(axis=-1)
    if not bool(hit.any()):
        print("COMPARE fp32 dispatch vs XLA: no rays hit the sphere — "
              "check the ray setup")
        return
    dz = float(jnp.abs(za - zb)[hit].max())
    dr = jnp.abs(a["depth_net_rgb_map"] - b["depth_net_rgb_map"])[hit]
    drgb_med = float(jnp.median(dr))
    drgb_max = float(dr.max())
    # Budget: dz <= 1e-3 and MEDIAN rgb in the 1e-3 class. The rgb MAX on
    # this chaotic random field is z-sensitivity, not kernel error:
    # measured on-chip (r3), a pure-XLA control with ray directions
    # perturbed 1e-4 shows the same tail (p99 0.50 / max 0.53 vs the
    # fp32 dispatch's 0.51 / 0.53) while the median stays ~1e-3. Trained
    # smooth fields agree <0.01 dB (see module docstring).
    print(f"COMPARE fp32 dispatch vs XLA: nan-masks-agree={mask_match} "
          f"hit-rays max|dz|={dz:.2e} rgb median={drgb_med:.2e} "
          f"max={drgb_max:.2e} (budget: dz<=1e-3, median rgb ~1e-3; "
          f"max is field z-sensitivity — see comment)")


if __name__ == "__main__":
    main()
