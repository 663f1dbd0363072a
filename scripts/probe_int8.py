"""Probe: can Mosaic on this chip run W8A8 int8 MXU matmuls, and at what
speedup over bf16?

The v5e datasheet gives the int8 MXU peak as ~2x the bf16 peak (394 TOPS
vs 197 TFLOP/s). This probe measures whether that is reachable from
Pallas on this jax build before committing to an int8 variant of the
fused NeRF kernels (ROADMAP round-3 close-out: dtype is the one remaining
order-of-magnitude lever).

Three kernels over an L-deep [R, 256] @ [256, 256] relu chain (the fused
NeRF kernel's trunk shape):
  bf16:      the current production arithmetic (fp32 accum)
  int8:      int8 weights+activations, int32 accum, per-layer fp32
             rescale + relu + requantize to int8 between layers
  int8_raw:  int8 chain with NO requantize epilogue (pure MXU ceiling)

Usage: python scripts/probe_int8.py [rows] [layers] [reps]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/nerf_sampling_tpu_jax"),
    ),
)

W = int(os.environ.get("PROBE_W", "256"))
TILE = int(os.environ.get("PROBE_TILE", "2048"))


def _bf16_kernel(L, *refs):
    x_ref, out_ref = refs[0], refs[-1]
    ws = refs[1:-1]
    h = x_ref[:].astype(jnp.bfloat16)
    for i in range(L):
        z = jnp.dot(h, ws[i][:], preferred_element_type=jnp.float32)
        h = jax.nn.relu(z).astype(jnp.bfloat16)
    out_ref[:] = h.astype(jnp.float32)


def _int8_kernel(L, requant, *refs):
    x_ref, out_ref = refs[0], refs[-1]
    ws = refs[1:-1]
    h = x_ref[:]  # int8 in
    scale = jnp.float32(0.05)  # stand-in dequant scale
    inv = jnp.float32(1.0 / 0.05)
    for i in range(L):
        z = jnp.dot(h, ws[i][:], preferred_element_type=jnp.int32)
        if requant == "fp32":
            f = jax.nn.relu(z.astype(jnp.float32) * scale)
            q = jnp.clip(f * inv + 0.5, 0.0, 127.0)
            h = q.astype(jnp.int8)
        elif requant == "int":
            # relu + requantize entirely in the integer domain:
            # fused scale*inv is a power-of-two-ish multiplier + shift.
            z = jnp.maximum(z, 0)
            h = jnp.minimum((z * 3) >> 8, 127).astype(jnp.int8)
        elif requant == "int_pc":
            # the production integer epilogue: per-channel multiplier rows
            # (bias folded pre-shift), built from iota so Mosaic cannot
            # fold them to scalar splats.
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
            bz = lane * 3 + 100
            m = (lane & 63) + 64  # [64, 127]
            t = (z + bz) >> 8
            h = jnp.clip((t * m) >> 7, 0, 127).astype(jnp.int8)
        elif requant == "bias_scalar":
            # production candidate: per-channel int32 bias add (weights
            # absorb the per-channel scales), then SCALAR multiplier+shift
            # requant. relu = the clip-at-0.
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
            bz = lane * 3 + 100
            t = jnp.maximum(z + bz, 0) >> 8
            h = jnp.minimum((t * 77) >> 6, 127).astype(jnp.int8)
        elif requant == "fp32min":
            # minimal per-channel fp32 epilogue: one convert + fma + clip
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(
                jnp.float32
            )
            Mf = 0.001 + 1e-6 * lane
            Bf = 0.5 + 1e-4 * lane
            h = jnp.clip(z.astype(jnp.float32) * Mf + Bf, 0.0, 127.0).astype(
                jnp.int8
            )
        else:
            # wrap back to int8 without leaving the int domain
            h = (z & 0x7F).astype(jnp.int8)
    out_ref[:] = h.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("L", "mode"))
def run(x, ws, L, mode):
    kern = (
        functools.partial(_bf16_kernel, L)
        if mode == "bf16"
        else functools.partial(
            _int8_kernel,
            L,
            {
                "int8": "fp32",
                "int8_intreq": "int",
                "int8_intpc": "int_pc",
                "int8_biassc": "bias_scalar",
                "int8_fp32min": "fp32min",
            }.get(mode, "none"),
        )
    )
    n = x.shape[0]
    return pl.pallas_call(
        kern,
        grid=(n // TILE,),
        in_specs=[pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [
            pl.BlockSpec((W, W), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(L)
        ],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, *ws)


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    rng = np.random.default_rng(0)
    x32 = rng.standard_normal((rows, W)).astype(np.float32)
    ws32 = [rng.standard_normal((W, W)).astype(np.float32) * 0.05 for _ in range(L)]

    flops = 2.0 * rows * W * W * L

    modes = ("bf16", "int8_raw", "int8", "int8_intreq", "int8_intpc",
             "int8_fp32min")
    for mode in (sys.argv[4].split(",") if len(sys.argv) > 4 else modes):
        if mode == "bf16":
            x = jnp.asarray(x32, jnp.bfloat16)
            ws = [jnp.asarray(w, jnp.bfloat16) for w in ws32]
        else:
            x = jnp.asarray(np.clip(x32 * 25, -127, 127).astype(np.int8))
            ws = [
                jnp.asarray(np.clip(w * 500, -127, 127).astype(np.int8))
                for w in ws32
            ]
        try:
            out = run(x, ws, L, mode)
            # Sync on-device; pull back only one element (the full [rows, W]
            # fp32 array is ~1 GB and would dominate timing over the tunnel).
            finite = bool(np.isfinite(float(jnp.ravel(out)[0])))
            print(f"{mode}: warm, first-elem finite={finite}")
        except Exception as e:  # noqa: BLE001
            print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(x, ws, L, mode)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        times.sort()
        dt = times[len(times) // 2]
        print(
            f"{mode}: {dt * 1e3:.1f} ms median -> {flops / dt / 1e12:.1f} "
            f"T(fl)op/s issued"
        )


if __name__ == "__main__":
    main()
