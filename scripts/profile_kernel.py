"""Where do the fused-kernel cycles go? On-chip ablation microbenchmarks.

Each variant strips one stage from the fused MLP so the deltas attribute
time to: the pure matmul chain (MXU ceiling), the PE sin (VPU
transcendental), the fp32->bf16 casts, and the [R,8] input build. Run while
no other TPU process holds the chip. Prints Mpts/s per variant.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/nerf_sampling_tpu_jax")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from nerf_sampling_tpu.kernels import fused_nerf as fn
from nerf_sampling_tpu.models import NeRFConfig, nerf_init

cfg = NeRFConfig(
    D=8, W=256, input_ch=63, input_ch_views=27, output_ch=5, skips=(4,),
    use_viewdirs=True,
)
params = nerf_init(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)
N = 1 << 22  # large enough that compute >> tunnel round-trip latency
N_CHAIN = 1 << 21
CHAIN_LAYERS = 27  # 3 passes of 9 to lengthen per-row compute
TILE = 2048


def sync(x):
    # Read ONE element (a tiny device-side slice), not the whole array —
    # np.asarray(full) would ship hundreds of MB through the tunnel and
    # the benchmark would measure the transfer, not the kernel.
    return float(x[0, 0])


def timeit(fn_, reps=5):
    out = fn_()
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn_()
        sync(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


# --- variant 1: pure matmul chain, bf16, CHAIN_LAYERS x [T,256]@[256,256]+relu
W9 = [
    (rng.standard_normal((256, 256)) * 0.05).astype(np.float32) for _ in range(9)
]


def ceiling_kernel(x_ref, *refs):
    out_ref = refs[-1]
    h = x_ref[:]
    for r in range(CHAIN_LAYERS):
        wr = refs[r % 9]
        h = jax.nn.relu(
            jnp.dot(h, wr[:], preferred_element_type=jnp.float32)
        ).astype(jnp.bfloat16)
    out_ref[:] = h


@jax.jit
def ceiling_call(x, *ws):
    const_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in ws
    ]
    return pl.pallas_call(
        ceiling_kernel,
        grid=(x.shape[0] // TILE,),
        in_specs=[pl.BlockSpec((TILE, 256), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + const_specs,
        out_specs=pl.BlockSpec((TILE, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], 256), jnp.bfloat16),
    )(x, *ws)


# --- variant 2/3: fused_nerf MLP with/without the sin ---
def mlp_variant(no_sin=False, bf16_pe=False):
    dtype = jnp.bfloat16
    F, P = fn._pe_matrices(10, 4)
    packed_flat = tuple(fn._flatten_packed(fn.pack_nerf_params(params, cfg, 10, 4, dtype)))

    def kern(*refs):
        x_ref, F_ref, P_ref, out_ref = refs[0], refs[1], refs[2], refs[-1]
        it = iter(refs[3:-1])

        def nxt():
            return next(it)[:]

        acc = jnp.float32
        X32 = x_ref[:]
        if bf16_pe:
            z0 = jnp.dot(
                X32.astype(dtype), F_ref[:].astype(dtype), preferred_element_type=acc
            )
        else:
            z0 = jnp.dot(X32, F_ref[:], preferred_element_type=acc)
        S32 = (z0 + P_ref[:]) if no_sin else jnp.sin(z0 + P_ref[:])
        X = X32.astype(dtype)
        S = S32.astype(dtype)
        w0x, w0s = nxt(), nxt()
        trunk_w = [None] + [nxt() for _ in range(cfg.D - 1)]
        trunk_b = [nxt() for _ in range(cfg.D)]
        skip = {i: (nxt(), nxt()) for i in range(1, cfg.D) if (i - 1) in cfg.skips}
        views_wx, views_ws, views_wf, views_b = nxt(), nxt(), nxt(), nxt()
        feature_w, feature_b = nxt(), nxt()
        head_rgb4, head_alpha4, head_b4 = nxt(), nxt(), nxt()

        def emb_dot(wx, ws):
            return jnp.dot(X, wx, preferred_element_type=acc) + jnp.dot(
                S, ws, preferred_element_type=acc
            )

        h = None
        for i in range(cfg.D):
            if i == 0:
                z = emb_dot(w0x, w0s)
            elif i in skip:
                z = jnp.dot(h, trunk_w[i], preferred_element_type=acc) + emb_dot(*skip[i])
            else:
                z = jnp.dot(h, trunk_w[i], preferred_element_type=acc)
            h = jax.nn.relu(z + trunk_b[i]).astype(dtype)
        feature = (jnp.dot(h, feature_w, preferred_element_type=acc) + feature_b).astype(dtype)
        hv = jax.nn.relu(
            jnp.dot(feature, views_wf, preferred_element_type=acc)
            + emb_dot(views_wx, views_ws)
            + views_b
        ).astype(dtype)
        out_ref[:] = (
            jnp.dot(hv, head_rgb4, preferred_element_type=acc)
            + jnp.dot(h, head_alpha4, preferred_element_type=acc)
            + head_b4
        )

    @jax.jit
    def call(x):
        consts = (F, P) + packed_flat
        const_specs = [
            pl.BlockSpec(w.shape, lambda i, nd=len(w.shape): (0,) * nd,
                         memory_space=pltpu.VMEM)
            for w in consts
        ]
        return pl.pallas_call(
            kern,
            grid=(x.shape[0] // TILE,),
            in_specs=[
                pl.BlockSpec((TILE, fn.XDIM), lambda i: (i, 0), memory_space=pltpu.VMEM)
            ]
            + const_specs,
            out_specs=pl.BlockSpec((TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((x.shape[0], 4), jnp.float32),
        )(x, *consts)

    return call


def main():
    x8 = np.zeros((N, fn.XDIM), np.float32)
    x8[:, 0:3] = rng.standard_normal((N, 3)) * 0.5
    d = rng.standard_normal((N, 3))
    x8[:, 3:6] = d / np.linalg.norm(d, axis=1, keepdims=True)
    x8_j = jnp.asarray(x8)
    x256 = jnp.asarray(rng.standard_normal((N_CHAIN, 256)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ws = [jnp.asarray(w).astype(jnp.bfloat16) for w in W9]

    flops_mlp = 1.26e6  # per point, useful
    flops_chain = CHAIN_LAYERS * 2 * 256 * 256  # per row

    # tunnel round-trip latency: subtract from every kernel timing
    tiny = jnp.zeros((8, 128), jnp.float32)
    lat_fn = jax.jit(lambda t, s: t + s)
    lat_fn(tiny, 0.0)
    lats = []
    for i in range(7):
        t0 = time.perf_counter()
        sync(lat_fn(tiny, float(i)))
        lats.append(time.perf_counter() - t0)
    lats.sort()
    LAT = lats[len(lats) // 2]
    print(f"dispatch+sync latency: {LAT * 1e3:.1f} ms", flush=True)

    dt = timeit(lambda: ceiling_call(x256, *ws)) - LAT
    print(
        f"matmul-chain ceiling ({CHAIN_LAYERS} layers): {N_CHAIN / dt / 1e6:.1f} Mrows/s "
        f"({N_CHAIN / dt * flops_chain / 1e12:.1f} TFLOP/s)",
        flush=True,
    )

    for name, call in [
        ("mlp full (sin, fp32 PE)", mlp_variant()),
        ("mlp no-sin", mlp_variant(no_sin=True)),
        ("mlp bf16 PE matmul", mlp_variant(bf16_pe=True)),
    ]:
        dt = timeit(lambda c=call: c(x8_j)) - LAT
        print(
            f"{name}: {N / dt / 1e6:.1f} Mpts/s "
            f"({N / dt * flops_mlp / 1e12:.1f} TFLOP/s useful)",
            flush=True,
        )


if __name__ == "__main__":
    main()
