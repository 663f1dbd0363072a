"""Attribute fused_render (linspace, bf16, S=64) time to its epilogue stages.

Monkeypatch-ablation at the bench operating point: each variant neuters one
epilogue stage (the axis-0 cumprod scan, the per-sample rgb sigmoids, the
whole compositing block) before tracing, so the timing deltas attribute
kernel time to those stages. Output quality is garbage in the ablated arms
— only the timing matters.

Methodology: all variants are compiled up front (distinct-but-equivalent
chunk_rows values keep separate jit cache entries at identical SC), then
timed INTERLEAVED round-robin so tunnel drift cancels across arms. Run with
the chip otherwise idle.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/nerf_sampling_tpu_jax")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from nerf_sampling_tpu.kernels import fused_render as fr
from nerf_sampling_tpu.kernels import ops
from nerf_sampling_tpu.models import NeRFConfig, nerf_init

cfg = NeRFConfig(
    D=8, W=256, input_ch=63, input_ch_views=27, output_ch=5, skips=(4,),
    use_viewdirs=True,
)
params = nerf_init(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)
n = 1 << 20
S = 64
ro = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (n, 1))
rd = (rng.standard_normal((n, 3)) * 0.2).astype(np.float32)
rd[:, 2] = -1.0
ro_j, rd_j = jnp.asarray(ro), jnp.asarray(rd)


def sync(x):
    return float(x[0, 0])


# dispatch+sync round-trip, to correct the small-batch timings
lat_fn = jax.jit(lambda t, s: t + s)
tiny = jnp.zeros((8, 128), jnp.float32)
sync(lat_fn(tiny, 0.0))
lats = []
for i in range(7):
    t0 = time.perf_counter()
    sync(lat_fn(tiny, float(i)))
    lats.append(time.perf_counter() - t0)
LAT = sorted(lats)[3]
print(f"latency {LAT*1e3:.1f} ms", flush=True)

orig_cumprod = ops.exclusive_cumprod_axis0
orig_finalize = ops.finalize_maps
orig_dists = ops.sorted_dists
orig_sigmoid = jax.nn.sigmoid


def stub_finalize(weights, z, rgb_sig, white_bkgd):
    # one cheap reduction per output row; keeps shapes, kills the real math
    m = ops.reduce0(weights)
    return [m, m, m, m, m, ops.reduce0(z)]


def make(chunk_rows):
    # tile=256 at S=64 -> SC = chunk_rows // 256; 1024..1279 all give SC=4,
    # so each variant gets its own jit cache entry with identical tiling.
    f = lambda: fr.fused_render(
        params, cfg, ro_j, rd_j, n_samples=S, chunk_rows=chunk_rows
    )
    out = f()  # trace + compile under whatever patches are active NOW
    sync(out["rgb_map"])
    return f


variants = {}
variants["baseline"] = make(1024)

ops.exclusive_cumprod_axis0 = lambda x: x
variants["no cumprod scan"] = make(1088)
ops.exclusive_cumprod_axis0 = orig_cumprod

jax.nn.sigmoid = lambda x: x
variants["no rgb sigmoids"] = make(1152)
jax.nn.sigmoid = orig_sigmoid

ops.finalize_maps = stub_finalize
ops.exclusive_cumprod_axis0 = lambda x: x
ops.sorted_dists = lambda z, dn: z
jax.nn.sigmoid = lambda x: x
variants["no epilogue at all"] = make(1216)
ops.finalize_maps = orig_finalize
ops.exclusive_cumprod_axis0 = orig_cumprod
ops.sorted_dists = orig_dists
jax.nn.sigmoid = orig_sigmoid

orig_rotate = ops.pe_rotate_chunk


def fake_rotate(state, rot, SC, dtype):
    # emit the chunk block without the sequential 7-op rotation chain
    # (wrong values, same shapes/dtypes): isolates the chain's VPU cost
    E, G = state
    R, PAD = E.shape
    em = E.astype(dtype)
    out = em if SC == 1 else jnp.broadcast_to(
        em[None], (SC, R, PAD)).reshape(SC * R, PAD)
    return out, state


ops.pe_rotate_chunk = fake_rotate
variants["no PE rotation chain"] = make(1248)
ops.pe_rotate_chunk = orig_rotate

ROUNDS = 13
times = {k: [] for k in variants}
for r in range(ROUNDS):
    for k, f in variants.items():
        t0 = time.perf_counter()
        out = f()
        sync(out["rgb_map"])
        times[k].append(time.perf_counter() - t0)

meds = {}
for k, ts in times.items():
    ts.sort()
    meds[k] = ts[len(ts) // 2]
    kr = n / (meds[k] - LAT) / 1e3
    print(f"{k:28s} {meds[k]*1e3:7.1f} ms  {kr:7.0f} krays/s (corrected)",
          flush=True)

base = meds["baseline"]
print(
    f"shares of device time: "
    f"scan {100*(base-meds['no cumprod scan'])/(base-LAT):.1f}%  "
    f"sigmoid {100*(base-meds['no rgb sigmoids'])/(base-LAT):.1f}%  "
    f"full epilogue {100*(base-meds['no epilogue at all'])/(base-LAT):.1f}%  "
    f"pe chain {100*(base-meds['no PE rotation chain'])/(base-LAT):.1f}%",
    flush=True,
)
