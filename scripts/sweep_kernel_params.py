"""On-chip sweep of fused_render tiling knobs at the bench operating point.

Sweeps (CHUNK_ROWS, ray-tile) for S=64 and S=192; prints krays/s medians.
"""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/nerf_sampling_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from nerf_sampling_tpu.models import NeRFConfig, nerf_init
from nerf_sampling_tpu.kernels import fused_render as fr

cfg = NeRFConfig(D=8, W=256, input_ch=63, input_ch_views=27, output_ch=5, skips=(4,), use_viewdirs=True)
params = nerf_init(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)
n = 1 << 17
ro = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (n, 1))
rd = (rng.standard_normal((n, 3)) * 0.2).astype(np.float32); rd[:, 2] = -1.0
ro_j, rd_j = jnp.asarray(ro), jnp.asarray(rd)

def sync(x): return float(np.asarray(x).ravel()[0])
def timeit(fn, reps=5):
    out = fn(); sync(out["rgb_map"])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = fn(); sync(out["rgb_map"]); ts.append(time.perf_counter()-t0)
    ts.sort(); return ts[len(ts)//2]

for S in (64, 192):
    for tile in (128, 256):
        for rows in (1024, 2048, 4096):
            fr.CHUNK_ROWS = rows
            try:
                dt = timeit(jax.jit(lambda S=S, tile=tile: fr.fused_render(
                    params, cfg, ro_j, rd_j, n_samples=S, tile=tile)))
                print(f"S={S} tile={tile} rows={rows}: {n/dt/1e3:.0f} krays/s", flush=True)
            except Exception as e:
                print(f"S={S} tile={tile} rows={rows}: FAIL {type(e).__name__} {str(e)[:120]}", flush=True)
