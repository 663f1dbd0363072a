"""On-chip sweep of fused_render tiling knobs at the bench operating point.

Sweeps (chunk_rows, ray-tile) for S=64 and S=192; prints raw and
latency-corrected krays/s medians (the tunnel's dispatch+sync round-trip is
~28 ms — significant at this batch size, absent in full-image renders where
one dispatch covers 640k rays).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/nerf_sampling_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from nerf_sampling_tpu.models import NeRFConfig, nerf_init
from nerf_sampling_tpu.kernels import fused_render as fr

cfg = NeRFConfig(D=8, W=256, input_ch=63, input_ch_views=27, output_ch=5, skips=(4,), use_viewdirs=True)
params = nerf_init(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)
n = 1 << 18
ro = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (n, 1))
rd = (rng.standard_normal((n, 3)) * 0.2).astype(np.float32); rd[:, 2] = -1.0
ro_j, rd_j = jnp.asarray(ro), jnp.asarray(rd)

def sync(x): return float(x[0, 0])  # one element, not a full-array transfer
def timeit(fn, reps=5):
    out = fn(); sync(out["rgb_map"])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = fn(); sync(out["rgb_map"]); ts.append(time.perf_counter()-t0)
    ts.sort(); return ts[len(ts)//2]

# dispatch+sync round-trip, to correct the small-batch timings
lat_fn = jax.jit(lambda t, s: t + s)
tiny = jnp.zeros((8, 128), jnp.float32)
sync(lat_fn(tiny, 0.0))
lats = []
for i in range(7):
    t0 = time.perf_counter(); sync(lat_fn(tiny, float(i))); lats.append(time.perf_counter() - t0)
LAT = sorted(lats)[3]
print(f"latency {LAT*1e3:.1f} ms", flush=True)

for S in (64, 192):
    for tile in (128, 256, 512):
        for rows in (512, 1024, 2048):
            try:
                dt = timeit(jax.jit(lambda S=S, tile=tile, rows=rows: fr.fused_render(
                    params, cfg, ro_j, rd_j, n_samples=S, tile=tile, chunk_rows=rows)))
                print(f"S={S} tile={tile} rows={rows}: {n/dt/1e3:.0f} krays/s raw, "
                      f"{n/(dt-LAT)/1e3:.0f} corrected", flush=True)
            except Exception as e:
                print(f"S={S} tile={tile} rows={rows}: FAIL {type(e).__name__} {str(e)[:90]}", flush=True)
