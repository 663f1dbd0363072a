"""Compile-cache behavior of the populate kernels across a distance sweep.

The render sweep (-e) varies n_samples x distance x mode. The distance
used to enter the fused kernels' static compile key (uniform via the
offsets tuple, gaussian via a static std float): 16 Mosaic compiles per
mode per process instead of 4. After routing std as traced data, this
script proves ONE compile per (mode, n_samples) on the real chip by
sweeping 4 distances and printing _call's jit cache size after each.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
import jax.numpy as jnp
import numpy as np

from nerf_sampling_tpu.kernels import fused_render as fr
from nerf_sampling_tpu.models import NeRFConfig, nerf_init_active

cfg = NeRFConfig(
    D=8, W=256, input_ch=63, input_ch_views=27, output_ch=5, skips=(4,),
    use_viewdirs=True,
)
params = nerf_init_active(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)
n = 1 << 14
ro = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (n, 1))
rd = (rng.standard_normal((n, 3)) * 0.2).astype(np.float32)
rd[:, 2] = -1.0
ro_j, rd_j = jnp.asarray(ro), jnp.asarray(rd)
depth = jnp.asarray(rng.uniform(3.0, 5.0, (n, 1)).astype(np.float32))

for mode in ("uniform", "gaussian"):
    for S in (2, 64):
        t_first = None
        for i, dist in enumerate((0.1, 0.3, 0.5, 1.0)):
            t0 = time.perf_counter()
            if mode == "uniform":
                out = fr.fused_render_around_depth(
                    params, cfg, ro_j, rd_j, depth, n_samples=S, std=dist
                )
            else:
                out = fr.fused_render_gaussian(
                    params, cfg, ro_j, rd_j, depth, 1234, n_samples=S, std=dist
                )
            float(out["rgb_map"][0, 0])
            dt = time.perf_counter() - t0
            if i == 0:
                t_first = dt
            print(
                f"{mode} S={S} dist={dist}: {dt:.2f}s "
                f"cache_size={fr._call._cache_size()}",
                flush=True,
            )
            # distances after the first must hit the compiled kernel: no
            # multi-second Mosaic compile, just dispatch
            if i > 0:
                assert dt < max(2.0, 0.5 * t_first), (
                    f"distance sweep recompiled: {dt:.2f}s vs first {t_first:.2f}s"
                )
print("OK: distance sweeps reuse one compile per (mode, n_samples)")
