"""Time each XLA piece of the vanilla train step at [1024, 64/128/192]."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/nerf_sampling_tpu_jax")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from nerf_sampling_tpu.core.compositing import raw2outputs
from nerf_sampling_tpu.core.sampling import (
    merge_sorted,
    sample_pdf,
    sorted_uniform,
    stratified_z_vals,
)

N, SC, SI = 1024, 64, 128
rng = np.random.default_rng(0)


def timeit(fn, *a, reps=30):
    out = fn(*a)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    key = jax.random.PRNGKey(0)
    near = jnp.full((N, 1), 2.0)
    far = jnp.full((N, 1), 6.0)
    bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, SC - 1), (N, SC - 1))
    w = jnp.asarray(rng.uniform(0.01, 1, (N, SC - 2)).astype(np.float32))
    raw = jnp.asarray(rng.standard_normal((N, SC + SI, 4)).astype(np.float32))
    z_union = jnp.sort(jnp.asarray(rng.uniform(2, 6, (N, SC + SI)).astype(np.float32)), -1)
    rd = jnp.asarray(rng.uniform(-0.3, 0.3, (N, 3)).astype(np.float32))
    a_sorted = jnp.sort(jnp.asarray(rng.uniform(2, 6, (N, SC)).astype(np.float32)), -1)
    b_sorted = jnp.sort(jnp.asarray(rng.uniform(2, 6, (N, SI)).astype(np.float32)), -1)

    print(f"stratified(perturb=1): {timeit(jax.jit(lambda k: stratified_z_vals(near, far, SC, key=k, perturb=1.0)), key):.2f} ms", flush=True)
    print(f"sorted_uniform: {timeit(jax.jit(lambda k: sorted_uniform(k, (N, SI))), key):.2f} ms", flush=True)
    print(f"sample_pdf (vmapped searchsorted): {timeit(jax.jit(lambda k: sample_pdf(bins, w, SI, key=k)), key):.2f} ms", flush=True)
    print(f"merge_sorted: {timeit(jax.jit(merge_sorted), a_sorted, b_sorted):.2f} ms", flush=True)
    print(f"jnp.sort(concat): {timeit(jax.jit(lambda a, b: jnp.sort(jnp.concatenate([a, b], -1), -1)), a_sorted, b_sorted):.2f} ms", flush=True)
    print(f"raw2outputs fwd: {timeit(jax.jit(lambda r: raw2outputs(r, z_union, rd, 0.0, True)), raw):.2f} ms", flush=True)
    g = jax.jit(jax.grad(lambda r: jnp.sum(raw2outputs(r, z_union, rd, 0.0, True).rgb_map)))
    print(f"raw2outputs grad: {timeit(g, raw):.2f} ms", flush=True)

    # searchsorted method comparison
    cdf = jnp.concatenate([jnp.zeros((N, 1)), jnp.cumsum(w / jnp.sum(w, -1, keepdims=True), -1)], -1)
    u = jax.random.uniform(key, (N, SI))
    for method in ("scan", "scan_unrolled", "compare_all"):
        try:
            f = jax.jit(lambda c, uu, m=method: jax.vmap(
                lambda cc, uuu: jnp.searchsorted(cc, uuu, side="right", method=m)
            )(c, uu))
            print(f"searchsorted[{method}]: {timeit(f, cdf, u):.2f} ms", flush=True)
        except Exception as e:
            print(f"searchsorted[{method}]: FAIL {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
