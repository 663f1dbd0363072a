"""Mesh-sharded full-image rendering.

Rendering is embarrassingly parallel per ray, so the sharded renderer is a
``jax.shard_map`` of the single-device unit of work
(render.engine.render_flat_rays) over the ``rays`` mesh axis: each device
runs the SAME code — fused Pallas fast paths included — on its ray shard
with replicated parameters; there are no cross-device collectives at all.
On a multi-host pod the same shard_map spans all hosts' devices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nerf_sampling_tpu.render.engine import (
    EvalMode,
    NeRFParams,
    Pipeline,
    render_flat_rays,
)
from nerf_sampling_tpu.core.rays import get_rays


def render_image_sharded(
    pipeline: Pipeline,
    params: NeRFParams,
    H: int,
    W: int,
    K,
    c2w,
    key: jax.Array,
    mesh: Mesh,
    mode: EvalMode = EvalMode.DEPTH_NET,
    chunk: int = 1024 * 32,
    full_outputs: bool = False,
) -> dict[str, jnp.ndarray]:
    """render_image with the ray batch sharded across ``mesh``.

    Pads H*W up to a multiple of the mesh size, splits rays evenly, runs
    render_flat_rays per device (each device folds its mesh index into the
    PRNG key so stochastic draws differ per shard), and reassembles the
    [H, W, ...] maps.
    """
    n_dev = mesh.devices.size
    rays_o, rays_d = get_rays(H, W, K, c2w)
    ro = rays_o.reshape(-1, 3)
    rd = rays_d.reshape(-1, 3)
    n = ro.shape[0]
    pad = (-n) % n_dev
    if pad:
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)], 0)
        rd = jnp.concatenate(
            [rd, jnp.tile(jnp.array([[0.0, 0.0, -1.0]], rd.dtype), (pad, 1))], 0
        )
    if jax.process_count() > 1:
        # On a multi-process mesh a locally-committed device array cannot be
        # auto-resharded onto non-addressable devices; hand jit host numpy
        # instead (identical on every process — rays are a pure function of
        # the camera), which each process shards onto its addressable
        # devices without communication.
        import numpy as np

        ro, rd = np.asarray(ro), np.asarray(rd)
    focal = float(K[0][0])

    axes = tuple(mesh.axis_names)  # ("rays",) or ("dcn", "rays")

    def shard_fn(prm, ro_s, rd_s, k):
        # Linear shard index over however many mesh axes there are, so each
        # shard's stochastic draws differ on hybrid meshes too.
        idx = jax.lax.axis_index(axes[0])
        for ax in axes[1:]:
            idx = idx * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
        k = jax.random.fold_in(k, idx)
        return render_flat_rays(
            pipeline, prm, ro_s, rd_s, k,
            mode=mode, chunk=chunk, full_outputs=full_outputs,
            H=H, W=W, focal=focal,
        )

    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(axes), P(axes), P()),
            out_specs=P(axes),
        )
    )
    flat = fn(params, ro, rd, key)
    if jax.process_count() > 1:
        # The outputs are globally ray-sharded: no process can np.asarray
        # them directly (non-addressable shards). Gather them to host numpy
        # on EVERY process — one DCN all-gather per map at eval cadence —
        # so downstream consumers (render_path's PSNR/PNG/psnr.txt, the
        # Trainer's keep_best decision) see the full image everywhere and
        # stay byte-identical across hosts.
        from jax.experimental import multihost_utils

        flat = {
            name: multihost_utils.process_allgather(v, tiled=True)
            for name, v in flat.items()
        }
    return {
        name: v[:n].reshape(H, W, *v.shape[1:]) for name, v in flat.items()
    }
