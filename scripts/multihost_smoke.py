"""Multi-host smoke worker: one process of a real jax.distributed cluster.

Exercises the production multi-host wiring
(parallel/ops.py::maybe_initialize_distributed + the sharded train steps)
on a 2-process CPU cluster with 4 virtual devices per process — the same
code path a TPU pod slice takes (per-host jax.distributed.initialize, one
global mesh, jax.make_array_from_process_local_data for the host-local
batch shard, Gloo/ICI collectives inserted by XLA). The reference has no
distributed execution of any kind (SURVEY.md §2: single process, single
device); this is the TPU-native scale-out analog.

Launched by tests/test_multihost.py (2 workers + in-test single-process
ground truth), or by hand:

    JAX_COORDINATOR_ADDRESS=localhost:12360 JAX_NUM_PROCESSES=2 \
    JAX_PROCESS_ID=0 python scripts/multihost_smoke.py /tmp/out0.json &
    JAX_COORDINATOR_ADDRESS=localhost:12360 JAX_NUM_PROCESSES=2 \
    JAX_PROCESS_ID=1 python scripts/multihost_smoke.py /tmp/out1.json
"""

from __future__ import annotations

import json
import os
import sys
from types import SimpleNamespace

# Backend env must be set before jax initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=4"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N_RAYS = 64  # global batch
N_STEPS = 3
RENDER_HW = 16  # multi-host full-image render size


def make_global_batch(p, mesh):
    """Deterministic global ray batch, assembled from process-local rows.

    Every process computes the same full batch with numpy, then
    contributes only its local rows via
    jax.make_array_from_process_local_data — exactly how a pod host feeds
    its shard of a globally-sharded batch.
    """
    from nerf_sampling_tpu.parallel.mesh import ray_sharding
    from nerf_sampling_tpu.render import make_ray_batch

    rng = np.random.default_rng(0)
    ro = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (N_RAYS, 1))
    rd = (rng.standard_normal((N_RAYS, 3)) * 0.2).astype(np.float32)
    rd[:, 2] = -1.0
    target = np.full((N_RAYS, 3), 0.25, np.float32)
    rays = make_ray_batch(p, jnp.asarray(ro), jnp.asarray(rd))

    # axis-generic: P("rays") on the 1-D mesh, P(("dcn","rays")) on the
    # hybrid mesh. DCN-major order keeps each process's rows contiguous,
    # so the local-row slice below is identical in both shapes.
    sh = ray_sharding(mesh)
    nproc = jax.process_count()
    rows = N_RAYS // nproc
    lo = jax.process_index() * rows

    def globalize(leaf):
        if leaf is None:
            return None
        arr = np.asarray(leaf)
        return jax.make_array_from_process_local_data(
            sh, arr[lo : lo + rows], global_shape=arr.shape
        )

    return jax.tree.map(globalize, (rays, target))


def build_setup(hybrid: bool = False):
    """Pipeline + initial state + global mesh + sharded step.

    Shared by the worker and the single-process ground truth in
    tests/test_multihost.py so the two computations are structurally
    identical. With ``hybrid=True`` the mesh is the 2-D [dcn, rays] shape
    (one row per process on the cluster; groups=2 stand-in single-process),
    so the dcn axis genuinely crosses process boundaries in the cluster
    run — the DCN-layout path a multi-host pod takes.
    """
    from jax.sharding import Mesh

    from nerf_sampling_tpu.models import NeRFConfig, nerf_init
    from nerf_sampling_tpu.parallel.mesh import make_hybrid_mesh
    from nerf_sampling_tpu.parallel.ops import make_sharded_nerf_train_step
    from nerf_sampling_tpu.render import NeRFParams, Pipeline
    from nerf_sampling_tpu.train.state import init_state, make_nerf_optimizer

    cfg = NeRFConfig(
        D=3, W=32, input_ch=63, input_ch_views=27, output_ch=5,
        skips=(1,), use_viewdirs=True,
    )
    p = Pipeline(nerf=cfg, fine=cfg, N_samples=8, N_importance=8)
    params = NeRFParams(
        coarse=nerf_init(jax.random.PRNGKey(0), cfg),
        fine=nerf_init(jax.random.PRNGKey(1), cfg),
    )
    opt = make_nerf_optimizer(1e-3, 250)
    state = init_state(params, opt)
    if hybrid:
        mesh = (
            make_hybrid_mesh()
            if jax.process_count() > 1
            else make_hybrid_mesh(groups=2)
        )
    else:
        mesh = Mesh(np.array(jax.devices()), ("rays",))
    step = make_sharded_nerf_train_step(p, opt, mesh)
    return p, state, mesh, step


def render_camera():
    """A fixed tiny camera every process derives identically."""
    from nerf_sampling_tpu.data.blender import pose_spherical

    h = w = RENDER_HW
    focal = 0.5 * w / np.tan(0.35)
    K = np.array(
        [[focal, 0, 0.5 * w], [0, focal, 0.5 * h], [0, 0, 1]], np.float32
    )
    c2w = np.asarray(pose_spherical(30.0, -30.0, 4.0), np.float32)[:3, :4]
    return h, w, K, c2w


def render_sharded(p, params, mesh):
    """Full-image render through the production sharded renderer on the
    (possibly multi-process) global mesh; returns the rgb map as a host
    numpy array on every process (reference analog: the render path,
    nerf_utils.py:258-390 — at scale the embarrassingly-parallel half)."""
    from nerf_sampling_tpu.parallel.render import render_image_sharded
    from nerf_sampling_tpu.render.engine import EvalMode

    h, w, K, c2w = render_camera()
    maps = render_image_sharded(
        p, params, h, w, K, jnp.asarray(c2w), jax.random.PRNGKey(7), mesh,
        mode=EvalMode.FULL_NERF, chunk=256,
    )
    rgb = maps["depth_net_rgb_map"]
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(rgb, tiled=True))
    return np.asarray(rgb)


def main() -> None:
    out_path = sys.argv[1]
    hybrid = len(sys.argv) > 2 and sys.argv[2] == "hybrid"

    from nerf_sampling_tpu.parallel.ops import maybe_initialize_distributed

    maybe_initialize_distributed(SimpleNamespace(multihost=True))
    assert jax.process_count() > 1, "cluster did not form"

    p, state, mesh, step = build_setup(hybrid=hybrid)
    batch = make_global_batch(p, mesh)

    # multi-host full-image render at the (deterministic, process-identical)
    # initial params: the ray batch spans both processes' devices. Rendered
    # BEFORE training so the single-process ground truth can compare
    # pixels sharply (post-training params differ across cluster vs local
    # by fp32 all-reduce ordering).
    rgb = render_sharded(p, state.params, mesh)
    assert np.isfinite(rgb).all()

    losses = []
    for i in range(N_STEPS):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    checksum = float(
        sum(jnp.sum(jnp.abs(leaf)) for leaf in jax.tree.leaves(state.params))
    )

    # and once more with the TRAINED params (cross-worker agreement +
    # finiteness; not compared against the local run — see above)
    rgb_trained = render_sharded(p, state.params, mesh)
    assert np.isfinite(rgb_trained).all()

    with open(out_path, "w") as fp:
        json.dump(
            {
                "process_id": jax.process_index(),
                "n_processes": jax.process_count(),
                "n_devices": len(jax.devices()),
                "mesh_shape": dict(mesh.shape),
                "losses": losses,
                "param_checksum": checksum,
                "render_rgb": np.asarray(rgb, np.float64).reshape(-1).tolist(),
                "render_rgb_trained": np.asarray(
                    rgb_trained, np.float64
                ).reshape(-1).tolist(),
            },
            fp,
        )
    print(f"[multihost_smoke p{jax.process_index()}] losses={losses}")


if __name__ == "__main__":
    main()
