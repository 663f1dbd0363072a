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
    # render_image_sharded allgathers its outputs to full host arrays on
    # every process when the mesh spans processes, so no extra gather here.
    return np.asarray(maps["depth_net_rgb_map"])


N_TRAIN_ITERS = 8


def trainer_config(datadir: str, basedir: str, train_mode: str,
                   steps_per_dispatch: int):
    """The tiny end-to-end Trainer config for the cluster test.

    Shared by the cluster workers (multihost=True) and the in-test
    single-process ground truth (multihost=False) so the two runs differ
    ONLY in process topology. Cadences exercise i_print, i_weights,
    i_testset (incl. keep_best) within N_TRAIN_ITERS steps.
    """
    from nerf_sampling_tpu.utils.config import TrainerConfig

    return TrainerConfig(
        dataset_type="blender", datadir=datadir, basedir=basedir,
        expname=f"mh_{train_mode}", train_mode=train_mode,
        netdepth=2, netwidth=16, netdepth_fine=2, netwidth_fine=16,
        n_layers=2, layer_width=16,
        N_samples=4, N_importance=4, N_rand=32, half_res=False, testskip=1,
        precrop_iters=0, i_print=2, i_weights=4, i_testset=4, i_video=10**9,
        export_torch_ckpt=False, keep_best=True, n_devices=0,
        steps_per_dispatch=steps_per_dispatch, seed=3,
        joint_depth_warmup=2 if train_mode == "joint" else 0,
    )


def run_trainer(out_path: str) -> None:
    """One cluster process of an end-to-end ``Trainer.train`` run.

    argv: out.json trainer <datadir> <basedir> <train_mode> <spd>. The
    REAL production entry point — not the bespoke step harness above —
    runs on the 2-process mesh: multi-host batch feed
    (make_array_from_process_local_data), global sharded eval renders,
    keep_best, and process-0-only artifact writes.
    """
    datadir, basedir, train_mode, spd = sys.argv[3:7]
    from nerf_sampling_tpu.train.trainer import Trainer

    # Per-process basedir: process 0 must populate its tree, process 1
    # must leave its own completely untouched — the write-discipline proof.
    basedir = os.path.join(basedir, f"proc{jax.process_index()}")
    cfg = trainer_config(datadir, basedir, train_mode, int(spd))
    cfg.multihost = True
    t = Trainer(cfg)
    final_psnr = t.train(N_iters=N_TRAIN_ITERS + 1)

    checksum = float(
        sum(
            jnp.sum(jnp.abs(leaf)).item()
            for leaf in jax.tree.leaves(t.params)
        )
    )
    with open(out_path, "w") as fp:
        json.dump(
            {
                "process_id": jax.process_index(),
                "n_processes": jax.process_count(),
                "n_devices": len(jax.devices()),
                "mesh_shape": dict(t.mesh.shape),
                "final_psnr": final_psnr,
                "best_psnr": t._best_psnr,
                "eval_psnr": t._avg_eval_psnr,
                "param_checksum": checksum,
            },
            fp,
        )
    print(
        f"[multihost_smoke trainer p{jax.process_index()}] "
        f"final={final_psnr} best={t._best_psnr}"
    )


def main() -> None:
    out_path = sys.argv[1]
    hybrid = len(sys.argv) > 2 and sys.argv[2] == "hybrid"

    from nerf_sampling_tpu.parallel.ops import maybe_initialize_distributed

    maybe_initialize_distributed(SimpleNamespace(multihost=True))
    assert jax.process_count() > 1, "cluster did not form"

    if len(sys.argv) > 2 and sys.argv[2] == "trainer":
        run_trainer(out_path)
        return

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
