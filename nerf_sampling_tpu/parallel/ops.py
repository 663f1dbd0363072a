"""GSPMD-sharded render / train entry points.

Design (scaling-book recipe): annotate input shardings — ray batch split on
the ``rays`` axis, parameters replicated — and let XLA insert the
collectives. The mean-reduction losses make the gradient all-reduce a psum
over ICI that XLA emits automatically; no hand-written collectives needed
for data parallelism at this model size (~2M params replicated).
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import Mesh

from nerf_sampling_tpu.parallel.mesh import ray_sharding, replicated_sharding
from nerf_sampling_tpu.render.engine import (
    EvalMode,
    Pipeline,
    render_rays_eval,
)
from nerf_sampling_tpu.train.steps import (
    make_depth_net_train_step,
    make_nerf_train_step,
)


def make_sharded_eval(
    pipeline: Pipeline, mesh: Mesh, mode: EvalMode = EvalMode.DEPTH_NET
) -> Callable:
    """jit(render_rays_eval) with rays sharded / params replicated.

    The returned fn takes (params, rays: RayBatch, key) with the ray batch's
    leading dim divisible by the mesh size.
    """
    rs, rep = ray_sharding(mesh), replicated_sharding(mesh)

    def eval_fn(params, rays, key):
        return render_rays_eval(pipeline, params, rays, key, mode)

    return jax.jit(
        eval_fn,
        in_shardings=(rep, rs, rep),
        out_shardings=rs,
    )


def make_sharded_depth_train_step(
    pipeline: Pipeline, optimizer: optax.GradientTransformation, mesh: Mesh
) -> Callable:
    """Data-parallel depth-net train step: batch sharded, states replicated."""
    rs, rep = ray_sharding(mesh), replicated_sharding(mesh)
    step = make_depth_net_train_step(pipeline, optimizer)
    # step is already jitted; re-jit with shardings (nested jit collapses).
    # batch is the packed [N, 9] ray array, sharded on rays.
    return jax.jit(
        step,
        in_shardings=(rep, rep, rs, rep),
        out_shardings=(rep, rep),
        donate_argnums=(1,),
    )


def make_sharded_nerf_train_step(
    pipeline: Pipeline, optimizer: optax.GradientTransformation, mesh: Mesh
) -> Callable:
    """Data-parallel vanilla NeRF train step."""
    rs, rep = ray_sharding(mesh), replicated_sharding(mesh)
    step = make_nerf_train_step(pipeline, optimizer)
    return jax.jit(
        step,
        in_shardings=(rep, rs, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_sharded_joint_train_step(
    pipeline: Pipeline,
    nerf_optimizer: optax.GradientTransformation,
    depth_optimizer: optax.GradientTransformation,
    mesh: Mesh,
) -> Callable:
    """Data-parallel joint NeRF+DepthNet train step."""
    from nerf_sampling_tpu.train.steps import make_joint_train_step

    rs, rep = ray_sharding(mesh), replicated_sharding(mesh)
    step = make_joint_train_step(pipeline, nerf_optimizer, depth_optimizer)
    return jax.jit(
        step,
        in_shardings=(rep, rep, rs, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )


def maybe_initialize_distributed(cfg) -> None:
    """Multi-host wiring: call jax.distributed.initialize when configured.

    The reference is single-process (SURVEY.md §2); here a multi-host pod
    run sets ``multihost=True`` and every host joins the same mesh before
    Trainer.train builds it. Cluster parameters come from
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when set
    (manual launch — jax's no-arg initialize only auto-detects managed
    clusters like SLURM/OMPI/TPU pods), else jax auto-detection. Safe
    no-op on single-host setups. Exercised by the real 2-process CPU
    cluster in tests/test_multihost.py.
    """
    if not getattr(cfg, "multihost", False):
        return
    import os as _os

    import jax as _jax

    if _jax.distributed.is_initialized():
        return  # idempotent: a launcher may have formed the cluster already

    names = ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
    vals = {n: _os.environ.get(n) for n in names}
    set_vars = [n for n, v in vals.items() if v]
    if set_vars and len(set_vars) != len(names):
        missing = sorted(set(names) - set(set_vars))
        raise ValueError(
            "multihost=True with a partial manual cluster spec: "
            f"{set_vars} set but {missing} missing/empty — set all three "
            "or none (none = managed-cluster auto-detection)"
        )
    if set_vars:
        _jax.distributed.initialize(
            coordinator_address=vals["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(vals["JAX_NUM_PROCESSES"]),
            process_id=int(vals["JAX_PROCESS_ID"]),
        )
    else:
        _jax.distributed.initialize()  # managed-cluster auto-detection
