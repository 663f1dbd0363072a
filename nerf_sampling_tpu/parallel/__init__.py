"""Multi-chip scaling: mesh construction + GSPMD shardings.

The reference is strictly single-device; its only scale mechanism is memory
chunking (SURVEY.md §2). Here rendering and training shard the ray batch
across chips (rendering is embarrassingly parallel per ray) with replicated
parameters; XLA inserts the gradient all-reduce over ICI automatically.
"""

from nerf_sampling_tpu.parallel.mesh import (
    make_hybrid_mesh,
    make_mesh,
    ray_sharding,
    replicated_sharding,
    shard_ray_batch,
)
from nerf_sampling_tpu.parallel.ops import (
    make_sharded_eval,
    make_sharded_depth_train_step,
    make_sharded_joint_train_step,
    make_sharded_nerf_train_step,
    maybe_initialize_distributed,
)
from nerf_sampling_tpu.parallel.render import render_image_sharded

__all__ = [
    "make_hybrid_mesh",
    "make_mesh",
    "make_sharded_depth_train_step",
    "make_sharded_eval",
    "make_sharded_joint_train_step",
    "make_sharded_nerf_train_step",
    "maybe_initialize_distributed",
    "ray_sharding",
    "render_image_sharded",
    "replicated_sharding",
    "shard_ray_batch",
]
