"""Volume-rendering engine: jit-compiled, functional, shape-static.

Replaces the reference's trainer-callback inversion
(nerf_utils.py:555/585/708 calling back into the Trainer object) with pure
functions over an explicit parameter bundle.
"""

from nerf_sampling_tpu.render.engine import (
    EvalMode,
    NeRFParams,
    Pipeline,
    RayBatch,
    make_ray_batch,
    query_nerf,
    render_flat_rays,
    render_image,
    render_rays_eval,
    render_rays_train,
    sample_as_in_nerf,
)
from nerf_sampling_tpu.render.path import render_path

__all__ = [
    "EvalMode",
    "NeRFParams",
    "Pipeline",
    "RayBatch",
    "make_ray_batch",
    "query_nerf",
    "render_flat_rays",
    "render_image",
    "render_path",
    "render_rays_eval",
    "render_rays_train",
    "sample_as_in_nerf",
]
