"""Pure-math core: shape-static jnp functions, no framework state.

Everything here is jit-safe (static shapes, no Python control flow on traced
values) and unit-tested against the reference formulas
(/root/reference/nerf_sampling/nerf_pytorch/run_nerf_helpers.py,
 nerf_utils.py, utils.py, trainers/sampling_trainer.py).
"""

from nerf_sampling_tpu.core.compositing import raw2alpha, raw2outputs
from nerf_sampling_tpu.core.encoding import Embedder, get_embedder, positional_encoding
from nerf_sampling_tpu.core.geometry import (
    find_intersection_points_with_sphere,
    solve_quadratic_equation,
)
from nerf_sampling_tpu.core.losses import (
    alphas_or_weights_loss,
    gaussian_log_likelihood,
    mean_density_loss,
)
from nerf_sampling_tpu.core.metrics import img2mse, mse2psnr, psnr_np, to8b
from nerf_sampling_tpu.core.rays import get_rays, get_rays_np, ndc_rays
from nerf_sampling_tpu.core.sampling import (
    sample_pdf,
    sample_points_around_mean,
    stratified_z_vals,
    z_to_points,
)

__all__ = [
    "Embedder",
    "alphas_or_weights_loss",
    "find_intersection_points_with_sphere",
    "gaussian_log_likelihood",
    "get_embedder",
    "get_rays",
    "get_rays_np",
    "img2mse",
    "mean_density_loss",
    "mse2psnr",
    "ndc_rays",
    "positional_encoding",
    "psnr_np",
    "raw2alpha",
    "raw2outputs",
    "sample_pdf",
    "sample_points_around_mean",
    "solve_quadratic_equation",
    "stratified_z_vals",
    "to8b",
    "z_to_points",
]
