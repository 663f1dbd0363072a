"""Dataset loaders (host-side numpy) for blender / llff / LINEMOD / deepvoxels.

All loaders return a uniform ``SceneData`` record — fixing the reference's
inconsistent 6-vs-7-tuple returns (SURVEY.md §2 defect #2).
"""

from nerf_sampling_tpu.data.types import SceneData
from nerf_sampling_tpu.data.blender import load_blender_data, pose_spherical
from nerf_sampling_tpu.data.example import generate_example_dataset

__all__ = [
    "SceneData",
    "generate_example_dataset",
    "load_blender_data",
    "pose_spherical",
]
