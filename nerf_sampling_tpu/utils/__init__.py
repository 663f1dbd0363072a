"""Config tree, YAML loading, metrics logging, misc utilities."""

from nerf_sampling_tpu.utils.config import (
    TrainerConfig,
    load_trainer_config,
    load_obj_from_config,
    override_config,
)
from nerf_sampling_tpu.utils.logging import MetricsLogger

__all__ = [
    "MetricsLogger",
    "TrainerConfig",
    "load_obj_from_config",
    "load_trainer_config",
    "override_config",
]
