"""Training: optax states, jitted steps, host ray sampling, checkpoints, loop."""

from nerf_sampling_tpu.train.state import (
    TrainState,
    make_depth_optimizer,
    make_nerf_optimizer,
    nerf_lr_schedule,
)
from nerf_sampling_tpu.train.steps import (
    make_depth_net_train_step,
    make_multi_step,
    make_nerf_train_step,
)
from nerf_sampling_tpu.train.sampler import RaySampler, SamplerConfig
from nerf_sampling_tpu.train.checkpoint import (
    export_torch_checkpoint,
    find_checkpoints,
    import_torch_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from nerf_sampling_tpu.train.trainer import Trainer

__all__ = [
    "RaySampler",
    "SamplerConfig",
    "TrainState",
    "Trainer",
    "export_torch_checkpoint",
    "find_checkpoints",
    "import_torch_checkpoint",
    "load_checkpoint",
    "make_depth_net_train_step",
    "make_depth_optimizer",
    "make_nerf_optimizer",
    "make_multi_step",
    "make_nerf_train_step",
    "nerf_lr_schedule",
    "save_checkpoint",
]
