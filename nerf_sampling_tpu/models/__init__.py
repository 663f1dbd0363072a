"""Models as parameter pytrees + pure apply functions.

No module objects, no implicit state: ``init`` builds a pytree of
``{"weight": [in, out], "bias": [out]}`` leaves, ``apply`` is a pure function
of (params, inputs). This keeps the torch-checkpoint name mapping trivial
(torch stores [out, in]; transpose on import) and lets the Pallas kernels
consume stacked weight tensors directly.
"""

from nerf_sampling_tpu.models.nerf import (
    NeRFConfig,
    nerf_apply,
    nerf_init,
    nerf_init_active,
)
from nerf_sampling_tpu.models.depth_net import (
    DepthNetConfig,
    depth_net_apply,
    depth_net_init,
)

__all__ = [
    "DepthNetConfig",
    "NeRFConfig",
    "depth_net_apply",
    "depth_net_init",
    "nerf_apply",
    "nerf_init",
    "nerf_init_active",
]
