"""Pallas TPU kernels for the hot ops.

Why these exist (perf analysis on TPU v5e, see bench.py):
- The XLA fp32 path is compute-bound (~16 effective TFLOPS with HIGHEST-
  precision matmuls). Switching the MLP to bf16 MXU math makes it
  HBM-bound instead: each of the 8 trunk layers round-trips [N, 256]
  activations through HBM between dots.
- The fused kernel keeps all weights AND inter-layer activations in VMEM:
  one HBM read of the embedded points per tile, one HBM write of the
  [N, 4] raw output. bf16 compute, fp32 accumulation.

Every kernel ships with the jnp implementation as its reference; the jnp
path remains the fallback (CPU tests run the kernels in interpret mode).
"""

from nerf_sampling_tpu.kernels.fused_nerf import (
    fused_nerf_apply,
    pack_nerf_params,
)
from nerf_sampling_tpu.kernels.fused_depth_net import (
    fused_depth_net_apply,
    pack_depth_net_params,
)

__all__ = [
    "fused_depth_net_apply",
    "fused_nerf_apply",
    "pack_depth_net_params",
    "pack_nerf_params",
]
