"""nerf_sampling_tpu — a TPU-native (JAX/XLA/Pallas/pjit) NeRF + DepthNet framework.

A from-scratch rebuild of the capabilities of MarcinKadziolka/nerf-sampling
(reference mounted at /root/reference): hierarchical NeRF volume rendering with
a DepthNet that replaces the 64-query coarse sampling stage by a single
one-pass depth prediction per ray.

Architecture (functional core, explicit state — no trainer-object callback
inversion, cf. reference nerf_sampling/nerf_pytorch/nerf_utils.py:555-708):

- ``core``     pure jnp math: rays, positional encoding, sphere geometry,
               stratified/PDF sampling, alpha compositing, losses, metrics.
- ``models``   NeRF MLP and DepthNet as parameter pytrees + apply functions.
- ``render``   jit-compiled volume-rendering engine (train + 4 eval modes).
- ``data``     blender / llff / LINEMOD / deepvoxels loaders (numpy, host side).
- ``train``    optax train states, train steps, loops, checkpointing
               (orbax-style msgpack + torch-``.tar`` interop).
- ``kernels``  Pallas TPU kernels for the hot ops (fused PE+MLP, compositing).
- ``parallel`` mesh construction and GSPMD shardings (rays data-parallel).
- ``utils``    config tree, YAML loading, metrics logging, misc.
- ``experiments`` CLI entry points mirroring the reference run/render/study/plot.
"""

__version__ = "0.1.0"
