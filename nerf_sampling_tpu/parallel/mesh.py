"""Device mesh + sharding helpers.

One logical axis, ``rays``: both rendering and training parallelize over the
ray batch (per-ray compute is independent; parameters are replicated). On a
multi-host pod the same mesh spans all devices and the ray axis rides ICI.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(devices: Sequence[jax.Device] | None = None) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (RAY_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) dimension across the mesh."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ray_batch(mesh: Mesh, tree: Any) -> Any:
    """Place a ray-batch pytree with its leading dim sharded over the mesh."""
    sharding = ray_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
