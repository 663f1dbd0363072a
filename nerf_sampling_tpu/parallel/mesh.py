"""Device mesh + sharding helpers.

One logical axis, ``rays``: both rendering and training parallelize over the
ray batch (per-ray compute is independent; parameters are replicated). On a
multi-host pod the same mesh spans all devices and the ray axis rides ICI.

For multi-host pods connected over data-center network (DCN), use
``make_hybrid_mesh``: a [hosts, devices-per-host] mesh with axes
``("dcn", "rays")``. The ray batch shards over BOTH axes (DCN-major), so
neighbouring shards of the leading dim live on the same host and XLA's
gradient all-reduce decomposes hierarchically — a fast all-reduce inside
each host's ICI ring, then one small cross-host phase over DCN — instead of
a flat ring that straddles the slow link once per hop. All sharding helpers
below are axis-name generic, so the train/render entry points work on
either mesh shape unchanged.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"
DCN_AXIS = "dcn"


def make_mesh(devices: Sequence[jax.Device] | None = None) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (RAY_AXIS,))


def make_hybrid_mesh(
    devices: Sequence[jax.Device] | None = None,
    *,
    groups: int | None = None,
) -> Mesh:
    """2-D [dcn, rays] mesh with same-host devices contiguous on ``rays``.

    Devices are grouped by ``process_index`` (one row per host), so the
    ``rays`` axis is ICI-local and the ``dcn`` axis crosses hosts. With
    ``groups`` given (single-process testing), the flat device list is
    instead split into that many equal rows.
    """
    import numpy as np

    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if groups is None:
        by_proc: dict[int, list[jax.Device]] = {}
        for d in devices:
            by_proc.setdefault(d.process_index, []).append(d)
        rows = [by_proc[p] for p in sorted(by_proc)]
    else:
        if len(devices) % groups:
            raise ValueError(
                f"{len(devices)} devices not divisible into {groups} groups"
            )
        per = len(devices) // groups
        rows = [devices[i * per : (i + 1) * per] for i in range(groups)]
    width = len(rows[0])
    if any(len(r) != width for r in rows):
        raise ValueError("hosts expose unequal device counts; pass groups=")
    return Mesh(np.asarray(rows), (DCN_AXIS, RAY_AXIS))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) dimension across the whole mesh.

    On the 1-D mesh this is P("rays"); on a hybrid mesh the leading dim
    shards over ("dcn", "rays") jointly — DCN-major, so consecutive shards
    stay host-local.
    """
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ray_batch(mesh: Mesh, tree: Any) -> Any:
    """Place a ray-batch pytree with its leading dim sharded over the mesh."""
    sharding = ray_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
