"""Device mesh + sharding helpers.

The reference has no distributed execution at all (SURVEY.md §2,
"Parallelism & communication"); this module is the new TPU-native
capability: a 1-D ``data`` mesh over ICI for data-parallel training and
sharded sampling chains. XLA inserts the gradient all-reduce; no
explicit communication backend exists or is needed.

Models here are small (d_model 72, <= 10 layers) so tensor/pipeline/
sequence/expert parallelism have no workload and are explicitly out of
scope (SURVEY.md §5 items 7-8); the mesh abstraction keeps an ``axis_names``
extension point for them.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def auto_data_mesh(batch_size: Optional[int] = None) -> Optional[Mesh]:
    """The mesh the CLIs/trainer use: a 1-D ``data`` mesh over all
    visible devices, or ``None`` when there is a single device (or the
    batch size does not divide the device count, which would leave
    ragged shards)."""
    n_dev = len(jax.devices())
    if n_dev < 2:
        return None
    if batch_size is not None and batch_size % n_dev != 0:
        return None
    return make_mesh()


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    """1-D mesh over the first ``n_devices`` visible devices."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devices)} visible"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dim sharding: leading axis split over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Place a host batch onto the mesh, sharded over the leading axis."""
    return jax.device_put(batch, data_sharding(mesh, axis_name))
