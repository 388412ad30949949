"""Multi-host (DCN) support: ``jax.distributed`` initialization + helpers.

The reference is strictly single-process (SURVEY.md §2, "Parallelism &
communication"); this is new TPU-native capability per SURVEY.md §5
item 8: ICI carries the in-mesh collectives that XLA inserts, and DCN
only carries the multi-controller coordination — one ``fdiff-train``
process per host, each seeing its local chips, with one global mesh
spanning all of them.

Usage (documented in README): launch the same command on every host::

    FDIFF_COORDINATOR_ADDRESS=host0:8476 \
    FDIFF_NUM_PROCESSES=2 FDIFF_PROCESS_ID=<i> \
    fdiff-train datamodule=ecg ...

On Cloud TPU pods the three variables can be omitted —
``jax.distributed.initialize()`` auto-discovers the topology.

Design notes for the trainer under multi-controller SPMD:

* every process runs the identical program on identical (seeded) host
  data; global arrays are formed with
  ``jax.make_array_from_process_local_data``;
* fully-replicated outputs (losses) are readable with ``float()`` on
  every process; batch-sharded outputs (samples) are gathered with
  ``process_allgather`` before touching numpy;
* host-side artifacts (checkpoints, metrics, wandb) are written by the
  primary process only.
"""

from __future__ import annotations

import logging
import os
from typing import Any

import jax
import numpy as np
from jax.sharding import NamedSharding

logger = logging.getLogger(__name__)

_ENV_ADDRESS = "FDIFF_COORDINATOR_ADDRESS"
_ENV_NUM = "FDIFF_NUM_PROCESSES"
_ENV_ID = "FDIFF_PROCESS_ID"


def maybe_initialize_distributed() -> bool:
    """Initialize ``jax.distributed`` when multi-host env vars are set.

    Must run before any other JAX call (backend initialization). Returns
    True when a multi-process runtime was initialized.
    """
    address = os.environ.get(_ENV_ADDRESS)
    num = os.environ.get(_ENV_NUM)
    if address is None and num is None:
        return False
    kwargs: dict[str, Any] = {}
    if address is not None:
        kwargs["coordinator_address"] = address
    if num is not None:
        kwargs["num_processes"] = int(num)
    if _ENV_ID in os.environ:
        kwargs["process_id"] = int(os.environ[_ENV_ID])
    jax.distributed.initialize(**kwargs)
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def is_primary() -> bool:
    """True on the process that owns host-side artifacts (logs, ckpts)."""
    return jax.process_index() == 0


def replicate_to_mesh(tree: Any, sharding: NamedSharding) -> Any:
    """Place a host pytree onto the mesh fully replicated.

    Single-process: plain ``device_put``. Multi-process: every process
    contributes its full local copy via
    ``make_array_from_process_local_data`` (the data must be identical
    across processes — guaranteed here because datasets and init are
    derived from the shared config seed).
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, np.asarray(a)
        ),
        tree,
    )


def gather_to_host(x: Any) -> np.ndarray:
    """Fetch a (possibly cross-process-sharded) array to host numpy."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def host_local_copy(tree: Any) -> Any:
    """Fully-replicated global pytree -> host numpy pytree (any process).

    Used by checkpointing under multi-controller: replicated global
    arrays are not ``fully_addressable``, but each process holds a
    complete shard."""

    def leaf(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            return np.asarray(a.addressable_data(0))
        return np.asarray(a)

    return jax.tree_util.tree_map(leaf, tree)
