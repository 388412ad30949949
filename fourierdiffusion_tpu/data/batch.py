"""Batch pytree passed through the diffusion stack.

Equivalent of the reference's ``DiffusableBatch`` dataclass
(``src/fdiff/utils/dataclasses.py:7-31``), as a JAX-native NamedTuple
pytree so it flows through ``jit`` / ``scan`` / ``shard_map`` unchanged.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

from jax import Array


class DiffusableBatch(NamedTuple):
    X: Array
    y: Optional[Array] = None
    timesteps: Optional[Array] = None

    def __len__(self) -> int:
        return self.X.shape[0]
