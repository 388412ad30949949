"""Exact 1-D Wasserstein-2 distances, vectorized.

The reference computes each projection's W2 with a separate
``ot.emd2_1d`` call in a Python loop (``wasserstein.py:162-199``; 1000
POT calls per metric per domain). For uniformly-weighted empirical
distributions the exact 1-D W2 has a closed form through the quantile
functions:

    W2(P, Q)^2 = int_0^1 (F^-1(u) - G^-1(u))^2 du

where both inverse CDFs are piecewise constant with breakpoints at
``i/n`` and ``j/m``. We evaluate the integral exactly on the merged
breakpoint grid — one batched ``sort`` + gather over *all* projections
at once (SURVEY.md §7 "Exact 1-D W2 at scale"). For ``n == m`` this
reduces to ``mean((sort(x) - sort(y))^2)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.typing import ArrayLike


@functools.lru_cache(maxsize=32)
def _quantile_grid(n: int, m: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Segment weights + per-distribution indices on the merged grid."""
    levels = np.sort(
        np.concatenate([np.arange(1, n) / n, np.arange(1, m) / m])
    )
    bounds = np.concatenate([[0.0], levels, [1.0]])
    deltas = np.diff(bounds).astype(np.float32)
    mids = (bounds[:-1] + bounds[1:]) / 2
    ix = np.minimum((mids * n).astype(np.int32), n - 1)
    iy = np.minimum((mids * m).astype(np.int32), m - 1)
    return deltas, ix, iy


@functools.partial(jax.jit, static_argnames=())
def _w2_equal(x: Array, y: Array) -> Array:
    xs = jnp.sort(x, axis=-1)
    ys = jnp.sort(y, axis=-1)
    return jnp.sqrt(jnp.mean((xs - ys) ** 2, axis=-1))


def w2_1d(x: Array, y: Array) -> Array:
    """Exact W2 between rows of ``x (…, n)`` and ``y (…, m)``."""
    n, m = x.shape[-1], y.shape[-1]
    if n == m:
        return _w2_equal(x, y)
    deltas, ix, iy = _quantile_grid(n, m)

    @jax.jit
    def compute(x, y):
        xs = jnp.sort(x, axis=-1)[..., ix]
        ys = jnp.sort(y, axis=-1)[..., iy]
        return jnp.sqrt(jnp.sum((xs - ys) ** 2 * deltas, axis=-1))

    return compute(x, y)


def random_directions(dim: int, n_directions: int, seed: int | None) -> np.ndarray:
    """Unit vectors drawn like the reference (``wasserstein.py:42-77``):
    sequential ``default_rng(seed).normal(size=dim)`` draws, normalized —
    bit-identical directions for a given seed."""
    rng = np.random.default_rng(seed)
    dirs = np.empty((n_directions, dim), dtype=np.float64)
    for i in range(n_directions):
        v = rng.normal(size=dim)
        dirs[i] = v / np.linalg.norm(v)
    return dirs.astype(np.float32)


def _normalise(proj_orig: Array, proj_other: Array, normalisation: str):
    """Per-projection normalisation (reference ``wasserstein.py:152-160``):
    both sides divided by the std of the *original* projection."""
    if normalisation == "none":
        return proj_orig, proj_other
    if normalisation == "standardise":
        sd = jnp.std(proj_orig, axis=-1, keepdims=True)
        return proj_orig / sd, proj_other / sd
    raise ValueError(f"Unrecognised normalisation type: {normalisation}")


def sliced_w2(
    original: np.ndarray | Array,
    other: np.ndarray | Array,
    *,
    num_directions: int,
    seed: int | None,
    normalisation: str = "none",
) -> np.ndarray:
    """W2 along ``num_directions`` random unit projections.

    One ``(n, d) @ (d, k)`` matmul projects everything, then a single
    batched sort computes all distances.
    """
    original = jnp.asarray(original, jnp.float32)
    other = jnp.asarray(other, jnp.float32)
    dirs = jnp.asarray(random_directions(original.shape[1], num_directions, seed))
    proj_orig = (original @ dirs.T).T  # (k, n)
    proj_other = (other @ dirs.T).T  # (k, m)
    proj_orig, proj_other = _normalise(proj_orig, proj_other, normalisation)
    return np.asarray(w2_1d(proj_orig, proj_other))


def marginal_w2(
    original: np.ndarray | Array,
    other: np.ndarray | Array,
    normalisation: str = "none",
) -> np.ndarray:
    """W2 along every standard basis direction (per flattened feature)."""
    original = jnp.asarray(original, jnp.float32)
    other = jnp.asarray(other, jnp.float32)
    proj_orig, proj_other = _normalise(original.T, other.T, normalisation)
    return np.asarray(w2_1d(proj_orig, proj_other))


def check_flat_array(x: ArrayLike) -> np.ndarray:
    """Coerce to a 2-D ``(n, features)`` numpy array
    (reference ``tensors.py:5-22``)."""
    x = np.asarray(x)
    if x.ndim > 2:
        x = x.reshape(x.shape[0], -1)
    assert x.ndim == 2, f"expected a 2d array, got {x.ndim}d"
    return x
