"""Unidirectional LSTM backbone as a ``lax.scan`` kernel.

Torch-semantics LSTM (gate order i, f, g, o; two bias vectors) matching
``nn.LSTM(d_model, d_model, batch_first=True)`` as used by the
reference's ``LSTMScoreModule`` backbone (``score_models.py:269-283``).

TPU-first re-design: the input projection ``x @ W_ih^T`` for *all*
timesteps is hoisted out of the recurrence into one large MXU matmul;
the ``lax.scan`` body only carries the ``(B, 4H)`` hidden projection —
the minimal sequential work the recurrence truly requires (SURVEY.md §7
"LSTM throughput on TPU").
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn
from typing import Callable

from jax import Array


def lstm_uniform_init(hidden: int) -> Callable:
    bound = 1.0 / math.sqrt(hidden)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LSTMLayer(nn.Module):
    """One torch-layout LSTM layer: ``(B, L, D) -> (B, L, H)``."""

    hidden_size: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, l, d = x.shape
        h = self.hidden_size
        init = lstm_uniform_init(h)
        w_ih = self.param("w_ih", init, (4 * h, d), jnp.float32)
        w_hh = self.param("w_hh", init, (4 * h, h), jnp.float32)
        b_ih = self.param("b_ih", init, (4 * h,), jnp.float32)
        b_hh = self.param("b_hh", init, (4 * h,), jnp.float32)

        # Hoist the input projection out of the recurrence: one
        # (B*L, D) @ (D, 4H) MXU matmul instead of L small ones.
        x_proj = (
            jnp.einsum("bld,gd->blg", x, w_ih.astype(x.dtype)) + (b_ih + b_hh)
        ).astype(x.dtype)
        w_hh_t = w_hh.T.astype(x.dtype)  # (H, 4H)

        def cell(carry, xp):
            h_prev, c_prev = carry
            gates = xp + h_prev @ w_hh_t  # (B, 4H)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c_prev + i * g
            h_new = o * jnp.tanh(c)
            return (h_new, c), h_new

        h0 = jnp.zeros((b, h), x.dtype)
        c0 = jnp.zeros((b, h), x.dtype)
        # scan over the time axis: (L, B, 4H)
        _, ys = jax.lax.scan(cell, (h0, c0), jnp.swapaxes(x_proj, 0, 1))
        return jnp.swapaxes(ys, 0, 1)
