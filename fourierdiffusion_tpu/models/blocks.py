"""Embedding / encoding building blocks for the score networks.

Feature parity with the reference ``src/fdiff/models/transformer.py:8-91``
(``PositionalEncoding``, ``TimeEncoding``, ``GaussianFourierProjection``),
re-designed for JAX:

* torch's ``nn.Embedding(max_norm=...)`` renormalizes rows *in place* at
  lookup; here the renorm is applied functionally at lookup with the
  scale factor stop-gradiented (documented deviation, SURVEY.md §7).
* The Gaussian Fourier projection's frozen random ``W`` lives in a
  separate ``constants`` variable collection so the optimizer never
  touches it (torch keeps it as a ``requires_grad=False`` parameter).
* Initializers match torch semantics (``N(0,1)`` embeddings,
  Kaiming-uniform linear layers) so imported reference checkpoints drop
  into the same structure.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import Array
from jax.typing import DTypeLike

# torch nn.Linear default init: weight/bias ~ U(+-sqrt(1/fan_in)).
torch_linear_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_linear_bias_init(key: Array, shape: tuple, dtype: DTypeLike, fan_in: int) -> Array:
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinear(nn.Module):
    """``nn.Dense`` with torch's default initialization.

    ``dtype=None`` keeps the input's dtype (params are stored fp32 and
    cast to the computation dtype at use, so bf16 activations run bf16
    matmuls on the MXU).
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fan_in = x.shape[-1]
        dtype = self.dtype if self.dtype is not None else x.dtype
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (fan_in, self.features), jnp.float32
        )
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s, d: torch_linear_bias_init(k, s, d, fan_in),
                (self.features,),
                jnp.float32,
            )
            y = y + bias.astype(dtype)
        return y


def _max_norm_renorm(embedding: Array, max_norm: float) -> Array:
    """Scale rows with L2 norm above ``max_norm`` down onto the ball."""
    norms = jnp.linalg.norm(embedding, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norms, 1e-12))
    return embedding * jax.lax.stop_gradient(scale)


class PositionalEncoding(nn.Module):
    """Learnable positional embedding added per position.

    Reference: ``transformer.py:8-29`` — ``nn.Embedding(max_len, d_model,
    max_norm=sqrt(d_model))`` looked up at ``arange(L)`` and broadcast
    over the batch.
    """

    d_model: int
    max_len: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        embedding = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),
            (self.max_len, self.d_model),
            jnp.float32,
        )
        pe = _max_norm_renorm(embedding, math.sqrt(self.d_model))
        return x + pe[None, : x.shape[1], :].astype(x.dtype)


class TimeEncoding(nn.Module):
    """Learnable discrete diffusion-step embedding (legacy path).

    Reference: ``transformer.py:32-60``. Only reachable with non-SDE
    schedulers there (``score_models.py:159-166``); kept for API parity.
    """

    d_model: int
    max_time: int
    use_time_axis: bool = True

    @nn.compact
    def __call__(self, x: Array, timesteps: Array, use_time_axis: bool = True) -> Array:
        embedding = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),
            (self.max_time, self.d_model),
            jnp.float32,
        )
        emb = _max_norm_renorm(embedding, math.sqrt(self.d_model))
        t_emb = emb[timesteps.astype(jnp.int32)]
        if use_time_axis:
            t_emb = t_emb[:, None, :]
        return x + t_emb.astype(x.dtype)


class GaussianFourierProjection(nn.Module):
    """Gaussian random features for continuous diffusion time.

    Reference: ``transformer.py:63-91``: fixed ``W ~ N(0,1) * scale`` of
    size ``(d_model+1)//2`` (non-trainable), features
    ``[sin(2*pi*t*W) || cos(2*pi*t*W)][:d_model]`` through a Linear,
    added to ``x`` (broadcast over the sequence axis when
    ``use_time_axis``).
    """

    d_model: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, x: Array, timesteps: Array, use_time_axis: bool = True) -> Array:
        w = self.variable(
            "constants",
            "W",
            lambda: jax.random.normal(
                self.make_rng("params"), ((self.d_model + 1) // 2,), jnp.float32
            )
            * self.scale,
        ).value
        time_proj = timesteps[:, None].astype(jnp.float32) * w[None, :] * 2.0 * jnp.pi
        emb = jnp.concatenate([jnp.sin(time_proj), jnp.cos(time_proj)], axis=-1)
        t_emb = emb[:, : self.d_model]
        if use_time_axis:
            t_emb = t_emb[:, None, :]
        projected = TorchLinear(self.d_model, dtype=x.dtype, name="dense")(
            t_emb.astype(x.dtype)
        )
        return x + projected
