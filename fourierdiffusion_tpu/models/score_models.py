"""Score networks (transformer / MLP / LSTM backbones).

Feature parity with the reference ``src/fdiff/models/score_models.py``:

* ``ScoreTransformer`` == ``ScoreModule`` (``score_models.py:22-166``):
  Linear channel embed -> learned positional embedding -> Gaussian
  Fourier time projection -> ``TransformerEncoder`` -> Linear unembed.
* ``ScoreMLP`` == ``MLPScoreModule`` (``score_models.py:169-246``):
  flattens ``(L, C)``, residual MLP blocks (Linear d->d_mlp, ReLU,
  dropout, Linear d_mlp->d, dropout — the torchvision ``MLP`` layout),
  time encoding without a sequence axis.
* ``ScoreLSTM`` == ``LSTMScoreModule`` (``score_models.py:249-317``):
  residual unidirectional LSTM blocks, no positional encoder.

The Lightning-module responsibilities (loss binding, optimizers,
logging) live in ``fourierdiffusion_tpu.training``; these are pure
function approximators: ``apply(variables, x, timesteps) -> score``.
``dtype`` selects the computation precision (params stay fp32; bf16 on
the MXU per the north star), with the unembedded score cast back to the
input dtype so targets remain fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn
from jax import Array

from fourierdiffusion_tpu.models.blocks import (
    GaussianFourierProjection,
    PositionalEncoding,
    TorchLinear,
)
from fourierdiffusion_tpu.models.lstm import LSTMLayer
from fourierdiffusion_tpu.models.transformer import TransformerEncoder


class ScoreTransformer(nn.Module):
    """Default transformer score network (reference defaults: d_model=72,
    num_layers=10, n_head=12 via ``cmd/conf/score_model/default.yaml``)."""

    n_channels: int
    max_len: int
    d_model: int = 72
    num_layers: int = 10
    n_head: int = 12
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: Array, timesteps: Array, deterministic: bool = True) -> Array:
        assert x.shape[1:] == (self.max_len, self.n_channels), (
            f"X has wrong shape, expected (*, {self.max_len}, {self.n_channels}), "
            f"got {x.shape}"
        )
        assert timesteps.shape[0] == x.shape[0]
        in_dtype = x.dtype
        x = x.astype(self.dtype)
        x = TorchLinear(self.d_model, name="embedder")(x)
        x = PositionalEncoding(self.d_model, self.max_len, name="pos_encoder")(x)
        x = GaussianFourierProjection(self.d_model, name="time_encoder")(
            x, timesteps, use_time_axis=True
        )
        x = TransformerEncoder(
            d_model=self.d_model,
            n_head=self.n_head,
            dim_feedforward=self.dim_feedforward,
            num_layers=self.num_layers,
            dropout_rate=self.dropout_rate,
            use_pallas=self.use_pallas,
            name="backbone",
        )(x, deterministic=deterministic)
        x = TorchLinear(self.n_channels, name="unembedder")(x)
        return x.astype(in_dtype)


class _MLPBlock(nn.Module):
    """torchvision ``MLP(d, [d_mlp, d], dropout)``: no final activation."""

    d_model: int
    d_mlp: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        h = TorchLinear(self.d_mlp, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, name="drop1")(h, deterministic=deterministic)
        h = TorchLinear(self.d_model, name="fc2")(h)
        h = nn.Dropout(self.dropout_rate, name="drop2")(h, deterministic=deterministic)
        return h


class ScoreMLP(nn.Module):
    """Residual-MLP score network (reference ``mlp.yaml``: d_mlp=1024)."""

    n_channels: int
    max_len: int
    d_model: int = 72
    d_mlp: int = 1024
    num_layers: int = 10
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, timesteps: Array, deterministic: bool = True) -> Array:
        assert x.shape[1:] == (self.max_len, self.n_channels), (
            f"X has wrong shape, expected (*, {self.max_len}, {self.n_channels}), "
            f"got {x.shape}"
        )
        assert timesteps.shape[0] == x.shape[0]
        in_dtype = x.dtype
        b = x.shape[0]
        x = x.astype(self.dtype).reshape(b, self.max_len * self.n_channels)
        x = TorchLinear(self.d_model, name="embedder")(x)
        x = GaussianFourierProjection(self.d_model, name="time_encoder")(
            x, timesteps, use_time_axis=False
        )
        for i in range(self.num_layers):
            x = x + _MLPBlock(
                self.d_model, self.d_mlp, self.dropout_rate, name=f"backbone_{i}"
            )(x, deterministic=deterministic)
        x = TorchLinear(self.max_len * self.n_channels, name="unembedder")(x)
        return x.reshape(b, self.max_len, self.n_channels).astype(in_dtype)


class ScoreLSTM(nn.Module):
    """Residual-LSTM score network (reference ``lstm.yaml``)."""

    n_channels: int
    max_len: int
    d_model: int = 72
    num_layers: int = 10
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, timesteps: Array, deterministic: bool = True) -> Array:
        assert x.shape[1:] == (self.max_len, self.n_channels), (
            f"X has wrong shape, expected (*, {self.max_len}, {self.n_channels}), "
            f"got {x.shape}"
        )
        assert timesteps.shape[0] == x.shape[0]
        in_dtype = x.dtype
        x = x.astype(self.dtype)
        x = TorchLinear(self.d_model, name="embedder")(x)
        x = GaussianFourierProjection(self.d_model, name="time_encoder")(
            x, timesteps, use_time_axis=True
        )
        for i in range(self.num_layers):
            x = x + LSTMLayer(self.d_model, name=f"backbone_{i}")(x)
        x = TorchLinear(self.n_channels, name="unembedder")(x)
        return x.astype(in_dtype)


MODEL_REGISTRY = {
    "transformer": ScoreTransformer,
    "mlp": ScoreMLP,
    "lstm": ScoreLSTM,
}


@dataclasses.dataclass(frozen=True)
class ScoreModelConfig:
    """Static architecture description used by configs and checkpoints."""

    model_type: str = "transformer"  # transformer | mlp | lstm
    d_model: int = 72
    num_layers: int = 10
    n_head: int = 12
    dim_feedforward: int = 2048
    d_mlp: int = 1024
    dropout_rate: float = 0.1
    dtype: str = "float32"
    use_pallas: Optional[bool] = None

    def build(self, n_channels: int, max_len: int) -> nn.Module:
        dtype = jnp.dtype(self.dtype)
        common = dict(
            n_channels=n_channels,
            max_len=max_len,
            d_model=self.d_model,
            num_layers=self.num_layers,
            dtype=dtype,
        )
        if self.model_type == "transformer":
            return ScoreTransformer(
                n_head=self.n_head,
                dim_feedforward=self.dim_feedforward,
                dropout_rate=self.dropout_rate,
                use_pallas=self.use_pallas,
                **common,
            )
        if self.model_type == "mlp":
            return ScoreMLP(
                d_mlp=self.d_mlp, dropout_rate=self.dropout_rate, **common
            )
        if self.model_type == "lstm":
            return ScoreLSTM(**common)
        raise ValueError(f"Unknown model_type: {self.model_type!r}")
