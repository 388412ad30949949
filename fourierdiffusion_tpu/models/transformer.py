"""Transformer encoder backbone matching torch semantics.

The reference backbone is ``nn.TransformerEncoder`` built from
``nn.TransformerEncoderLayer(d_model, n_head, batch_first=True)``
(``score_models.py:57-62``) with torch defaults: post-layer-norm,
ReLU feed-forward of width 2048, dropout 0.1 on attention output, FFN
hidden and FFN output. This module reproduces that computation graph in
flax so reference checkpoints import one-to-one, while the attention
itself routes to the fused Pallas kernel on TPU.
"""

from __future__ import annotations

from flax import linen as nn
from jax import Array

from fourierdiffusion_tpu.models.attention import MultiHeadSelfAttention
from fourierdiffusion_tpu.models.blocks import TorchLinear


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer (torch ``nn.TransformerEncoderLayer`` defaults)."""

    d_model: int
    n_head: int
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        attn_out = MultiHeadSelfAttention(
            d_model=self.d_model,
            n_head=self.n_head,
            dropout_rate=self.dropout_rate,
            use_pallas=self.use_pallas,
            name="self_attn",
        )(x, deterministic=deterministic)
        attn_out = nn.Dropout(self.dropout_rate, name="dropout1")(
            attn_out, deterministic=deterministic
        )
        # LN statistics in fp32 for stability, output cast back so the
        # surrounding matmuls stay in the computation dtype (bf16).
        dtype = x.dtype
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn_out).astype(dtype)

        h = TorchLinear(self.dim_feedforward, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, name="dropout_ff")(
            h, deterministic=deterministic
        )
        h = TorchLinear(self.d_model, name="linear2")(h)
        h = nn.Dropout(self.dropout_rate, name="dropout2")(
            h, deterministic=deterministic
        )
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h).astype(dtype)


class TransformerEncoder(nn.Module):
    """Stack of encoder layers (torch ``nn.TransformerEncoder``)."""

    d_model: int
    n_head: int
    num_layers: int
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                d_model=self.d_model,
                n_head=self.n_head,
                dim_feedforward=self.dim_feedforward,
                dropout_rate=self.dropout_rate,
                use_pallas=self.use_pallas,
                name=f"layers_{i}",
            )(x, deterministic=deterministic)
        return x
