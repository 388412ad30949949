"""Multi-head self-attention for the transformer score network.

The semantics mirror torch ``nn.MultiheadAttention`` as used by the
reference's ``nn.TransformerEncoder`` (``score_models.py:57-62``):
packed QKV projection, per-head scaled dot-product softmax, output
projection, optional dropout on the attention weights.

Two execution paths share one weight layout:

* ``dot_product_attention`` — pure jnp; used on CPU and when attention-
  weight dropout is active (training).
* A fused Pallas TPU kernel (``fourierdiffusion_tpu.ops.flash_attention``)
  that never materializes the ``(B, H, L, L)`` score tensor in HBM; used
  for the sampling hot loop and deterministic forward passes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import Array

from fourierdiffusion_tpu.models.blocks import TorchLinear


def dot_product_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[Array] = None,
    deterministic: bool = True,
) -> Array:
    """Reference attention over ``(B, H, L, Dh)`` tensors (fp32 softmax)."""
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    if not deterministic and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


class MultiHeadSelfAttention(nn.Module):
    """Self-attention with torch MHA weight layout (in_proj + out_proj)."""

    d_model: int
    n_head: int
    dropout_rate: float = 0.0
    use_pallas: Optional[bool] = None  # None = auto (TPU only)

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        b, l, d = x.shape
        assert d == self.d_model
        dh = self.d_model // self.n_head

        # Packed QKV projection, matching torch in_proj_{weight,bias}.
        qkv = TorchLinear(3 * self.d_model, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t: Array) -> Array:
            return t.reshape(b, l, self.n_head, dh).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        needs_dropout = (not deterministic) and self.dropout_rate > 0.0

        if use_pallas and not needs_dropout:
            from fourierdiffusion_tpu.ops.flash_attention import flash_attention

            out = flash_attention(q, k, v)
        elif use_pallas and needs_dropout:
            # Training on TPU: dropout on the attention weights happens
            # inside the kernel (mask regenerated in the backward pass
            # from the same seed) so scores never touch HBM.
            from fourierdiffusion_tpu.ops.flash_attention import (
                flash_attention_dropout,
            )

            seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max
            ).astype(jnp.int32)
            out = flash_attention_dropout(q, k, v, seed, self.dropout_rate)
        else:
            rng = self.make_rng("dropout") if needs_dropout else None
            out = dot_product_attention(
                q,
                k,
                v,
                dropout_rate=self.dropout_rate,
                dropout_rng=rng,
                deterministic=not needs_dropout,
            )

        out = out.transpose(0, 2, 1, 3).reshape(b, l, self.d_model)
        return TorchLinear(self.d_model, name="out_proj")(out)
