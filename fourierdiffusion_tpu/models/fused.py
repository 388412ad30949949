"""Fused sampling-path forward for the transformer score network.

The canonical ``ScoreTransformer`` (``models/score_models.py:41``) is a
flax module whose per-layer attention routes to a Pallas kernel but
whose LayerNorms, projections and layout shuffles run as separate XLA
ops in the ``(B, L, D)`` layout. For the 1000-step fused sampler that
glue was ~5 ms of the 23 ms step (batch 512). This module provides a
numerically-equivalent forward built around
``ops.fused_encoder`` — the whole backbone runs on transposed
``(B, D, L_pad)`` activations with one Pallas program per (chain,
layer), and only the tiny ``(B, C, L)`` tensors are ever transposed.

Usage (the sampler does this automatically)::

    packed = pack_score_transformer(model, variables)   # once, pre-scan
    score = fused_score_forward(model, packed, x, t)    # per step

``pack_score_transformer`` consumes the *canonical* variables pytree, so
checkpoints, training, and the torch importer are untouched; the fused
path is a pure re-layout of the same weights (positional-embedding
max-norm renorm applied at pack time, q-scale folded into the packed QKV
weight).
"""

from __future__ import annotations

import math
import os
from typing import Any

import jax.numpy as jnp
from jax import Array

from fourierdiffusion_tpu.models.blocks import _max_norm_renorm
from fourierdiffusion_tpu.ops.fused_encoder import (
    fused_encoder,
    pack_encoder_layer,
    pad_lanes,
)


def pack_score_transformer(
    model: Any, variables: dict, int8_ffn: bool | int | None = None
) -> dict:
    """Repack canonical ``ScoreTransformer`` variables for the fused path.

    Pure jnp; called inside the jitted sampling program *before* the
    ``lax.scan`` so XLA executes it once per program, not per step.

    ``int8_ffn`` selects the W8A8 sampling kernels
    (``ops/fused_encoder.py``): 1/True quantizes the FFN dots, 2 also
    quantizes the attention-side QKV / PV / out-proj dots; ``None``
    reads ``FDIFF_FUSED_INT8`` at trace time. The training path always
    passes ``False``.
    """
    if int8_ffn is None:
        raw = os.environ.get("FDIFF_FUSED_INT8", "").strip()
        int8_ffn = 0 if raw in ("", "0") else (2 if raw == "2" else 1)
    level = int(int8_ffn)
    params = variables["params"]
    dtype = model.dtype

    pe = _max_norm_renorm(
        params["pos_encoder"]["embedding"], math.sqrt(model.d_model)
    )  # (max_len, D)
    layers = [
        pack_encoder_layer(
            params["backbone"][f"layers_{i}"], model.n_head, dtype,
            int8_ffn=level >= 1, int8_attn=level >= 2,
        )
        for i in range(model.num_layers)
    ]
    return {
        "embed_w": params["embedder"]["kernel"].astype(dtype),  # (C, D)
        "embed_b": params["embedder"]["bias"].astype(dtype),  # (D,)
        "pos_T": pad_lanes(pe.T[None]).astype(dtype)[0],  # (D, Lp)
        "gfp_w": variables["constants"]["time_encoder"]["W"],  # (D//2,)
        "gfp_dense_w": params["time_encoder"]["dense"]["kernel"].astype(dtype),
        "gfp_dense_b": params["time_encoder"]["dense"]["bias"].astype(dtype),
        "unembed_w": params["unembedder"]["kernel"].astype(dtype),  # (D, C)
        "unembed_b": params["unembedder"]["bias"].astype(dtype),  # (C,)
        "layers": layers,
    }


def fused_score_forward(
    model: Any, packed: dict, x: Array, timesteps: Array
) -> Array:
    """Forward pass equivalent to ``model.apply(..., deterministic=True)``.

    ``x``: ``(B, max_len, n_channels)``; returns the score in the same
    shape/dtype. Matches the canonical module's computation graph
    (embed -> +pos -> +GFP time embedding -> encoder stack -> unembed,
    reference ``score_models.py:67-94``) on transposed activations.
    """
    in_dtype = x.dtype
    dtype = model.dtype
    l = model.max_len

    # (B, L, C) -> (B, C, Lp): the only layout flip touches the tiny
    # channel-width tensor, not the (B, L, D) activations.
    xt = pad_lanes(jnp.swapaxes(x.astype(dtype), 1, 2))

    # Channel embedding + positional embedding, transposed.
    h = jnp.einsum("bcl,cd->bdl", xt, packed["embed_w"])
    h = h + packed["embed_b"][None, :, None] + packed["pos_T"][None]

    # Gaussian Fourier time embedding (reference ``transformer.py:63-91``),
    # broadcast over the lane (sequence) axis.
    proj = timesteps[:, None].astype(jnp.float32) * packed["gfp_w"][None] * (
        2.0 * jnp.pi
    )
    emb = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
    emb = emb[:, : model.d_model].astype(dtype)
    t_emb = jnp.dot(emb, packed["gfp_dense_w"]) + packed["gfp_dense_b"]
    h = h + t_emb[:, :, None]

    h = fused_encoder(
        h, packed["layers"], n_head=model.n_head, l_valid=l
    )

    score = jnp.einsum("bdl,dc->bcl", h, packed["unembed_w"])
    score = score + packed["unembed_b"][None, :, None]
    return jnp.swapaxes(score[:, :, :l], 1, 2).astype(in_dtype)


def fused_score_training_forward(
    model: Any,
    params: dict,
    constants: dict,
    x: Array,
    timesteps: Array,
    dropout_key: Array,
) -> Array:
    """Training-path forward: fused layers WITH dropout and a custom VJP
    (``ops/fused_encoder_train.py``). Differentiable in ``params`` — the
    packing is plain jnp, so ``jax.grad`` maps kernel-layout gradients
    back onto the canonical flax tree automatically.
    """
    import jax

    from fourierdiffusion_tpu.ops.fused_encoder_train import (
        fused_encoder_layer_train,
    )

    packed = pack_score_transformer(
        model, {"params": params, "constants": constants}, int8_ffn=False
    )
    in_dtype = x.dtype
    dtype = model.dtype
    l = model.max_len

    xt = pad_lanes(jnp.swapaxes(x.astype(dtype), 1, 2))
    h = jnp.einsum("bcl,cd->bdl", xt, packed["embed_w"])
    h = h + packed["embed_b"][None, :, None] + packed["pos_T"][None]
    proj = timesteps[:, None].astype(jnp.float32) * packed["gfp_w"][None] * (
        2.0 * jnp.pi
    )
    emb = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
    emb = emb[:, : model.d_model].astype(dtype)
    t_emb = jnp.dot(emb, packed["gfp_dense_w"]) + packed["gfp_dense_b"]
    h = h + t_emb[:, :, None]

    cfg = (model.n_head, l, float(model.dropout_rate))
    for i, layer in enumerate(packed["layers"]):
        seed = jax.random.randint(
            jax.random.fold_in(dropout_key, i), (), 0, jnp.iinfo(jnp.int32).max
        ).astype(jnp.int32)
        h = fused_encoder_layer_train(cfg, h, layer, seed)

    score = jnp.einsum("bdl,dc->bcl", h, packed["unembed_w"])
    score = score + packed["unembed_b"][None, :, None]
    return jnp.swapaxes(score[:, :, :l], 1, 2).astype(in_dtype)


__all__ = [
    "pack_score_transformer",
    "fused_score_forward",
    "fused_score_training_forward",
]
