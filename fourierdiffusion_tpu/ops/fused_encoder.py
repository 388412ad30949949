"""Fully-fused transformer encoder layer for the TPU sampling path.

Round-1 profiling (RESULTS.md) showed the 1000-step sampler spends
~5 ms/step of its 23 ms (batch 512, 10 layers) on *glue* around the
attention kernel: LayerNorms, QKV/out projections, head transposes and
pack/unpack between the canonical ``(B, L, D)`` layout and the kernel's
lane-major layout. This module removes that entire remainder by fusing
one full post-LN encoder layer (reference semantics:
``nn.TransformerEncoderLayer``, ``score_models.py:57-62``) into ONE
Pallas kernel operating natively on transposed activations
``(B, D, L_pad)``:

    qkv proj -> heads -> softmax(QK^T/sqrt(dh)) V -> out proj
    -> +residual -> LN1 -> FFN (relu) -> +residual -> LN2

Weights are pre-packed once per sampling program (outside the
``lax.scan``) into the kernel layout:

* ``w_qkv``: ``(3*H*DH_PAD, D)`` — per-head rows padded to the bf16
  sublane tile so in-kernel views are tile-aligned; the q rows are
  pre-scaled by ``1/sqrt(dh)`` so scaling is free.
* ``w_out``: ``(D, H*DH_PAD)`` — padded input columns are zero so the
  contraction ignores them.
* FFN weights transposed to ``(out, in)`` so every in-kernel matmul is
  ``W @ x`` over the lane-major activation.

Per-program FLOPs concentrate in three MXU shapes (head-batched
attention dots, ``(2048,72)@(72,Lp)`` FFN) while all elementwise work
(LN statistics in fp32, residuals, relu, masking) rides the VPU inside
the same program — HBM sees only x in/out per layer.

Numerics: LN statistics and softmax accumulate in fp32; matmul operands
stay in the activation dtype (bf16 on the sampling path). Padded key
lanes (>= l_valid) are masked before the softmax normalization, so the
fused layer matches the canonical flax module exactly on real lanes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array
from jax.typing import DTypeLike
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fourierdiffusion_tpu.ops.flash_attention import (
    DH_PAD,
    LANE,
    _DOT_PV,
    _DOT_S,
    _head_group,
    _interpret,
    _round_up,
)

_LN_EPS = 1e-5


def _layer_norm(x: Array, scale: Array, bias: Array) -> Array:
    """LayerNorm over the sublane (feature) axis of an ``(D, Lp)`` tile,
    fp32 statistics (flax ``nn.LayerNorm`` semantics)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=0, keepdims=True)
    centered = xf - mean
    var = jnp.mean(centered * centered, axis=0, keepdims=True)
    y = centered * jax.lax.rsqrt(var + _LN_EPS)
    return y * scale + bias


def _softmax(s: Array, col: Array, l_valid: int, fast: bool) -> Array:
    s = jnp.where(col < l_valid, s, -1e30)
    if fast:
        # Max-free softmax (shift invariance + clamp; the clamp turns
        # the -1e30 mask into exp(-60) ~ 0). Quality parity with the
        # exact path was validated in round 1 (RESULTS.md).
        e = jnp.exp(jnp.clip(s, -60.0, 60.0))
        return e * pl.reciprocal(jnp.sum(e, axis=2, keepdims=True), approx=True)
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=2, keepdims=True)


def _gather_chains(x_ref):
    """(R, D, Lp) block -> (D, R*Lp) lane-concatenated working layout."""
    r_chains = x_ref.shape[0]
    x_blk = x_ref[...]
    return (
        x_blk[0]
        if r_chains == 1
        else jnp.concatenate([x_blk[r] for r in range(r_chains)], axis=-1)
    )


def _scatter_chains(o_ref, y, lp: int) -> None:
    """Write the (D, R*Lp) working layout back to the (R, D, Lp) block."""
    r_chains = o_ref.shape[0]
    if r_chains == 1:
        o_ref[0] = y
    else:
        for r in range(r_chains):
            o_ref[r] = y[:, r * lp : (r + 1) * lp]


def _attention_ln1(
    x,
    w_qkv_ref, b_qkv_ref,
    w_out_ref, b_out_ref,
    ln1_s_ref, ln1_b_ref,
    *,
    n_head: int,
    l_valid: int,
    fast_softmax: bool,
    r_chains: int,
    lp: int,
):
    """Attention block + residual + LN1 over the (D, R*Lp) layout.

    Returns the LN1 output in fp32 (callers cast / quantize as needed).
    ``R > 1`` exists for instruction-level parallelism: within one chain
    the blocks are a strict data-dependency chain (MXU idles during
    softmax/LN VPU phases); with independent chains concatenated along
    the lane axis the big matmuls batch across chains and the per-chain
    attention loops give the scheduler independent work to interleave.
    """
    dtype = x.dtype
    hp = n_head * DH_PAD

    qkv = jnp.dot(
        w_qkv_ref[...].astype(dtype), x, preferred_element_type=jnp.float32
    ) + b_qkv_ref[...]
    qkv = qkv.astype(dtype)  # (3*H*DH_PAD, R*Lp)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, lp, lp), dimension=2)
    group = _head_group(n_head, lp, live_bytes_per_elem=12 * r_chains)
    per_chain = []  # per_chain[r] = list of head-group outputs
    for r in range(r_chains):
        lanes = slice(r * lp, (r + 1) * lp)
        groups = []
        for g0 in range(0, n_head, group):
            lo, hi = g0 * DH_PAD, (g0 + group) * DH_PAD
            q = qkv[lo:hi, lanes].reshape(group, DH_PAD, lp)
            k = qkv[hp + lo : hp + hi, lanes].reshape(group, DH_PAD, lp)
            v = qkv[2 * hp + lo : 2 * hp + hi, lanes].reshape(group, DH_PAD, lp)
            s = jax.lax.dot_general(
                q, k, _DOT_S, preferred_element_type=jnp.float32
            )
            p = _softmax(s, col, l_valid, fast_softmax).astype(dtype)
            o = jax.lax.dot_general(
                v, p, _DOT_PV, preferred_element_type=jnp.float32
            )
            groups.append(o.reshape(group * DH_PAD, lp).astype(dtype))
        per_chain.append(groups[0] if len(groups) == 1 else jnp.concatenate(groups, axis=0))
    attn = (
        per_chain[0]
        if r_chains == 1
        else jnp.concatenate(per_chain, axis=-1)
    )  # (H*DH_PAD, R*Lp)

    attn_out = jnp.dot(
        w_out_ref[...].astype(dtype), attn, preferred_element_type=jnp.float32
    ) + b_out_ref[...]

    return _layer_norm(
        x.astype(jnp.float32) + attn_out, ln1_s_ref[...], ln1_b_ref[...]
    )


def _encoder_layer_kernel(
    x_ref,
    w_qkv_ref, b_qkv_ref,
    w_out_ref, b_out_ref,
    ln1_s_ref, ln1_b_ref,
    w1_ref, b1_ref,
    w2_ref, b2_ref,
    ln2_s_ref, ln2_b_ref,
    o_ref,
    *,
    n_head: int,
    l_valid: int,
    fast_softmax: bool,
):
    """One full post-LN encoder layer for ``R`` chains (bf16/fp32 FFN)."""
    dtype = x_ref.dtype
    r_chains, d, lp = x_ref.shape
    x = _gather_chains(x_ref)  # (D, R*Lp)

    x1 = _attention_ln1(
        x,
        w_qkv_ref, b_qkv_ref, w_out_ref, b_out_ref, ln1_s_ref, ln1_b_ref,
        n_head=n_head, l_valid=l_valid, fast_softmax=fast_softmax,
        r_chains=r_chains, lp=lp,
    ).astype(dtype)

    # --- feed-forward block ----------------------------------------------
    h = jnp.dot(
        w1_ref[...].astype(dtype), x1, preferred_element_type=jnp.float32
    ) + b1_ref[...]
    h = jnp.maximum(h, 0.0).astype(dtype)
    f = jnp.dot(
        w2_ref[...].astype(dtype), h, preferred_element_type=jnp.float32
    ) + b2_ref[...]

    y = _layer_norm(
        x1.astype(jnp.float32) + f, ln2_s_ref[...], ln2_b_ref[...]
    ).astype(dtype)
    _scatter_chains(o_ref, y, lp)


def _quantize_along(xf: Array, axis: int) -> tuple[Array, Array]:
    """Symmetric int8 quantization with one scale per slice along ``axis``.

    ``xf``: fp32. Returns ``(q int8, scale fp32)`` with ``xf ~= q * scale``
    (scale keeps ``axis`` as a broadcast dim). The absmax reduction rides
    the VPU; the rescale multiply fuses into the following dot's epilogue.
    """
    absmax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf * (1.0 / scale)), -127.0, 127.0)
    return q.astype(jnp.int8), scale


def _quantize_tokens(xf: Array) -> tuple[Array, Array]:
    """Per-token (per-lane column) int8 quantization of an ``(M, N)`` tile."""
    return _quantize_along(xf, 0)


# Hidden-dim chunk for the int8 FFN: bounds the live int32 accumulator
# (chunk x R*Lp x 4B; 512 x 1024 = 2 MB at R=4) and gives per-(chunk,
# token) activation scales, which is strictly finer quantization
# granularity than per-token over the full hidden width.
_INT8_FFN_CHUNK = 512


def _encoder_layer_kernel_int8(
    x_ref,
    w_qkv_ref, b_qkv_ref,
    w_out_ref, b_out_ref,
    ln1_s_ref, ln1_b_ref,
    w1_q_ref, w1_s_ref, b1_ref,
    w2_q_ref, w2_s_ref, b2_ref,
    ln2_s_ref, ln2_b_ref,
    o_ref,
    *,
    n_head: int,
    l_valid: int,
    fast_softmax: bool,
):
    """Encoder layer with W8A8 int8 FFN dots (sampling path, opt-in).

    The FFN contractions are the only MXU shapes here that benefit from
    int8's 2x issue rate: their contraction dims (d_model and chunk=512)
    survive the (32, 128) int8 tile, while the attention S/PV dots'
    head_dim-6..16 contractions would *lose* utilization (head_dim pads
    to 32 sublanes in int8 vs 16 in bf16), so attention stays bf16.
    Weights carry static per-output-row scales (packed once, outside the
    sampling scan); activations are quantized per token on the fly.
    """
    dtype = x_ref.dtype
    r_chains, d, lp = x_ref.shape
    x = _gather_chains(x_ref)  # (D, R*Lp)

    x1f = _attention_ln1(
        x,
        w_qkv_ref, b_qkv_ref, w_out_ref, b_out_ref, ln1_s_ref, ln1_b_ref,
        n_head=n_head, l_valid=l_valid, fast_softmax=fast_softmax,
        r_chains=r_chains, lp=lp,
    )
    f = _ffn_int8(x1f, w1_q_ref, w1_s_ref, b1_ref, w2_q_ref, w2_s_ref, b2_ref, d)
    y = _layer_norm(x1f + f, ln2_s_ref[...], ln2_b_ref[...]).astype(dtype)
    _scatter_chains(o_ref, y, lp)


def _ffn_int8(
    x1f: Array,
    w1_q_ref, w1_s_ref, b1_ref,
    w2_q_ref, w2_s_ref, b2_ref,
    d: int,
) -> Array:
    """W8A8 feed-forward over the fp32 ``(D, R*Lp)`` LN1 output."""
    q_x, s_x = _quantize_tokens(x1f)
    d_ff = w1_q_ref.shape[0]
    w2_s = w2_s_ref[...]
    f = jnp.zeros((d, x1f.shape[1]), jnp.float32)
    for c0 in range(0, d_ff, _INT8_FFN_CHUNK):
        c1 = min(c0 + _INT8_FFN_CHUNK, d_ff)
        acc = jnp.dot(
            w1_q_ref[c0:c1, :], q_x, preferred_element_type=jnp.int32
        )
        h = acc.astype(jnp.float32) * (w1_s_ref[c0:c1] * s_x) + b1_ref[c0:c1]
        h = jnp.maximum(h, 0.0)
        q_h, s_h = _quantize_tokens(h)
        acc2 = jnp.dot(
            w2_q_ref[:, c0:c1], q_h, preferred_element_type=jnp.int32
        )
        f = f + acc2.astype(jnp.float32) * (w2_s * s_h)
    return f + b2_ref[...]


def _attention_ln1_int8(
    x,
    w_qkv_q_ref, w_qkv_s_ref, b_qkv_ref,
    w_out_q_ref, w_out_s_ref, b_out_ref,
    ln1_s_ref, ln1_b_ref,
    *,
    n_head: int,
    l_valid: int,
    fast_softmax: bool,
    r_chains: int,
    lp: int,
):
    """Attention block with int8 QKV / PV / out-proj dots, bf16 S dot.

    Contraction dims decide what quantizes profitably under the (32, 128)
    int8 tile: QKV contracts d_model (pad 96 int8 vs 80 bf16, 2x issue
    rate -> ~1.67x), PV contracts Lp and out-proj contracts H*DH_PAD
    (both 128-aligned -> 2x). The S dot contracts head_dim (pads 32 int8
    vs 16 bf16 -> exact wash) and carries the softmax's numerical
    sensitivity, so it stays bf16 on dequantized Q/K.
    """
    dtype = x.dtype
    hp = n_head * DH_PAD

    q_x, s_x = _quantize_tokens(x.astype(jnp.float32))
    qkv_f = (
        jnp.dot(w_qkv_q_ref[...], q_x, preferred_element_type=jnp.int32)
        .astype(jnp.float32)
        * (w_qkv_s_ref[...] * s_x)
        + b_qkv_ref[...]
    )  # (3*H*DH_PAD, R*Lp) fp32
    qkv = qkv_f.astype(dtype)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, lp, lp), dimension=2)
    group = _head_group(n_head, lp, live_bytes_per_elem=12 * r_chains)
    per_chain = []
    for r in range(r_chains):
        lanes = slice(r * lp, (r + 1) * lp)
        groups = []
        for g0 in range(0, n_head, group):
            lo, hi = g0 * DH_PAD, (g0 + group) * DH_PAD
            q = qkv[lo:hi, lanes].reshape(group, DH_PAD, lp)
            k = qkv[hp + lo : hp + hi, lanes].reshape(group, DH_PAD, lp)
            vf = qkv_f[2 * hp + lo : 2 * hp + hi, lanes].reshape(
                group, DH_PAD, lp
            )
            s = jax.lax.dot_general(
                q, k, _DOT_S, preferred_element_type=jnp.float32
            )
            p = _softmax(s, col, l_valid, fast_softmax)
            q_v, s_v = _quantize_along(vf, 2)  # (g, DH, 1) scales
            # _DOT_PV contracts p's axis 2 (keys j); o's lane axis is
            # p's axis 1 (queries i), so the per-(head, query) scales
            # swap into (g, 1, Lp) for the dequant broadcast.
            q_p, s_p = _quantize_along(p, 2)
            o = jax.lax.dot_general(
                q_v, q_p, _DOT_PV, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (s_v * jnp.swapaxes(s_p, 1, 2))
            groups.append(o.reshape(group * DH_PAD, lp))
        per_chain.append(
            groups[0] if len(groups) == 1 else jnp.concatenate(groups, axis=0)
        )
    attn = (
        per_chain[0]
        if r_chains == 1
        else jnp.concatenate(per_chain, axis=-1)
    )  # (H*DH_PAD, R*Lp) fp32

    q_a, s_a = _quantize_tokens(attn)
    attn_out = (
        jnp.dot(w_out_q_ref[...], q_a, preferred_element_type=jnp.int32)
        .astype(jnp.float32)
        * (w_out_s_ref[...] * s_a)
        + b_out_ref[...]
    )

    return _layer_norm(
        x.astype(jnp.float32) + attn_out, ln1_s_ref[...], ln1_b_ref[...]
    )


def _encoder_layer_kernel_int8_attn(
    x_ref,
    w_qkv_q_ref, w_qkv_s_ref, b_qkv_ref,
    w_out_q_ref, w_out_s_ref, b_out_ref,
    ln1_s_ref, ln1_b_ref,
    w1_q_ref, w1_s_ref, b1_ref,
    w2_q_ref, w2_s_ref, b2_ref,
    ln2_s_ref, ln2_b_ref,
    o_ref,
    *,
    n_head: int,
    l_valid: int,
    fast_softmax: bool,
):
    """Encoder layer with int8 FFN *and* attention-side dots
    (``FDIFF_FUSED_INT8=2``); only the softmax-feeding S dot stays bf16."""
    dtype = x_ref.dtype
    r_chains, d, lp = x_ref.shape
    x = _gather_chains(x_ref)

    x1f = _attention_ln1_int8(
        x,
        w_qkv_q_ref, w_qkv_s_ref, b_qkv_ref,
        w_out_q_ref, w_out_s_ref, b_out_ref,
        ln1_s_ref, ln1_b_ref,
        n_head=n_head, l_valid=l_valid, fast_softmax=fast_softmax,
        r_chains=r_chains, lp=lp,
    )
    f = _ffn_int8(x1f, w1_q_ref, w1_s_ref, b1_ref, w2_q_ref, w2_s_ref, b2_ref, d)
    y = _layer_norm(x1f + f, ln2_s_ref[...], ln2_b_ref[...]).astype(dtype)
    _scatter_chains(o_ref, y, lp)


def _col_vec(v: Array) -> Array:
    """(n,) parameter -> (n, 1) fp32 column for lane-broadcast in-kernel."""
    return v.astype(jnp.float32)[:, None]


def _quantize_rows(w: Array) -> tuple[Array, Array]:
    """Symmetric per-output-row int8 weight quantization.

    ``w``: ``(out, in)``. Returns ``(q int8, scale fp32 (out, 1))`` with
    ``w ~= q * scale``. Packed once per sampling program.
    """
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(wf * (1.0 / scale)), -127.0, 127.0)
    return q.astype(jnp.int8), scale


def pack_encoder_layer(
    params: dict,
    n_head: int,
    dtype: DTypeLike,
    int8_ffn: bool = False,
    int8_attn: bool = False,
) -> dict[str, Array]:
    """Repack one canonical flax encoder-layer param subtree
    (``models/transformer.py:22-57`` structure) into the kernel layout.

    ``int8_ffn=True`` replaces the FFN weights with int8 values plus
    per-output-row fp32 scales (W8A8 sampling path, ``FDIFF_FUSED_INT8``);
    ``int8_attn=True`` additionally quantizes the QKV / out-proj weights
    (``FDIFF_FUSED_INT8=2``; requires ``int8_ffn``).
    """
    d_model = params["norm1"]["scale"].shape[0]
    dh = d_model // n_head

    def pad_heads(w: Array) -> Array:
        # (H*dh, D) -> (H*DH_PAD, D), zero rows beyond dh per head.
        w = w.reshape(n_head, dh, d_model)
        w = jnp.pad(w, ((0, 0), (0, DH_PAD - dh), (0, 0)))
        return w.reshape(n_head * DH_PAD, d_model)

    def pad_head_bias(b: Array) -> Array:
        b = b.reshape(n_head, dh)
        b = jnp.pad(b, ((0, 0), (0, DH_PAD - dh)))
        return b.reshape(n_head * DH_PAD)

    # in_proj kernel is flax (in=D, out=3D); rows of W = output features.
    w_in = params["self_attn"]["in_proj"]["kernel"].T  # (3D, D)
    b_in = params["self_attn"]["in_proj"]["bias"]
    scale = 1.0 / math.sqrt(dh)
    wq, wk, wv = jnp.split(w_in, 3, axis=0)
    bq, bk, bv = jnp.split(b_in, 3)
    w_qkv = jnp.concatenate(
        [pad_heads(wq * scale), pad_heads(wk), pad_heads(wv)], axis=0
    )
    b_qkv = jnp.concatenate(
        [pad_head_bias(bq * scale), pad_head_bias(bk), pad_head_bias(bv)]
    )

    # out_proj kernel is flax (in=D, out=D); pad the *input* (head) axis.
    w_out = params["self_attn"]["out_proj"]["kernel"]  # (D_in, D_out)
    w_out = w_out.reshape(n_head, dh, d_model)
    w_out = jnp.pad(w_out, ((0, 0), (0, DH_PAD - dh), (0, 0)))
    w_out = w_out.reshape(n_head * DH_PAD, d_model).T  # (D, H*DH_PAD)

    packed = {
        "b_qkv": _col_vec(b_qkv),
        "b_out": _col_vec(params["self_attn"]["out_proj"]["bias"]),
        "ln1_s": _col_vec(params["norm1"]["scale"]),
        "ln1_b": _col_vec(params["norm1"]["bias"]),
        "b1": _col_vec(params["linear1"]["bias"]),
        "b2": _col_vec(params["linear2"]["bias"]),
        "ln2_s": _col_vec(params["norm2"]["scale"]),
        "ln2_b": _col_vec(params["norm2"]["bias"]),
    }
    if int8_attn:
        packed["w_qkv_q"], packed["w_qkv_s"] = _quantize_rows(w_qkv)
        packed["w_out_q"], packed["w_out_s"] = _quantize_rows(w_out)
    else:
        packed["w_qkv"] = w_qkv.astype(dtype)
        packed["w_out"] = w_out.astype(dtype)
    w1 = params["linear1"]["kernel"].T  # (d_ff, D)
    w2 = params["linear2"]["kernel"].T  # (D, d_ff)
    if int8_ffn:
        packed["w1_q"], packed["w1_s"] = _quantize_rows(w1)
        packed["w2_q"], packed["w2_s"] = _quantize_rows(w2)
    else:
        packed["w1"] = w1.astype(dtype)
        packed["w2"] = w2.astype(dtype)
    return packed


_LAYER_KEYS = (
    "w_qkv", "b_qkv", "w_out", "b_out", "ln1_s", "ln1_b",
    "w1", "b1", "w2", "b2", "ln2_s", "ln2_b",
)

_LAYER_KEYS_INT8 = (
    "w_qkv", "b_qkv", "w_out", "b_out", "ln1_s", "ln1_b",
    "w1_q", "w1_s", "b1", "w2_q", "w2_s", "b2", "ln2_s", "ln2_b",
)

_LAYER_KEYS_INT8_ATTN = (
    "w_qkv_q", "w_qkv_s", "b_qkv", "w_out_q", "w_out_s", "b_out",
    "ln1_s", "ln1_b",
    "w1_q", "w1_s", "b1", "w2_q", "w2_s", "b2", "ln2_s", "ln2_b",
)


def _auto_r(batch: int, n_head: int, lp: int) -> int:
    """Chains per program: enough ILP to keep the MXU busy through the
    VPU phases, bounded by the VMEM budget (the attention group splitter
    scales with R) and divisibility."""
    import os

    env = os.environ.get("FDIFF_FUSED_R")
    if env:
        r = int(env)
        return r if r >= 1 and batch % r == 0 else 1
    # Measured on v5e (flagship shapes, RESULTS.md): R=1 210, R=2 279,
    # R=4 285, R=8 221 samples/s @100 steps — R=8 shrinks the attention
    # head groups under the VMEM budget and loses the batched-dot win.
    for r in (4, 2, 1):
        if batch % r == 0:
            return r
    return 1


def fused_encoder_layer(
    x: Array,
    layer: dict[str, Array],
    *,
    n_head: int,
    l_valid: int,
    r_chains: int | None = None,
) -> Array:
    """One fused encoder layer over transposed activations ``(B, D, Lp)``."""
    b, d, lp = x.shape
    r = r_chains if r_chains is not None else _auto_r(b, n_head, lp)
    if b % r:
        r = 1
    x_spec = pl.BlockSpec((r, d, lp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    if "w_qkv_q" in layer:
        keys, kernel_fn = _LAYER_KEYS_INT8_ATTN, _encoder_layer_kernel_int8_attn
    elif "w1_q" in layer:
        keys, kernel_fn = _LAYER_KEYS_INT8, _encoder_layer_kernel_int8
    else:
        keys, kernel_fn = _LAYER_KEYS, _encoder_layer_kernel
    consts = [layer[k] for k in keys]
    c_specs = [
        pl.BlockSpec(
            c.shape, (lambda i, _n=c.ndim: (0,) * _n), memory_space=pltpu.VMEM
        )
        for c in consts
    ]
    kernel = functools.partial(
        kernel_fn,
        n_head=n_head,
        l_valid=l_valid,
        fast_softmax=x.dtype == jnp.bfloat16,
    )
    return pl.pallas_call(
        kernel,
        grid=(b // r,),
        in_specs=[x_spec] + c_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_interpret(),
    )(x, *consts)


def fused_encoder(
    x: Array,
    layers: list[dict[str, Array]],
    *,
    n_head: int,
    l_valid: int,
    r_chains: int | None = None,
) -> Array:
    """Full encoder stack over transposed activations ``(B, D, Lp)``."""
    for layer in layers:
        x = fused_encoder_layer(
            x, layer, n_head=n_head, l_valid=l_valid, r_chains=r_chains
        )
    return x


def pad_lanes(x: Array) -> Array:
    """(B, D, L) -> (B, D, L_pad) zero-padded to the lane tile."""
    l = x.shape[-1]
    return jnp.pad(x, ((0, 0), (0, 0), (0, _round_up(l, LANE) - l)))


__all__ = [
    "fused_encoder",
    "fused_encoder_layer",
    "pack_encoder_layer",
    "pad_lanes",
]
