"""Fused transformer encoder layer with custom VJP — the TRAINING path.

The sampling path (``fused_encoder.py``) collapsed per-layer glue into
one Pallas program; training still ran LayerNorms, projections, five
dropout applications and the attention pack/unpack as separate XLA ops
around the flash kernels. At the reference batch size (64) that leaves
the step latency-bound (~3% MFU). This module fuses the WHOLE layer —
forward and backward — into one Pallas program each:

* forward: qkv -> attention(+weight dropout) -> out proj -> dropout ->
  +res -> LN1 -> FFN(relu, hidden+output dropout) -> +res -> LN2;
* backward: recomputes everything from the layer input (flash-style, no
  residual stash crosses HBM), regenerates all four dropout masks from
  the same (seed, program, site) PRNG contract as the forward, and
  accumulates weight gradients across grid programs into revisited
  output blocks (initialized at program 0, flushed once at the end).

Gradients are returned w.r.t. the PACKED weights; ``pack_encoder_layer``
is differentiable jnp, so ``jax.grad`` chains back to the canonical flax
parameters automatically (the q-scale folding un-applies itself).

Dropout semantics match torch/flax (keep/(1-rate), applied to attention
weights, attention output, FFN hidden, FFN output). Masks are an
internal PRNG stream — independent per (seed, chain-block, site, head
group) — not bit-identical to flax's, which is irrelevant for training
correctness; the fwd/bwd mask agreement contract is what the tests pin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fourierdiffusion_tpu.ops.flash_attention import (
    DH_PAD,
    _DOT_DK,
    _DOT_PV,
    _DOT_S,
    _hash_bits,
    _head_group,
    _interpret,
)
from fourierdiffusion_tpu.ops.fused_encoder import _LAYER_KEYS, _LN_EPS, _softmax

# Dropout mask sites within one layer program.
_SITE_ATTN, _SITE_OUT, _SITE_FF, _SITE_FF2 = 0, 1, 2, 3
# Lane-dim contraction for weight grads: dW[m,d] = sum_l A[m,l] B[d,l].
_DOT_WGRAD = (((1,), (1,)), ((), ()))
# dhd[f,l] = sum_d W2[d,f] df2[d,l] (contract dim 0 of both).
_DOT_BACK = (((0,), (0,)), ((), ()))


def _keep(shape, rate: float, seed, site: int, extra: int = 0) -> Array:
    """Mask/(1-rate); pure function of (seed, program, site, extra,
    position) so forward and backward regenerate identical masks."""
    tag = seed + pl.program_id(0) * 131071 + site * 7919 + extra * 104729
    if _interpret():
        bits = _hash_bits(shape, tag)
    else:
        pltpu.prng_seed(tag)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(int((1.0 - rate) * (2**32 - 1)))
    return jnp.where(bits < threshold, 1.0 / (1.0 - rate), 0.0).astype(jnp.float32)


def _ln_fwd(x32: Array, scale: Array, bias: Array):
    mean = jnp.mean(x32, axis=0, keepdims=True)
    centered = x32 - mean
    var = jnp.mean(centered * centered, axis=0, keepdims=True)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    xhat = centered * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd(dy32: Array, xhat: Array, inv: Array, scale: Array):
    """Input/scale/bias grads of LayerNorm over the sublane axis."""
    d = xhat.shape[0]
    dxhat = dy32 * scale
    dscale = jnp.sum(dy32 * xhat, axis=1, keepdims=True)
    dbias = jnp.sum(dy32, axis=1, keepdims=True)
    mean_dxhat = jnp.mean(dxhat, axis=0, keepdims=True)
    mean_dxhat_xhat = jnp.mean(dxhat * xhat, axis=0, keepdims=True)
    dx = inv * (dxhat - mean_dxhat - xhat * mean_dxhat_xhat)
    del d
    return dx, dscale, dbias


def _concat_chains(x_blk: Array) -> Array:
    r = x_blk.shape[0]
    if r == 1:
        return x_blk[0]
    return jnp.concatenate([x_blk[i] for i in range(r)], axis=-1)


def _train_group(n_head: int, lp: int, r_chains: int) -> int:
    # Backward holds S, P, keep, dp, ds per group simultaneously.
    return _head_group(n_head, lp, live_bytes_per_elem=24 * r_chains)


def _attention_fwd(qkv, *, n_head, lp, r_chains, l_valid, seed, rate, col):
    """Shared attention block: returns the packed (HP, R*Lp) output."""
    hp = n_head * DH_PAD
    group = _train_group(n_head, lp, r_chains)
    dtype = qkv.dtype
    per_chain = []
    for r in range(r_chains):
        lanes = slice(r * lp, (r + 1) * lp)
        groups = []
        for g0 in range(0, n_head, group):
            lo, hi = g0 * DH_PAD, (g0 + group) * DH_PAD
            q = qkv[lo:hi, lanes].reshape(group, DH_PAD, lp)
            k = qkv[hp + lo : hp + hi, lanes].reshape(group, DH_PAD, lp)
            v = qkv[2 * hp + lo : 2 * hp + hi, lanes].reshape(group, DH_PAD, lp)
            s = jax.lax.dot_general(q, k, _DOT_S, preferred_element_type=jnp.float32)
            p = _softmax(s, col, l_valid, fast=False)
            keep = _keep(p.shape, rate, seed, _SITE_ATTN, extra=r * 64 + g0)
            pd = (p * keep).astype(dtype)
            o = jax.lax.dot_general(v, pd, _DOT_PV, preferred_element_type=jnp.float32)
            groups.append(o.reshape(group * DH_PAD, lp).astype(dtype))
        per_chain.append(
            groups[0] if len(groups) == 1 else jnp.concatenate(groups, axis=0)
        )
    return (
        per_chain[0]
        if r_chains == 1
        else jnp.concatenate(per_chain, axis=-1)
    )


def _train_fwd_kernel(
    seed_ref, x_ref,
    w_qkv_ref, b_qkv_ref, w_out_ref, b_out_ref,
    ln1_s_ref, ln1_b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    ln2_s_ref, ln2_b_ref,
    y_ref,
    *, n_head: int, l_valid: int, rate: float,
):
    dtype = x_ref.dtype
    r_chains, d, lp = x_ref.shape
    x = _concat_chains(x_ref[...])
    col = jax.lax.broadcasted_iota(jnp.int32, (1, lp, lp), dimension=2)
    seed = seed_ref[0]

    qkv = (
        jnp.dot(w_qkv_ref[...].astype(dtype), x, preferred_element_type=jnp.float32)
        + b_qkv_ref[...]
    ).astype(dtype)
    attn = _attention_fwd(
        qkv, n_head=n_head, lp=lp, r_chains=r_chains, l_valid=l_valid,
        seed=seed, rate=rate, col=col,
    )
    attn_out = jnp.dot(
        w_out_ref[...].astype(dtype), attn, preferred_element_type=jnp.float32
    ) + b_out_ref[...]
    keep1 = _keep(attn_out.shape, rate, seed, _SITE_OUT)
    a = x.astype(jnp.float32) + attn_out * keep1
    x1n, _, _ = _ln_fwd(a, ln1_s_ref[...], ln1_b_ref[...])
    x1 = x1n.astype(dtype)

    h_pre = jnp.dot(
        w1_ref[...].astype(dtype), x1, preferred_element_type=jnp.float32
    ) + b1_ref[...]
    h = jnp.maximum(h_pre, 0.0)
    keep_f = _keep(h.shape, rate, seed, _SITE_FF)
    hd = (h * keep_f).astype(dtype)
    f2 = jnp.dot(
        w2_ref[...].astype(dtype), hd, preferred_element_type=jnp.float32
    ) + b2_ref[...]
    keep2 = _keep(f2.shape, rate, seed, _SITE_FF2)
    b = x1n + f2 * keep2
    yn, _, _ = _ln_fwd(b, ln2_s_ref[...], ln2_b_ref[...])
    y = yn.astype(dtype)

    for r in range(r_chains):
        y_ref[r] = y[:, r * lp : (r + 1) * lp]


def _attention_bwd(qkv, d_attn, *, n_head, lp, r_chains, l_valid, seed, rate, col):
    """d(qkv) from d(attention output), recomputing S/P and the masks."""
    hp = n_head * DH_PAD
    group = _train_group(n_head, lp, r_chains)
    dtype = qkv.dtype
    dqkv_chains = []
    for r in range(r_chains):
        lanes = slice(r * lp, (r + 1) * lp)
        dq_rows, dk_rows, dv_rows = [], [], []
        for g0 in range(0, n_head, group):
            lo, hi = g0 * DH_PAD, (g0 + group) * DH_PAD
            q = qkv[lo:hi, lanes].reshape(group, DH_PAD, lp)
            k = qkv[hp + lo : hp + hi, lanes].reshape(group, DH_PAD, lp)
            v = qkv[2 * hp + lo : 2 * hp + hi, lanes].reshape(group, DH_PAD, lp)
            do = d_attn[lo:hi, lanes].reshape(group, DH_PAD, lp).astype(dtype)
            s = jax.lax.dot_general(q, k, _DOT_S, preferred_element_type=jnp.float32)
            p = _softmax(s, col, l_valid, fast=False)
            keep = _keep(p.shape, rate, seed, _SITE_ATTN, extra=r * 64 + g0)
            p_used = (p * keep).astype(dtype)
            # D[g,i,1] = sum_d dO O (via ones-matmul, no transposes).
            o = jax.lax.dot_general(
                v, p_used, _DOT_PV, preferred_element_type=jnp.float32
            )
            ones = jnp.ones((group, DH_PAD, 1), jnp.float32)
            d_col = jax.lax.dot_general(
                do.astype(jnp.float32) * o, ones, _DOT_S,
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(do, v, _DOT_S, preferred_element_type=jnp.float32)
            dp = dp * keep
            ds = (p * (dp - d_col)).astype(dtype)
            dq = jax.lax.dot_general(k, ds, _DOT_PV, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(q, ds, _DOT_DK, preferred_element_type=jnp.float32)
            dv = jax.lax.dot_general(do, p_used, _DOT_DK, preferred_element_type=jnp.float32)
            dq_rows.append(dq.reshape(group * DH_PAD, lp))
            dk_rows.append(dk.reshape(group * DH_PAD, lp))
            dv_rows.append(dv.reshape(group * DH_PAD, lp))

        def cat(rows):
            return rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)

        dqkv_chains.append(
            jnp.concatenate([cat(dq_rows), cat(dk_rows), cat(dv_rows)], axis=0)
        )
    return (
        dqkv_chains[0]
        if r_chains == 1
        else jnp.concatenate(dqkv_chains, axis=-1)
    )  # (3HP, R*Lp) fp32


def _train_bwd_kernel(
    seed_ref, x_ref, dy_ref,
    w_qkv_ref, b_qkv_ref, w_out_ref, b_out_ref,
    ln1_s_ref, ln1_b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    ln2_s_ref, ln2_b_ref,
    dx_ref,
    dw_qkv_ref, db_qkv_ref, dw_out_ref, db_out_ref,
    dln1_s_ref, dln1_b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    dln2_s_ref, dln2_b_ref,
    *, n_head: int, l_valid: int, rate: float,
):
    dtype = x_ref.dtype
    r_chains, d, lp = x_ref.shape
    x = _concat_chains(x_ref[...])
    dy = _concat_chains(dy_ref[...]).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, lp, lp), dimension=2)
    seed = seed_ref[0]

    # ---- recompute forward ------------------------------------------------
    qkv = (
        jnp.dot(w_qkv_ref[...].astype(dtype), x, preferred_element_type=jnp.float32)
        + b_qkv_ref[...]
    ).astype(dtype)
    attn = _attention_fwd(
        qkv, n_head=n_head, lp=lp, r_chains=r_chains, l_valid=l_valid,
        seed=seed, rate=rate, col=col,
    )
    attn_out = jnp.dot(
        w_out_ref[...].astype(dtype), attn, preferred_element_type=jnp.float32
    ) + b_out_ref[...]
    keep1 = _keep(attn_out.shape, rate, seed, _SITE_OUT)
    a = x.astype(jnp.float32) + attn_out * keep1
    _, xhat1, inv1 = _ln_fwd(a, ln1_s_ref[...], ln1_b_ref[...])
    x1n = xhat1 * ln1_s_ref[...] + ln1_b_ref[...]
    x1 = x1n.astype(dtype)
    h_pre = jnp.dot(
        w1_ref[...].astype(dtype), x1, preferred_element_type=jnp.float32
    ) + b1_ref[...]
    h = jnp.maximum(h_pre, 0.0)
    keep_f = _keep(h.shape, rate, seed, _SITE_FF)
    hd = (h * keep_f).astype(dtype)
    f2 = jnp.dot(
        w2_ref[...].astype(dtype), hd, preferred_element_type=jnp.float32
    ) + b2_ref[...]
    keep2 = _keep(f2.shape, rate, seed, _SITE_FF2)
    b = x1n + f2 * keep2
    _, xhat2, inv2 = _ln_fwd(b, ln2_s_ref[...], ln2_b_ref[...])

    # ---- backward ----------------------------------------------------------
    db_pre, dln2_s, dln2_b = _ln_bwd(dy, xhat2, inv2, ln2_s_ref[...])
    df2 = db_pre * keep2
    dhd = jax.lax.dot_general(
        w2_ref[...].astype(dtype), df2.astype(dtype), _DOT_BACK,
        preferred_element_type=jnp.float32,
    )
    dh = dhd * keep_f * (h_pre > 0.0)
    dx1_total = db_pre + jax.lax.dot_general(
        w1_ref[...].astype(dtype), dh.astype(dtype), _DOT_BACK,
        preferred_element_type=jnp.float32,
    )
    da, dln1_s, dln1_b = _ln_bwd(dx1_total, xhat1, inv1, ln1_s_ref[...])
    d_attn_out = da * keep1
    d_attn = jax.lax.dot_general(
        w_out_ref[...].astype(dtype), d_attn_out.astype(dtype), _DOT_BACK,
        preferred_element_type=jnp.float32,
    )
    dqkv = _attention_bwd(
        qkv, d_attn, n_head=n_head, lp=lp, r_chains=r_chains,
        l_valid=l_valid, seed=seed, rate=rate, col=col,
    )
    dx = da + jax.lax.dot_general(
        w_qkv_ref[...].astype(dtype), dqkv.astype(dtype), _DOT_BACK,
        preferred_element_type=jnp.float32,
    )

    for r in range(r_chains):
        dx_ref[r] = dx[:, r * lp : (r + 1) * lp].astype(dx_ref.dtype)

    # ---- weight-gradient accumulation over the grid ------------------------
    x1_t = x1.astype(dtype)
    contribs = {
        "dw_qkv": jax.lax.dot_general(
            dqkv.astype(dtype), x, _DOT_WGRAD, preferred_element_type=jnp.float32
        ),
        "db_qkv": jnp.sum(dqkv, axis=1, keepdims=True),
        "dw_out": jax.lax.dot_general(
            d_attn_out.astype(dtype), attn, _DOT_WGRAD,
            preferred_element_type=jnp.float32,
        ),
        "db_out": jnp.sum(d_attn_out, axis=1, keepdims=True),
        "dln1_s": dln1_s,
        "dln1_b": dln1_b,
        "dw1": jax.lax.dot_general(
            dh.astype(dtype), x1_t, _DOT_WGRAD, preferred_element_type=jnp.float32
        ),
        "db1": jnp.sum(dh, axis=1, keepdims=True),
        "dw2": jax.lax.dot_general(
            df2.astype(dtype), hd, _DOT_WGRAD, preferred_element_type=jnp.float32
        ),
        "db2": jnp.sum(df2, axis=1, keepdims=True),
        "dln2_s": dln2_s,
        "dln2_b": dln2_b,
    }
    refs = {
        "dw_qkv": dw_qkv_ref, "db_qkv": db_qkv_ref,
        "dw_out": dw_out_ref, "db_out": db_out_ref,
        "dln1_s": dln1_s_ref, "dln1_b": dln1_b_ref,
        "dw1": dw1_ref, "db1": db1_ref, "dw2": dw2_ref, "db2": db2_ref,
        "dln2_s": dln2_s_ref, "dln2_b": dln2_b_ref,
    }
    is_first = pl.program_id(0) == 0
    for name, ref in refs.items():
        contrib = contribs[name].astype(ref.dtype)

        @pl.when(is_first)
        def _init(ref=ref, contrib=contrib):
            ref[...] = contrib

        @pl.when(jnp.logical_not(is_first))
        def _acc(ref=ref, contrib=contrib):
            ref[...] += contrib


_GRAD_KEYS = (
    "w_qkv", "b_qkv", "w_out", "b_out", "ln1_s", "ln1_b",
    "w1", "b1", "w2", "b2", "ln2_s", "ln2_b",
)
assert _GRAD_KEYS == _LAYER_KEYS


def _pick_r(batch: int) -> int:
    import os

    env = os.environ.get("FDIFF_FUSED_TRAIN_R")
    if env:
        r = int(env)
        return r if r >= 1 and batch % r == 0 else 1
    # R=1 is the largest TPU-safe value: the backward kernel's scoped
    # VMEM (recompute + grads over the torch-default d_ff=2048 hidden at
    # Lp=256) measures ~13 MB/chain on v5e — R=2 exceeds the 16 MB limit
    # (measured: 26.6 MB, compile-time OOM). Measured throughput at R=1
    # is 44.2 steps/s vs 25.4 unfused (flagship, batch 64).
    return 1


def _const_spec(arr: Array) -> pl.BlockSpec:
    return pl.BlockSpec(
        arr.shape,
        (lambda i, seed_ref, _n=arr.ndim: (0,) * _n),
        memory_space=pltpu.VMEM,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_encoder_layer_train(cfg: tuple, x: Array, layer: dict, seed: Array) -> Array:
    """One trainable fused encoder layer.

    ``cfg = (n_head, l_valid, rate)`` static; ``x`` is ``(B, D, Lp)``
    transposed activations, ``layer`` the packed weights
    (``pack_encoder_layer``), ``seed`` an int32 scalar for the dropout
    PRNG. Differentiable in ``x`` and ``layer``.
    """
    return _fwd_call(cfg, x, layer, seed)


def _fwd_call(cfg, x, layer, seed):
    n_head, l_valid, rate = cfg
    b, d, lp = x.shape
    r = _pick_r(b)
    x_spec = pl.BlockSpec(
        (r, d, lp), lambda i, seed_ref: (i, 0, 0), memory_space=pltpu.VMEM
    )
    weights = [layer[k] for k in _LAYER_KEYS]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // r,),
        in_specs=[x_spec] + [_const_spec(w) for w in weights],
        out_specs=x_spec,
    )
    kernel = functools.partial(
        _train_fwd_kernel, n_head=n_head, l_valid=l_valid, rate=rate
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_interpret(),
    )(jnp.asarray(seed, jnp.int32).reshape(1), x, *weights)


def _train_fwd(cfg, x, layer, seed):
    return _fwd_call(cfg, x, layer, seed), (x, layer, seed)


def _train_bwd(cfg, res, dy):
    n_head, l_valid, rate = cfg
    x, layer, seed = res
    b, d, lp = x.shape
    r = _pick_r(b)
    x_spec = pl.BlockSpec(
        (r, d, lp), lambda i, seed_ref: (i, 0, 0), memory_space=pltpu.VMEM
    )
    weights = [layer[k] for k in _LAYER_KEYS]
    grad_shapes = [
        jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // r,),
        in_specs=[x_spec, x_spec] + [_const_spec(w) for w in weights],
        out_specs=[x_spec] + [_const_spec(w) for w in weights],
    )
    kernel = functools.partial(
        _train_bwd_kernel, n_head=n_head, l_valid=l_valid, rate=rate
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype)] + grad_shapes,
        interpret=_interpret(),
    )(jnp.asarray(seed, jnp.int32).reshape(1), x, dy, *weights)
    dx = outs[0]
    dlayer = {
        k: g.astype(layer[k].dtype) for k, g in zip(_LAYER_KEYS, outs[1:])
    }
    import numpy as _np

    dseed = _np.zeros((), jax.dtypes.float0)
    return dx, dlayer, dseed


fused_encoder_layer_train.defvjp(_train_fwd, _train_bwd)

__all__ = ["fused_encoder_layer_train"]
