"""Fused TRAINING encoder layer: value + gradient contracts.

Two oracles:

* dropout OFF — the canonical flax model differentiated by jax: the
  handwritten backward must match autodiff end to end (full model).
* dropout ON — the kernel's own masks are extracted via the shared
  ``_keep`` PRNG contract, a pure-jnp replica of the layer is built with
  those masks, and jax autodiff of the replica must match the custom
  VJP exactly (no finite-difference noise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fourierdiffusion_tpu.models import ScoreModelConfig
from fourierdiffusion_tpu.models.fused import (
    fused_score_training_forward,
    pack_score_transformer,
)
from fourierdiffusion_tpu.ops import fused_encoder_train as fet
from fourierdiffusion_tpu.ops.flash_attention import DH_PAD, _interpret

L, C, D, H = 19, 2, 24, 4
LP, F = 128, 2048
RATE = 0.3
SEED = 1234


def _tol():
    return 1e-4 if jax.default_backend() == "cpu" else 5e-3


def test_deterministic_matches_canonical_autodiff():
    model = ScoreModelConfig(
        model_type="transformer", d_model=D, n_head=H, num_layers=2,
        dropout_rate=0.0,
    ).build(C, L)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, L, C))
    t = jax.random.uniform(jax.random.PRNGKey(1), (4,))
    variables = model.init(jax.random.PRNGKey(2), x, t)
    params, constants = variables["params"], variables["constants"]
    key = jax.random.PRNGKey(9)

    def loss_canon(p):
        out = model.apply(
            {"params": p, "constants": constants}, x, t, deterministic=True
        )
        return jnp.sum(out**2)

    def loss_fused(p):
        return jnp.sum(
            fused_score_training_forward(model, p, constants, x, t, key) ** 2
        )

    v1, g1 = jax.value_and_grad(loss_canon)(params)
    v2, g2 = jax.value_and_grad(loss_fused)(params)
    assert abs(float(v1 - v2)) / abs(float(v1)) < _tol()
    for (k1, a), (k2, b) in zip(
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(g2),
    ):
        assert k1 == k2
        denom = max(float(jnp.max(jnp.abs(a))), 1e-6)
        rel = float(jnp.max(jnp.abs(a - b))) / denom
        assert rel < _tol() * 10, (jax.tree_util.keystr(k1), rel)


def _layer_and_input(monkeypatch):
    monkeypatch.setenv("FDIFF_FUSED_TRAIN_R", "1")
    model = ScoreModelConfig(
        model_type="transformer", d_model=D, n_head=H, num_layers=1,
        dropout_rate=RATE,
    ).build(C, L)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, L, C))
    variables = model.init(jax.random.PRNGKey(2), x0, jnp.zeros((2,)))
    layer = pack_score_transformer(model, variables)["layers"][0]
    xt = jax.random.normal(jax.random.PRNGKey(3), (2, D, LP)) * 0.5
    return layer, xt


def _extract_masks(batch: int):
    """Replicate the kernel's per-(program, site) mask stream."""
    hp = H * DH_PAD
    shapes = {
        "attn": (H, LP, LP),
        "out": (D, LP),
        "ff": (F, LP),
        "ff2": (D, LP),
    }
    sites = {
        "attn": fet._SITE_ATTN,
        "out": fet._SITE_OUT,
        "ff": fet._SITE_FF,
        "ff2": fet._SITE_FF2,
    }
    del hp

    def kernel(seed_ref, attn_ref, out_ref, ff_ref, ff2_ref):
        attn_ref[0] = fet._keep(shapes["attn"], RATE, seed_ref[0], sites["attn"], extra=0)
        out_ref[0] = fet._keep(shapes["out"], RATE, seed_ref[0], sites["out"])
        ff_ref[0] = fet._keep(shapes["ff"], RATE, seed_ref[0], sites["ff"])
        ff2_ref[0] = fet._keep(shapes["ff2"], RATE, seed_ref[0], sites["ff2"])

    def spec(shape):
        return pl.BlockSpec(
            (1,) + shape,
            (lambda b, s, _n=len(shape): (b,) + (0,) * _n),
            memory_space=pltpu.VMEM,
        )

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch,),
        in_specs=[],
        out_specs=[spec(shapes[k]) for k in ("attn", "out", "ff", "ff2")],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=gs,
        out_shape=[
            jax.ShapeDtypeStruct((batch,) + shapes[k], jnp.float32)
            for k in ("attn", "out", "ff", "ff2")
        ],
        interpret=_interpret(),
    )(jnp.asarray([SEED], jnp.int32))
    return dict(zip(("attn", "out", "ff", "ff2"), outs))


def _ref_layer(x, layer, masks):
    """Pure-jnp replica (transposed layout, fp32 stats) with the
    extracted masks injected."""
    hp = H * DH_PAD

    def ln(v, scale, bias):
        mean = jnp.mean(v, axis=1, keepdims=True)
        c = v - mean
        var = jnp.mean(c * c, axis=1, keepdims=True)
        return (c * jax.lax.rsqrt(var + 1e-5)) * scale + bias

    qkv = jnp.einsum("md,bdl->bml", layer["w_qkv"], x) + layer["b_qkv"]
    q = qkv[:, :hp].reshape(-1, H, DH_PAD, LP)
    k = qkv[:, hp : 2 * hp].reshape(-1, H, DH_PAD, LP)
    v = qkv[:, 2 * hp :].reshape(-1, H, DH_PAD, LP)
    s = jnp.einsum("bhdi,bhdj->bhij", q, k)
    col = jnp.arange(LP)[None, None, None, :]
    s = jnp.where(col < L, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    pd = p * masks["attn"]
    o = jnp.einsum("bhdj,bhij->bhdi", v, pd).reshape(-1, hp, LP)
    attn_out = jnp.einsum("dm,bml->bdl", layer["w_out"], o) + layer["b_out"]
    a = x + attn_out * masks["out"]
    x1 = ln(a, layer["ln1_s"], layer["ln1_b"])
    h = jnp.maximum(jnp.einsum("fd,bdl->bfl", layer["w1"], x1) + layer["b1"], 0.0)
    hd = h * masks["ff"]
    f2 = jnp.einsum("df,bfl->bdl", layer["w2"], hd) + layer["b2"]
    b = x1 + f2 * masks["ff2"]
    return ln(b, layer["ln2_s"], layer["ln2_b"])


def test_dropout_value_and_grads_match_extracted_mask_oracle(monkeypatch):
    layer, xt = _layer_and_input(monkeypatch)
    masks = _extract_masks(batch=2)
    cfg = (H, L, RATE)

    y_kernel = fet.fused_encoder_layer_train(cfg, xt, layer, jnp.int32(SEED))
    y_ref = _ref_layer(xt, layer, masks)
    np.testing.assert_allclose(
        np.asarray(y_kernel), np.asarray(y_ref), atol=1e-4, rtol=1e-4
    )

    def loss_kernel(x, l):
        return jnp.sum(
            jnp.tanh(fet.fused_encoder_layer_train(cfg, x, l, jnp.int32(SEED)))
        )

    def loss_ref(x, l):
        return jnp.sum(jnp.tanh(_ref_layer(x, l, masks)))

    (gx1, gl1) = jax.grad(loss_kernel, argnums=(0, 1))(xt, layer)
    (gx2, gl2) = jax.grad(loss_ref, argnums=(0, 1))(xt, layer)
    np.testing.assert_allclose(
        np.asarray(gx1), np.asarray(gx2), atol=2e-3, rtol=2e-3
    )
    for key in gl1:
        a, b = np.asarray(gl1[key], np.float32), np.asarray(gl2[key], np.float32)
        denom = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 2e-3, key


def test_dropout_seed_determinism(monkeypatch):
    layer, xt = _layer_and_input(monkeypatch)
    cfg = (H, L, RATE)
    f = functools.partial(fet.fused_encoder_layer_train, cfg, xt, layer)
    a, b, c = f(jnp.int32(7)), f(jnp.int32(7)), f(jnp.int32(8))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_trainer_fast_path_trains(monkeypatch):
    """End-to-end: the fused training forward drives a full fit() and
    the loss decreases."""
    monkeypatch.setenv("FDIFF_FUSED_TRAIN", "1")
    from fourierdiffusion_tpu.data.datamodules import DummyDatamodule
    from fourierdiffusion_tpu.schedulers import VPScheduler
    from fourierdiffusion_tpu.training.trainer import Trainer

    dm = DummyDatamodule(batch_size=8, n_channels=1, max_len=16, random_seed=0)
    dm.prepare_data()
    dm.setup()
    model = ScoreModelConfig(
        model_type="transformer", d_model=8, num_layers=1, n_head=2
    ).build(1, 16)
    trainer = Trainer(model, VPScheduler(), max_epochs=3, lr_max=1e-3, seed=0)
    trainer.fit(dm)
    losses = [h["train/loss"] for h in trainer.history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_fused_train_default(monkeypatch):
    """Fused training defaults ON for TPU backends (the collapse was
    root-caused to stochastic-stream luck, not a kernel defect —
    RESULTS.md "fused-training collapse: root cause") and is
    env-forceable both ways on any backend."""
    import jax

    from fourierdiffusion_tpu.schedulers import VPScheduler
    from fourierdiffusion_tpu.training.trainer import Trainer

    model = ScoreModelConfig(
        model_type="transformer", d_model=8, num_layers=1, n_head=2
    ).build(1, 16)
    trainer = Trainer(model, VPScheduler(), max_epochs=1)

    monkeypatch.delenv("FDIFF_FUSED_TRAIN", raising=False)
    on_tpu = jax.default_backend() == "tpu"
    assert trainer._use_fused_train() is on_tpu
    monkeypatch.setenv("FDIFF_FUSED_TRAIN", "1")
    assert trainer._use_fused_train() is True
    monkeypatch.setenv("FDIFF_FUSED_TRAIN", "0")
    assert trainer._use_fused_train() is False
