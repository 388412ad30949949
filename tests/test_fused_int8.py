"""W8A8 int8-FFN fused encoder (opt-in sampling path, FDIFF_FUSED_INT8).

The int8 kernel trades exactness for the MXU's 2x int8 issue rate on
the FFN contractions (the attention dots stay bf16 — their head_dim
contraction would LOSE utilization under the (32, 128) int8 tile).
Tests therefore bound the *relative* error of the whole forward rather
than asserting elementwise parity. Runs in interpret mode on CPU;
``FDIFF_TEST_TPU=1`` exercises the Mosaic build.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourierdiffusion_tpu.models.fused import (
    fused_score_forward,
    pack_score_transformer,
)
from fourierdiffusion_tpu.ops.fused_encoder import (
    _quantize_rows,
    _quantize_tokens,
)
from tests.test_fused_encoder import _build


def test_quantize_tokens_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (24, 64)) * jnp.logspace(
        -2, 2, 64
    )  # wildly different per-token magnitudes
    q, s = _quantize_tokens(x.astype(jnp.float32))
    assert q.dtype == jnp.int8
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
    # Round-to-nearest: error <= scale/2 per element, scale = absmax/127.
    assert (err <= np.asarray(s)[0] * 0.5 + 1e-9).all()


def test_quantize_rows_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(1), (32, 48))
    q, s = _quantize_rows(w)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(w))
    assert (err <= np.asarray(s) * 0.5 + 1e-9).all()


def test_pack_layer_int8_keys():
    model, variables, _, _ = _build(19, 1)
    packed = pack_score_transformer(model, variables, int8_ffn=True)
    layer = packed["layers"][0]
    assert "w1_q" in layer and "w2_q" in layer and "w1" not in layer
    assert layer["w1_q"].dtype == jnp.int8
    assert layer["w1_s"].shape == (layer["w1_q"].shape[0], 1)


@pytest.mark.parametrize("max_len,n_channels", [(19, 1), (187, 1)])
def test_int8_forward_close_to_canonical(max_len, n_channels):
    model, variables, x, t = _build(max_len, n_channels)
    ref = np.asarray(model.apply(variables, x, t, deterministic=True))
    out = np.asarray(
        fused_score_forward(
            model, pack_score_transformer(model, variables, int8_ffn=True), x, t
        )
    )
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    # W8A8 FFN with per-token/per-row scales: ~1% per linear; LayerNorm
    # renormalizes between layers so depth does not compound it.
    assert rel < 0.05, rel


def test_int8_env_knob_selects_kernel(monkeypatch):
    model, variables, _, _ = _build(19, 1)
    monkeypatch.setenv("FDIFF_FUSED_INT8", "1")
    packed = pack_score_transformer(model, variables)
    assert "w1_q" in packed["layers"][0]
    monkeypatch.setenv("FDIFF_FUSED_INT8", "0")
    packed = pack_score_transformer(model, variables)
    assert "w1" in packed["layers"][0]


def test_training_pack_never_int8(monkeypatch):
    """The custom-VJP training layer has no int8 variant; the training
    forward must ignore the env knob."""
    monkeypatch.setenv("FDIFF_FUSED_INT8", "1")
    model, variables, x, t = _build(16, 1)
    from fourierdiffusion_tpu.models.fused import fused_score_training_forward

    out = fused_score_training_forward(
        model,
        variables["params"],
        variables["constants"],
        x,
        t,
        jax.random.PRNGKey(3),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_int8_full_sampling_program(monkeypatch):
    """FDIFF_FUSED_INT8 plumbs through make_sample_fn/DiffusionSampler:
    the whole fused reverse chain runs with int8 FFN dots and stays
    close to the bf16 fused chain under the identical RNG stream."""
    from fourierdiffusion_tpu.sampling.sampler import make_sample_fn
    from fourierdiffusion_tpu.schedulers import VPScheduler

    model, variables, _, _ = _build(16, 2)
    scheduler = VPScheduler(fourier_noise_scaling=False)
    kwargs = dict(num_diffusion_steps=5, batch_size=4, max_len=16, n_channels=2)
    key = jax.random.PRNGKey(7)
    monkeypatch.delenv("FDIFF_FUSED_INT8", raising=False)
    ref = np.asarray(make_sample_fn(model, scheduler, fused=True, **kwargs)(variables, key))
    monkeypatch.setenv("FDIFF_FUSED_INT8", "1")
    out = np.asarray(make_sample_fn(model, scheduler, fused=True, **kwargs)(variables, key))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_pack_layer_int8_attn_keys():
    model, variables, _, _ = _build(19, 1)
    packed = pack_score_transformer(model, variables, int8_ffn=2)
    layer = packed["layers"][0]
    assert "w_qkv_q" in layer and "w_out_q" in layer
    assert "w_qkv" not in layer and "w1" not in layer
    assert layer["w_qkv_q"].dtype == jnp.int8
    assert layer["w_qkv_s"].shape == (layer["w_qkv_q"].shape[0], 1)


def test_int8_attn_forward_close_to_canonical():
    model, variables, x, t = _build(19, 1)
    ref = np.asarray(model.apply(variables, x, t, deterministic=True))
    out = np.asarray(
        fused_score_forward(
            model, pack_score_transformer(model, variables, int8_ffn=2), x, t
        )
    )
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    # Full W8A8 (QKV / PV / out-proj / FFN; S dot bf16): per-(head,
    # query) softmax scales keep the PV dequant tight (measured ~0.4%).
    assert rel < 0.05, rel


def test_int8_env_level2_selects_attn_kernel(monkeypatch):
    model, variables, _, _ = _build(19, 1)
    monkeypatch.setenv("FDIFF_FUSED_INT8", "2")
    packed = pack_score_transformer(model, variables)
    assert "w_qkv_q" in packed["layers"][0]


def test_int8_sharded_sampling_on_mesh(monkeypatch):
    """Int8 fused kernels execute under the 8-device data mesh
    (interpret-mode Pallas on the virtual CPU mesh)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from fourierdiffusion_tpu.sampling.sampler import DiffusionSampler
    from fourierdiffusion_tpu.schedulers import VPScheduler

    monkeypatch.setenv("FDIFF_FUSED_INT8", "2")
    devices = np.array(jax.devices())
    mesh = Mesh(devices, axis_names=("data",))
    model, variables, _, _ = _build(16, 2)
    sampler = DiffusionSampler(
        model, VPScheduler(fourier_noise_scaling=False),
        max_len=16, n_channels=2,
        sample_batch_size=len(devices) * 2, mesh=mesh, fused=True,
    )
    out = sampler.sample(
        variables, jax.random.PRNGKey(0), len(devices) * 2, num_diffusion_steps=3
    )
    assert out.shape == (len(devices) * 2, 16, 2)
    assert bool(jnp.all(jnp.isfinite(out)))
