"""Fused transposed-layout encoder (sampling hot path).

The fused kernel must match the canonical flax module exactly — it is a
pure re-layout of the same weights (``models/fused.py``). Runs in
interpret mode on CPU; ``FDIFF_TEST_TPU=1`` exercises the Mosaic build.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourierdiffusion_tpu.models import ScoreModelConfig
from fourierdiffusion_tpu.models.fused import (
    fused_score_forward,
    pack_score_transformer,
)
from fourierdiffusion_tpu.sampling.sampler import make_sample_fn
from fourierdiffusion_tpu.schedulers import VPScheduler

TOL = 3e-5 if jax.default_backend() == "cpu" else 5e-3


def _build(max_len, n_channels, d_model=24, n_head=4, num_layers=2):
    model = ScoreModelConfig(
        model_type="transformer",
        d_model=d_model,
        n_head=n_head,
        num_layers=num_layers,
    ).build(n_channels=n_channels, max_len=max_len)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, max_len, n_channels))
    t = jax.random.uniform(jax.random.PRNGKey(1), (4,))
    variables = model.init(jax.random.PRNGKey(2), x, t)
    return model, variables, x, t


@pytest.mark.parametrize(
    "max_len,n_channels", [(19, 1), (16, 3), (187, 1)]
)
def test_fused_forward_matches_canonical(max_len, n_channels):
    model, variables, x, t = _build(max_len, n_channels)
    ref = model.apply(variables, x, t, deterministic=True)
    out = fused_score_forward(
        model, pack_score_transformer(model, variables), x, t
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=TOL * 10, rtol=TOL
    )


def test_fused_forward_full_tile_head_dim():
    """head_dim == DH_PAD (16): the no-padding branch of the head
    packers — the shape used by the opt-in ``score_model=fast`` config
    (d_model 128, 8 heads; here d_model 64 / 4 heads keeps interpret
    mode cheap)."""
    model, variables, x, t = _build(19, 1, d_model=64, n_head=4)
    ref = model.apply(variables, x, t, deterministic=True)
    out = fused_score_forward(
        model, pack_score_transformer(model, variables), x, t
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=TOL * 10, rtol=TOL
    )


def test_fused_forward_head_dim12():
    """head_dim 12 (pads 12->16, 75% sublane fill): the padding class of
    the opt-in ``heads6`` bench shape (flagship d_model 72 with 6 heads
    instead of the reference 12; here d_model 48 / 4 heads keeps
    interpret mode cheap)."""
    model, variables, x, t = _build(19, 1, d_model=48, n_head=4)
    ref = model.apply(variables, x, t, deterministic=True)
    out = fused_score_forward(
        model, pack_score_transformer(model, variables), x, t
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=TOL * 10, rtol=TOL
    )


@pytest.mark.parametrize("r_chains", [1, 2, 4])
def test_fused_r_chain_blocks_match(r_chains, monkeypatch):
    monkeypatch.setenv("FDIFF_FUSED_R", str(r_chains))
    model, variables, x, t = _build(19, 1)
    ref = model.apply(variables, x, t, deterministic=True)
    out = fused_score_forward(
        model, pack_score_transformer(model, variables), x, t
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=TOL * 10, rtol=TOL
    )


def test_fused_sampler_matches_canonical_sampler():
    model, variables, _, _ = _build(16, 2)
    scheduler = VPScheduler(fourier_noise_scaling=False)
    kwargs = dict(
        num_diffusion_steps=5, batch_size=4, max_len=16, n_channels=2
    )
    ref_fn = make_sample_fn(model, scheduler, fused=False, **kwargs)
    fused_fn = make_sample_fn(model, scheduler, fused=True, **kwargs)
    key = jax.random.PRNGKey(7)
    ref = np.asarray(ref_fn(variables, key))
    out = np.asarray(fused_fn(variables, key))
    # Same RNG stream; only the forward numerics differ.
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)


def test_fused_rejects_unsupported_models():
    model = ScoreModelConfig(model_type="mlp").build(n_channels=1, max_len=16)
    with pytest.raises(ValueError):
        make_sample_fn(
            model,
            VPScheduler(),
            num_diffusion_steps=2,
            batch_size=2,
            max_len=16,
            n_channels=1,
            fused=True,
        )
