"""Forward-pass parity against the REAL reference score networks.

These tests instantiate the actual reference modules
(``/root/reference/src/fdiff/models/score_models.py``, via the minimal
dependency stubs in ``_reference_stubs``), export a genuine
``torch.save`` Lightning-style checkpoint, import it through
``utils/torch_import.py``, and assert the JAX forward matches the torch
forward on shared inputs. This covers the full import contract end to
end — weight orientation, QKV packing, GFP constants, MLP Sequential
indices, LSTM gate layout — against the code that produced the weights,
not a reimplementation.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("torch")
if not Path("/root/reference/src").exists():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)

from _reference_stubs import install_reference_stubs  # noqa: E402

install_reference_stubs()

import torch  # noqa: E402

from fdiff.models.score_models import (  # noqa: E402  (reference code)
    LSTMScoreModule,
    MLPScoreModule,
    ScoreModule,
)
from fdiff.schedulers.sde import VPScheduler as RefVP  # noqa: E402
from fdiff.utils.dataclasses import DiffusableBatch as RefBatch  # noqa: E402

from fourierdiffusion_tpu.models import ScoreModelConfig  # noqa: E402
from fourierdiffusion_tpu.utils.torch_import import import_checkpoint  # noqa: E402

N_CHANNELS, MAX_LEN = 2, 19
D_MODEL, N_HEAD, NUM_LAYERS = 24, 4, 2


def _ref_module(model_type: str):
    torch.manual_seed(0)
    scheduler = RefVP(fourier_noise_scaling=True)
    common = dict(
        n_channels=N_CHANNELS,
        max_len=MAX_LEN,
        noise_scheduler=scheduler,
        d_model=D_MODEL,
        num_layers=NUM_LAYERS,
    )
    if model_type == "transformer":
        return ScoreModule(n_head=N_HEAD, **common)
    if model_type == "mlp":
        return MLPScoreModule(d_mlp=48, **common)
    return LSTMScoreModule(**common)


def _our_model(model_type: str):
    return ScoreModelConfig(
        model_type=model_type,
        d_model=D_MODEL,
        num_layers=NUM_LAYERS,
        n_head=N_HEAD,
        d_mlp=48,
    ).build(n_channels=N_CHANNELS, max_len=MAX_LEN)


@pytest.mark.parametrize("model_type", ["transformer", "mlp", "lstm"])
def test_forward_parity_with_reference_checkpoint(model_type, tmp_path):
    ref = _ref_module(model_type).eval()

    # A genuine Lightning-style checkpoint artifact.
    ckpt = tmp_path / "epoch=0-val_loss=0.10.ckpt"
    torch.save({"state_dict": ref.state_dict(), "epoch": 0}, ckpt)

    variables = import_checkpoint(ckpt, model_type, num_layers=NUM_LAYERS)
    model = _our_model(model_type)

    x = np.random.default_rng(3).standard_normal(
        (8, MAX_LEN, N_CHANNELS)
    ).astype(np.float32)
    t = np.linspace(0.02, 0.98, 8).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(
            RefBatch(X=torch.from_numpy(x), timesteps=torch.from_numpy(t))
        ).numpy()
    our_out = np.asarray(
        model.apply(variables, jnp.asarray(x), jnp.asarray(t), deterministic=True)
    )

    tol = 1e-4 if jax.default_backend() == "cpu" else 5e-3
    np.testing.assert_allclose(our_out, ref_out, atol=tol, rtol=tol)


def test_fused_forward_parity_with_reference(tmp_path):
    """The fused sampling-path forward must ALSO match the reference."""
    from fourierdiffusion_tpu.models.fused import (
        fused_score_forward,
        pack_score_transformer,
    )

    ref = _ref_module("transformer").eval()
    ckpt = tmp_path / "ref.ckpt"
    torch.save({"state_dict": ref.state_dict()}, ckpt)
    variables = import_checkpoint(ckpt, "transformer", num_layers=NUM_LAYERS)
    model = _our_model("transformer")

    x = np.random.default_rng(5).standard_normal(
        (4, MAX_LEN, N_CHANNELS)
    ).astype(np.float32)
    t = np.linspace(0.1, 0.9, 4).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(
            RefBatch(X=torch.from_numpy(x), timesteps=torch.from_numpy(t))
        ).numpy()
    packed = pack_score_transformer(model, variables)
    our_out = np.asarray(
        fused_score_forward(model, packed, jnp.asarray(x), jnp.asarray(t))
    )
    tol = 1e-4 if jax.default_backend() == "cpu" else 5e-3
    np.testing.assert_allclose(our_out, ref_out, atol=tol, rtol=tol)
