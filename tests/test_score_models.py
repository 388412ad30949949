"""Score-network tests: forward shapes, init structure, LSTM parity
against torch, and gradient flow (every trainable parameter gets a
nonzero gradient — the JAX analogue of the reference's
"every parameter changed" training check, ``tests/test_score_models.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourierdiffusion_tpu.models import (
    ScoreLSTM,
    ScoreMLP,
    ScoreModelConfig,
    ScoreTransformer,
)

BATCH = 4
MAX_LEN = 20
CHANNELS = 3

# Exact parity is a CPU contract; TPU fp32 dots run as bf16 MXU passes.
PARITY_ATOL = 1e-5 if jax.default_backend() != "tpu" else 5e-3


def _make(model_type: str):
    cfg = ScoreModelConfig(
        model_type=model_type, d_model=24, num_layers=2, n_head=4, d_mlp=64
    )
    model = cfg.build(n_channels=CHANNELS, max_len=MAX_LEN)
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, MAX_LEN, CHANNELS))
    t = jax.random.uniform(jax.random.PRNGKey(1), (BATCH,))
    variables = model.init(jax.random.PRNGKey(2), x, t)
    return model, variables, x, t


@pytest.mark.parametrize("model_type", ["transformer", "mlp", "lstm"])
def test_forward_shape(model_type: str) -> None:
    model, variables, x, t = _make(model_type)
    score = model.apply(variables, x, t)
    assert score.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(score)))


@pytest.mark.parametrize("model_type", ["transformer", "mlp", "lstm"])
def test_gradients_reach_every_param(model_type: str) -> None:
    model, variables, x, t = _make(model_type)
    params = variables["params"]
    constants = {k: v for k, v in variables.items() if k != "params"}

    def loss(p):
        out = model.apply({"params": p, **constants}, x, t)
        return jnp.sum(out**2)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    for path, g in flat:
        name = jax.tree_util.keystr(path)
        assert float(jnp.max(jnp.abs(g))) > 0, f"zero gradient for {name}"


def test_gfp_w_is_constant_collection() -> None:
    _, variables, _, _ = _make("transformer")
    # Frozen GFP weights must live outside "params" so optimizers skip them.
    consts = jax.tree_util.tree_leaves(variables["constants"])
    assert len(consts) == 1
    assert consts[0].shape == ((24 + 1) // 2,)


def test_dropout_changes_training_output() -> None:
    model, variables, x, t = _make("transformer")
    out_det = model.apply(variables, x, t, deterministic=True)
    out_train = model.apply(
        variables, x, t, deterministic=False, rngs={"dropout": jax.random.PRNGKey(3)}
    )
    assert not np.allclose(np.asarray(out_det), np.asarray(out_train))


def test_positional_encoding_max_norm() -> None:
    """Looked-up positional rows obey the sqrt(d_model) max-norm
    (reference semantics of nn.Embedding(max_norm=...),
    tests/test_transformer.py:28-29)."""
    import math

    from fourierdiffusion_tpu.models.blocks import PositionalEncoding

    pe = PositionalEncoding(d_model=8, max_len=16)
    x = jnp.zeros((1, 16, 8))
    variables = pe.init(jax.random.PRNGKey(0), x)
    # Inflate the raw embedding so renorm must kick in.
    variables = jax.tree_util.tree_map(lambda v: v * 100.0, variables)
    out = pe.apply(variables, x)
    norms = jnp.linalg.norm(out[0], axis=-1)
    assert float(jnp.max(norms)) <= math.sqrt(8) + 1e-4


def test_gfp_formula() -> None:
    """GFP features are [sin, cos](2*pi*t*W)[:d_model] through a Linear
    (reference tests/test_transformer.py:44-82)."""
    from fourierdiffusion_tpu.models.blocks import GaussianFourierProjection

    d_model = 6
    gfp = GaussianFourierProjection(d_model=d_model)
    x = jnp.zeros((2, 5, d_model))
    t = jnp.array([0.3, 0.9])
    variables = gfp.init(jax.random.PRNGKey(0), x, t)
    out = gfp.apply(variables, x, t)

    w = variables["constants"]["W"]
    proj = t[:, None] * w[None, :] * 2 * np.pi
    feats = np.concatenate([np.sin(proj), np.cos(proj)], axis=-1)[:, :d_model]
    dense_k = variables["params"]["dense"]["kernel"]
    dense_b = variables["params"]["dense"]["bias"]
    expected = feats @ np.asarray(dense_k) + np.asarray(dense_b)
    np.testing.assert_allclose(
        np.asarray(out[:, 0, :]), expected, atol=PARITY_ATOL
    )
    # Broadcast over the sequence axis: every position gets the same bump.
    np.testing.assert_allclose(np.asarray(out[:, 3, :]), np.asarray(out[:, 0, :]))


def test_lstm_matches_torch() -> None:
    """LSTMLayer reproduces torch nn.LSTM given the same weights."""
    torch = pytest.importorskip("torch")

    from fourierdiffusion_tpu.models.lstm import LSTMLayer

    b, l, d = 3, 11, 8
    layer = LSTMLayer(hidden_size=d)
    x = np.random.default_rng(0).normal(size=(b, l, d)).astype(np.float32)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]

    t_lstm = torch.nn.LSTM(d, d, batch_first=True)
    with torch.no_grad():
        t_lstm.weight_ih_l0.copy_(torch.tensor(np.asarray(p["w_ih"])))
        t_lstm.weight_hh_l0.copy_(torch.tensor(np.asarray(p["w_hh"])))
        t_lstm.bias_ih_l0.copy_(torch.tensor(np.asarray(p["b_ih"])))
        t_lstm.bias_hh_l0.copy_(torch.tensor(np.asarray(p["b_hh"])))
        expected = t_lstm(torch.tensor(x))[0].numpy()

    ours = np.asarray(layer.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, expected, atol=PARITY_ATOL)
