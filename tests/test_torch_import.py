"""Checkpoint-import parity: a torch model with the reference
architecture (built from torch built-ins per SURVEY.md §2's component
descriptions) is exported through the importer and must produce the
same scores as our flax networks — the numerical-parity contract for
loading reference Lightning checkpoints.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from fourierdiffusion_tpu.models import ScoreModelConfig  # noqa: E402
# Import parity is exact at CPU fp32 precision; on real TPU, fp32 dots
# run as bf16 passes on the MXU, so the achievable tolerance is coarser.
ATOL = 2e-5 if jax.default_backend() != "tpu" else 1e-2

from fourierdiffusion_tpu.utils.torch_import import (  # noqa: E402
    import_lstm_state_dict,
    import_mlp_state_dict,
    import_transformer_state_dict,
)

B, L, C = 4, 12, 2
D_MODEL, N_HEAD, N_LAYERS = 8, 2, 2


class _TorchGFP(tnn.Module):
    """Reference GFP semantics (transformer.py:63-91)."""

    def __init__(self, d_model):
        super().__init__()
        self.d_model = d_model
        self.W = tnn.Parameter(torch.randn((d_model + 1) // 2) * 30.0, requires_grad=False)
        self.dense = tnn.Linear(d_model, d_model)

    def forward(self, x, t, use_time_axis=True):
        proj = t[:, None] * self.W[None, :] * 2 * math.pi
        emb = torch.cat([torch.sin(proj), torch.cos(proj)], dim=-1)[:, : self.d_model]
        if use_time_axis:
            emb = emb.unsqueeze(1)
        return x + self.dense(emb)


class _TorchScoreTransformer(tnn.Module):
    """Reference ScoreModule architecture from torch built-ins
    (score_models.py:22-94)."""

    def __init__(self):
        super().__init__()
        self.embedder = tnn.Linear(C, D_MODEL)
        self.unembedder = tnn.Linear(D_MODEL, C)
        self.pos_encoder = tnn.Embedding(L, D_MODEL, max_norm=math.sqrt(D_MODEL))
        self.time_encoder = _TorchGFP(D_MODEL)
        layer = tnn.TransformerEncoderLayer(D_MODEL, N_HEAD, batch_first=True)
        self.backbone = tnn.TransformerEncoder(layer, num_layers=N_LAYERS)

    def state_dict_like_reference(self):
        sd = {}
        sd["embedder.weight"] = self.embedder.weight
        sd["embedder.bias"] = self.embedder.bias
        sd["unembedder.weight"] = self.unembedder.weight
        sd["unembedder.bias"] = self.unembedder.bias
        sd["pos_encoder.embedding.weight"] = self.pos_encoder.weight
        sd["time_encoder.W"] = self.time_encoder.W
        sd["time_encoder.dense.weight"] = self.time_encoder.dense.weight
        sd["time_encoder.dense.bias"] = self.time_encoder.dense.bias
        for i, lyr in enumerate(self.backbone.layers):
            p = f"backbone.layers.{i}"
            sd[f"{p}.self_attn.in_proj_weight"] = lyr.self_attn.in_proj_weight
            sd[f"{p}.self_attn.in_proj_bias"] = lyr.self_attn.in_proj_bias
            sd[f"{p}.self_attn.out_proj.weight"] = lyr.self_attn.out_proj.weight
            sd[f"{p}.self_attn.out_proj.bias"] = lyr.self_attn.out_proj.bias
            sd[f"{p}.norm1.weight"] = lyr.norm1.weight
            sd[f"{p}.norm1.bias"] = lyr.norm1.bias
            sd[f"{p}.norm2.weight"] = lyr.norm2.weight
            sd[f"{p}.norm2.bias"] = lyr.norm2.bias
            sd[f"{p}.linear1.weight"] = lyr.linear1.weight
            sd[f"{p}.linear1.bias"] = lyr.linear1.bias
            sd[f"{p}.linear2.weight"] = lyr.linear2.weight
            sd[f"{p}.linear2.bias"] = lyr.linear2.bias
        return {k: v.detach().numpy() for k, v in sd.items()}

    def forward(self, x, t):
        x = self.embedder(x)
        pos = torch.arange(x.size(1)).unsqueeze(0)
        x = x + self.pos_encoder(pos)
        x = self.time_encoder(x, t)
        x = self.backbone(x)
        return self.unembedder(x)


def test_transformer_forward_parity() -> None:
    torch.manual_seed(0)
    tmodel = _TorchScoreTransformer().eval()
    x = torch.randn(B, L, C)
    t = torch.rand(B)
    with torch.no_grad():
        expected = tmodel(x, t).numpy()

    variables = jax.tree_util.tree_map(
        jnp.asarray,
        import_transformer_state_dict(tmodel.state_dict_like_reference(), N_LAYERS),
    )
    model = ScoreModelConfig(
        model_type="transformer", d_model=D_MODEL, num_layers=N_LAYERS, n_head=N_HEAD,
        use_pallas=False,
    ).build(n_channels=C, max_len=L)
    ours = np.asarray(model.apply(variables, jnp.asarray(x.numpy()), jnp.asarray(t.numpy())))
    np.testing.assert_allclose(ours, expected, atol=ATOL)


def test_mlp_forward_parity() -> None:
    torch.manual_seed(1)
    d_mlp = 16

    class TorchMLPScore(tnn.Module):
        def __init__(self):
            super().__init__()
            self.embedder = tnn.Linear(L * C, D_MODEL)
            self.unembedder = tnn.Linear(D_MODEL, L * C)
            self.time_encoder = _TorchGFP(D_MODEL)
            # torchvision MLP layout: Linear, ReLU, Dropout, Linear, Dropout.
            self.backbone = tnn.ModuleList(
                [
                    tnn.Sequential(
                        tnn.Linear(D_MODEL, d_mlp),
                        tnn.ReLU(),
                        tnn.Dropout(0.1),
                        tnn.Linear(d_mlp, D_MODEL),
                        tnn.Dropout(0.1),
                    )
                    for _ in range(N_LAYERS)
                ]
            )

        def forward(self, x, t):
            x = x.reshape(x.size(0), -1)
            x = self.embedder(x)
            x = self.time_encoder(x, t, use_time_axis=False)
            for lyr in self.backbone:
                x = x + lyr(x)
            x = self.unembedder(x)
            return x.reshape(-1, L, C)

    tmodel = TorchMLPScore().eval()
    x = torch.randn(B, L, C)
    t = torch.rand(B)
    with torch.no_grad():
        expected = tmodel(x, t).numpy()

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = jax.tree_util.tree_map(
        jnp.asarray, import_mlp_state_dict(sd, N_LAYERS)
    )
    model = ScoreModelConfig(
        model_type="mlp", d_model=D_MODEL, num_layers=N_LAYERS, d_mlp=d_mlp
    ).build(n_channels=C, max_len=L)
    ours = np.asarray(model.apply(variables, jnp.asarray(x.numpy()), jnp.asarray(t.numpy())))
    np.testing.assert_allclose(ours, expected, atol=ATOL)


def test_lstm_forward_parity() -> None:
    torch.manual_seed(2)

    class TorchLSTMScore(tnn.Module):
        def __init__(self):
            super().__init__()
            self.embedder = tnn.Linear(C, D_MODEL)
            self.unembedder = tnn.Linear(D_MODEL, C)
            self.time_encoder = _TorchGFP(D_MODEL)
            self.backbone = tnn.ModuleList(
                [tnn.LSTM(D_MODEL, D_MODEL, batch_first=True) for _ in range(N_LAYERS)]
            )

        def forward(self, x, t):
            x = self.embedder(x)
            x = self.time_encoder(x, t)
            for lyr in self.backbone:
                x = x + lyr(x)[0]
            return self.unembedder(x)

    tmodel = TorchLSTMScore().eval()
    x = torch.randn(B, L, C)
    t = torch.rand(B)
    with torch.no_grad():
        expected = tmodel(x, t).numpy()

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = jax.tree_util.tree_map(
        jnp.asarray, import_lstm_state_dict(sd, N_LAYERS)
    )
    model = ScoreModelConfig(
        model_type="lstm", d_model=D_MODEL, num_layers=N_LAYERS
    ).build(n_channels=C, max_len=L)
    ours = np.asarray(model.apply(variables, jnp.asarray(x.numpy()), jnp.asarray(t.numpy())))
    np.testing.assert_allclose(ours, expected, atol=ATOL)
