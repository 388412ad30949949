"""Import reference (torch Lightning) checkpoints into flax variables.

The north star requires matching reference Lightning checkpoints to
numerical tolerance; since torch and JAX RNGs differ, parity comes from
*loading* reference weights, not re-seeding (SURVEY.md §7 "Numerical
parity with torch"). This maps the reference ``ScoreModule`` /
``MLPScoreModule`` / ``LSTMScoreModule`` state dicts
(``src/fdiff/models/score_models.py``) onto our parameter trees:

* torch ``Linear.weight`` is ``(out, in)`` -> flax ``kernel`` is its
  transpose;
* ``nn.MultiheadAttention`` packed ``in_proj_weight/bias`` map onto the
  ``in_proj`` TorchLinear (same packing: q, k, v stacked);
* the GFP's frozen ``W`` lands in the ``constants`` collection;
* torchvision MLP blocks are ``Sequential`` indices 0 (fc1) and 3 (fc2);
* LSTM ``weight_ih_l0``/... keep their (4H, D) orientation.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _a(w) -> np.ndarray:
    return np.asarray(w)


def load_torch_state_dict(path: Path) -> dict[str, np.ndarray]:
    """Read a Lightning ``.ckpt`` (or raw ``torch.save`` dict) to numpy."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    state = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def _linear(sd: Mapping[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    return {"kernel": _t(sd[f"{prefix}.weight"]), "bias": _a(sd[f"{prefix}.bias"])}


def _layernorm(sd: Mapping[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    return {"scale": _a(sd[f"{prefix}.weight"]), "bias": _a(sd[f"{prefix}.bias"])}


def import_transformer_state_dict(
    sd: Mapping[str, np.ndarray], num_layers: int
) -> dict[str, Any]:
    """Reference ``ScoreModule`` -> our ``ScoreTransformer`` variables."""
    params: dict[str, Any] = {
        "embedder": _linear(sd, "embedder"),
        "unembedder": _linear(sd, "unembedder"),
        "pos_encoder": {"embedding": _a(sd["pos_encoder.embedding.weight"])},
        "time_encoder": {"dense": _linear(sd, "time_encoder.dense")},
    }
    backbone: dict[str, Any] = {}
    for i in range(num_layers):
        p = f"backbone.layers.{i}"
        backbone[f"layers_{i}"] = {
            "self_attn": {
                "in_proj": {
                    "kernel": _t(sd[f"{p}.self_attn.in_proj_weight"]),
                    "bias": _a(sd[f"{p}.self_attn.in_proj_bias"]),
                },
                "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
            },
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "linear1": _linear(sd, f"{p}.linear1"),
            "linear2": _linear(sd, f"{p}.linear2"),
        }
    params["backbone"] = backbone
    constants = {"time_encoder": {"W": _a(sd["time_encoder.W"])}}
    return {"params": params, "constants": constants}


def import_mlp_state_dict(
    sd: Mapping[str, np.ndarray], num_layers: int
) -> dict[str, Any]:
    """Reference ``MLPScoreModule`` -> our ``ScoreMLP`` variables."""
    params: dict[str, Any] = {
        "embedder": _linear(sd, "embedder"),
        "unembedder": _linear(sd, "unembedder"),
        "time_encoder": {"dense": _linear(sd, "time_encoder.dense")},
    }
    for i in range(num_layers):
        params[f"backbone_{i}"] = {
            "fc1": _linear(sd, f"backbone.{i}.0"),
            "fc2": _linear(sd, f"backbone.{i}.3"),
        }
    constants = {"time_encoder": {"W": _a(sd["time_encoder.W"])}}
    return {"params": params, "constants": constants}


def import_lstm_state_dict(
    sd: Mapping[str, np.ndarray], num_layers: int
) -> dict[str, Any]:
    """Reference ``LSTMScoreModule`` -> our ``ScoreLSTM`` variables."""
    params: dict[str, Any] = {
        "embedder": _linear(sd, "embedder"),
        "unembedder": _linear(sd, "unembedder"),
        "time_encoder": {"dense": _linear(sd, "time_encoder.dense")},
    }
    for i in range(num_layers):
        p = f"backbone.{i}"
        params[f"backbone_{i}"] = {
            "w_ih": _a(sd[f"{p}.weight_ih_l0"]),
            "w_hh": _a(sd[f"{p}.weight_hh_l0"]),
            "b_ih": _a(sd[f"{p}.bias_ih_l0"]),
            "b_hh": _a(sd[f"{p}.bias_hh_l0"]),
        }
    constants = {"time_encoder": {"W": _a(sd["time_encoder.W"])}}
    return {"params": params, "constants": constants}


_IMPORTERS = {
    "transformer": import_transformer_state_dict,
    "mlp": import_mlp_state_dict,
    "lstm": import_lstm_state_dict,
}


def import_checkpoint(
    path: Path, model_type: str, num_layers: int
) -> dict[str, Any]:
    """One-way reference ``.ckpt`` -> flax variables importer."""
    sd = load_torch_state_dict(Path(path))
    import jax.numpy as jnp
    import jax

    tree = _IMPORTERS[model_type](sd, num_layers)
    return jax.tree_util.tree_map(jnp.asarray, tree)


# ---------------------------------------------------------------------------
# Export (flax variables -> reference torch state dict). The inverse of
# the importers above; lets users move checkpoints back to the reference
# and enables full-chain golden-parity tests (the reference sampler
# running OUR weights).
# ---------------------------------------------------------------------------


def _lin_out(tree: Mapping[str, Any], prefix: str, out: dict) -> None:
    out[f"{prefix}.weight"] = _t(tree["kernel"])
    out[f"{prefix}.bias"] = _a(tree["bias"])


def _ln_out(tree: Mapping[str, Any], prefix: str, out: dict) -> None:
    out[f"{prefix}.weight"] = _a(tree["scale"])
    out[f"{prefix}.bias"] = _a(tree["bias"])


def export_torch_state_dict(
    variables: Mapping[str, Any], model_type: str, num_layers: int
) -> dict[str, np.ndarray]:
    """Our variables pytree -> reference ``state_dict`` (numpy values)."""
    params = variables["params"]
    out: dict[str, np.ndarray] = {
        "time_encoder.W": _a(variables["constants"]["time_encoder"]["W"]),
    }
    _lin_out(params["embedder"], "embedder", out)
    _lin_out(params["unembedder"], "unembedder", out)
    _lin_out(params["time_encoder"]["dense"], "time_encoder.dense", out)

    if model_type == "transformer":
        out["pos_encoder.embedding.weight"] = _a(
            params["pos_encoder"]["embedding"]
        )
        for i in range(num_layers):
            layer = params["backbone"][f"layers_{i}"]
            p = f"backbone.layers.{i}"
            out[f"{p}.self_attn.in_proj_weight"] = _t(
                layer["self_attn"]["in_proj"]["kernel"]
            )
            out[f"{p}.self_attn.in_proj_bias"] = _a(
                layer["self_attn"]["in_proj"]["bias"]
            )
            _lin_out(layer["self_attn"]["out_proj"], f"{p}.self_attn.out_proj", out)
            _ln_out(layer["norm1"], f"{p}.norm1", out)
            _ln_out(layer["norm2"], f"{p}.norm2", out)
            _lin_out(layer["linear1"], f"{p}.linear1", out)
            _lin_out(layer["linear2"], f"{p}.linear2", out)
    elif model_type == "mlp":
        for i in range(num_layers):
            _lin_out(params[f"backbone_{i}"]["fc1"], f"backbone.{i}.0", out)
            _lin_out(params[f"backbone_{i}"]["fc2"], f"backbone.{i}.3", out)
    elif model_type == "lstm":
        for i in range(num_layers):
            blk = params[f"backbone_{i}"]
            p = f"backbone.{i}"
            out[f"{p}.weight_ih_l0"] = _a(blk["w_ih"])
            out[f"{p}.weight_hh_l0"] = _a(blk["w_hh"])
            out[f"{p}.bias_ih_l0"] = _a(blk["b_ih"])
            out[f"{p}.bias_hh_l0"] = _a(blk["b_hh"])
    else:
        raise ValueError(f"Unknown model_type: {model_type!r}")
    return out
