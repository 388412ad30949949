"""Make the reference's model code importable without its heavy deps.

``/root/reference/src/fdiff/models/score_models.py`` imports
``pytorch_lightning``, ``diffusers`` and ``torchvision`` — none of which
are installed here (zero-egress image). Only trivial pieces of each are
actually used by the model *math*:

* ``pl.LightningModule`` — base class; ``save_hyperparameters`` no-op is
  enough for forward-pass parity (we never use Lightning's trainer).
* ``diffusers.optimization.get_cosine_schedule_with_warmup`` — only
  called inside ``configure_optimizers``, which parity tests never call.
* ``torchvision.ops.MLP`` — faithfully re-declared below (the standard
  ``Sequential`` of Linear/activation/Dropout; the reference checkpoints'
  ``backbone.{i}.0/.3`` key layout pins this structure).

Installing these stubs lets tests instantiate the REAL reference
``ScoreModule``/``MLPScoreModule``/``LSTMScoreModule`` and the reference
``DiffusionSampler`` for golden-parity comparisons.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import torch

REFERENCE_SRC = Path("/root/reference/src")


def install_reference_stubs() -> None:
    if str(REFERENCE_SRC) not in sys.path:
        sys.path.insert(0, str(REFERENCE_SRC))

    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            def save_hyperparameters(self, *args, **kwargs) -> None:
                pass

            @property
            def device(self) -> torch.device:
                try:
                    return next(self.parameters()).device
                except StopIteration:  # pragma: no cover
                    return torch.device("cpu")

            def log(self, *args, **kwargs) -> None:
                pass

            def log_dict(self, *args, **kwargs) -> None:
                pass

        pl.LightningModule = LightningModule  # type: ignore[attr-defined]

        class LightningDataModule:
            """Enough of the base class for the reference datamodules
            (``datamodules.py:68``) to instantiate for golden parity."""

            def __init__(self, *args, **kwargs) -> None:
                pass

        pl.LightningDataModule = LightningDataModule  # type: ignore[attr-defined]
        utilities = types.ModuleType("pytorch_lightning.utilities")
        types_mod = types.ModuleType("pytorch_lightning.utilities.types")
        types_mod.OptimizerLRScheduler = object  # type: ignore[attr-defined]
        utilities.types = types_mod  # type: ignore[attr-defined]
        pl.utilities = utilities  # type: ignore[attr-defined]
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.utilities"] = utilities
        sys.modules["pytorch_lightning.utilities.types"] = types_mod

    if "diffusers" not in sys.modules:
        diffusers = types.ModuleType("diffusers")
        optimization = types.ModuleType("diffusers.optimization")

        def get_cosine_schedule_with_warmup(optimizer, *args, **kwargs):
            return torch.optim.lr_scheduler.LambdaLR(optimizer, lambda _: 1.0)

        optimization.get_cosine_schedule_with_warmup = (  # type: ignore[attr-defined]
            get_cosine_schedule_with_warmup
        )
        diffusers.optimization = optimization  # type: ignore[attr-defined]
        sys.modules["diffusers"] = diffusers
        sys.modules["diffusers.optimization"] = optimization

    if "torchvision" not in sys.modules:
        torchvision = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")

        class MLP(torch.nn.Sequential):
            """torchvision.ops.MLP layout (Linear/act/Dropout per hidden,
            final Linear/Dropout) — state-dict keys ``0``/``3`` are the two
            Linears for ``hidden_channels=[d_mlp, d_model]``."""

            def __init__(
                self,
                in_channels: int,
                hidden_channels: list[int],
                norm_layer=None,
                activation_layer=torch.nn.ReLU,
                inplace=None,
                bias: bool = True,
                dropout: float = 0.0,
            ) -> None:
                params = {} if inplace is None else {"inplace": inplace}
                layers: list[torch.nn.Module] = []
                in_dim = in_channels
                for hidden_dim in hidden_channels[:-1]:
                    layers.append(torch.nn.Linear(in_dim, hidden_dim, bias=bias))
                    if norm_layer is not None:
                        layers.append(norm_layer(hidden_dim))
                    layers.append(activation_layer(**params))
                    layers.append(torch.nn.Dropout(dropout, **params))
                    in_dim = hidden_dim
                layers.append(torch.nn.Linear(in_dim, hidden_channels[-1], bias=bias))
                layers.append(torch.nn.Dropout(dropout, **params))
                super().__init__(*layers)

        ops.MLP = MLP  # type: ignore[attr-defined]
        torchvision.ops = ops  # type: ignore[attr-defined]
        sys.modules["torchvision"] = torchvision
        sys.modules["torchvision.ops"] = ops
