"""Metrics writers: local JSONL always, wandb optionally.

Re-design of the reference's logging (SURVEY.md §5 item 5): the
reference *requires* a wandb run because the run id names the output
directory (``wandb.py:7-17`` + ``cmd/train.py:40`` — crashes without
one). Here the run id is generated independently and wandb is a
strictly optional sink; key names (``train/loss``, ``val/loss``, ``lr``,
``metrics/*``) match the reference so dashboards/notebooks port.
"""

from __future__ import annotations

import json
import logging
import secrets
import time
from pathlib import Path
from typing import Any, Optional

logger = logging.getLogger(__name__)


def generate_run_id() -> str:
    """8-char lowercase id (wandb-style)."""
    return secrets.token_hex(4)


class JsonlWriter:
    """Appends one JSON object per log call to ``metrics.jsonl``."""

    def __init__(self, run_dir: Path) -> None:
        self.path = Path(run_dir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, metrics: dict[str, Any], step: Optional[int] = None) -> None:
        record = {"_time": time.time()}
        if step is not None:
            record["_step"] = step
        record.update(metrics)
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def finish(self) -> None:
        pass


class WandbWriter:
    """Optional wandb sink (project ``FourierDiffusion`` like the
    reference, ``wandb.py:12``)."""

    def __init__(self, config: dict, project: str = "FourierDiffusion") -> None:
        import wandb  # noqa: deferred; optional dependency

        self.run = wandb.init(project=project, config=config)

    @property
    def run_id(self) -> str:
        return str(self.run.id)

    def log(self, metrics: dict[str, Any], step: Optional[int] = None) -> None:
        self.run.log(metrics, step=step)

    def finish(self) -> None:
        self.run.finish()


class MultiWriter:
    def __init__(self, *writers) -> None:
        self.writers = [w for w in writers if w is not None]

    def log(self, metrics: dict[str, Any], step: Optional[int] = None) -> None:
        for w in self.writers:
            w.log(metrics, step=step)

    def finish(self) -> None:
        for w in self.writers:
            w.finish()


def maybe_initialize_wandb(cfg: dict) -> tuple[Optional[WandbWriter], str]:
    """Returns ``(writer_or_None, run_id)``; wandb failures fall back to
    a locally generated id instead of crashing the run."""
    if cfg.get("use_wandb"):
        try:
            from fourierdiffusion_tpu.utils.config import flatten_config

            writer = WandbWriter(flatten_config(cfg))
            return writer, writer.run_id
        except Exception as e:  # pragma: no cover - no wandb in CI image
            logger.warning("wandb init failed (%s); falling back to local id", e)
    return None, generate_run_id()
