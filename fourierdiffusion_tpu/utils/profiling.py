"""Tracing / profiling hooks (SURVEY.md §5 item 1).

The reference has no profiling beyond tqdm progress bars; the TPU
equivalent is ``jax.profiler`` traces plus step-time metrics (the
Trainer already logs ``steps_per_sec`` to metrics.jsonl). Enable a
trace around any region with:

    with trace_if_enabled("train"):
        trainer.fit(dm)

controlled by ``FDIFF_PROFILE_DIR`` (writes a TensorBoard-compatible
trace) so production runs pay zero overhead by default.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from pathlib import Path
from typing import Iterator, Optional

import jax

logger = logging.getLogger(__name__)


def profile_dir() -> Optional[Path]:
    d = os.environ.get("FDIFF_PROFILE_DIR")
    return Path(d) if d else None


@contextlib.contextmanager
def trace_if_enabled(name: str) -> Iterator[None]:
    """jax.profiler trace scoped to this block when FDIFF_PROFILE_DIR is set."""
    d = profile_dir()
    if d is None:
        yield
        return
    out = d / name
    out.mkdir(parents=True, exist_ok=True)
    logger.info("Capturing jax.profiler trace into %s", out)
    with jax.profiler.trace(str(out)):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (shows up in the TensorBoard timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Lightweight wall-clock step timer for throughput metrics."""

    def __init__(self) -> None:
        self._t0 = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self._t0
        self._t0 = now
        return dt


def enable_nan_checks() -> None:
    """Opt-in NaN debugging (SURVEY.md §5 item 2): makes any NaN produced
    under jit raise immediately. Also honored via FDIFF_DEBUG_NANS=1."""
    jax.config.update("jax_debug_nans", True)


if os.environ.get("FDIFF_DEBUG_NANS") == "1":  # pragma: no cover
    enable_nan_checks()
