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


def setup_compilation_cache() -> Optional[Path]:
    """Enable JAX's persistent compilation cache (VERDICT r03 weak #3).

    Remote TPU compiles are slow (a 1000-step fused sampling program paid
    251.6 s cold in BENCH_r03 vs 55.8 s warm in r02); caching compiled
    executables on disk makes every process after the first warm within a
    boot. The default location is ``<repo>/.jax_cache`` (gitignored) so
    all CLIs/benches on this machine share one cache; override with
    ``FDIFF_COMPILE_CACHE_DIR=<dir>`` or disable with ``=0``/``off``.

    Returns the cache dir in use, or None when disabled.
    """
    env = os.environ.get("FDIFF_COMPILE_CACHE_DIR", "")
    if env.lower() in {"0", "off", "none", "disable"}:
        return None
    cache_dir = Path(env) if env else Path(__file__).resolve().parents[2] / ".jax_cache"
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        # Cache every program (default only caches >1s compiles) and never
        # trade cache hits for compile-time autotuning variance.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as exc:  # pragma: no cover - jax version drift
        logger.warning("Persistent compilation cache unavailable: %s", exc)
        return None
    return cache_dir


def enable_nan_checks() -> None:
    """Opt-in NaN debugging (SURVEY.md §5 item 2): makes any NaN produced
    under jit raise immediately. Also honored via FDIFF_DEBUG_NANS=1."""
    jax.config.update("jax_debug_nans", True)


if os.environ.get("FDIFF_DEBUG_NANS") == "1":  # pragma: no cover
    enable_nan_checks()
