"""Sample-quality metrics: sliced/marginal Wasserstein collections.

Feature parity with the reference ``src/fdiff/sampling/metrics.py``:
``MetricCollection`` duplicates each metric for the time and frequency
domains (keys prefixed ``time_`` / ``freq_``), optionally adds
baselines (half-train "self" and mean-sample "dummy") and a spectral-
density MarginalWasserstein (``spectral_`` prefix), and returns the
result dict sorted by key — so ``results.yaml`` stays drop-in for the
reference's analysis notebooks.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Optional

import numpy as np

from fourierdiffusion_tpu.ops.fourier import dft, spectral_density
from fourierdiffusion_tpu.ops.wasserstein import (
    check_flat_array,
    marginal_w2,
    sliced_w2,
)


class Metric(ABC):
    def __init__(self, original_samples) -> None:
        self.original_samples = check_flat_array(original_samples)

    @abstractmethod
    def __call__(self, other_samples) -> dict[str, Any]: ...

    @property
    @abstractmethod
    def name(self) -> str: ...

    @property
    def baseline_metrics(self) -> dict[str, float]:
        return {}


class SlicedWasserstein(Metric):
    """Mean/max W2 over random unit projections
    (reference ``metrics.py:100-158``)."""

    def __init__(
        self,
        original_samples,
        random_seed: int,
        num_directions: int,
        save_all_distances: bool = False,
        normalisation: str = "none",
    ) -> None:
        super().__init__(original_samples)
        self.random_seed = random_seed
        self.num_directions = num_directions
        self.save_all_distances = save_all_distances
        self.normalisation = normalisation

    def _distances(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return sliced_w2(
            a,
            b,
            num_directions=self.num_directions,
            seed=self.random_seed,
            normalisation=self.normalisation,
        )

    def __call__(self, other_samples) -> dict[str, Any]:
        d = self._distances(self.original_samples, check_flat_array(other_samples))
        out: dict[str, Any] = {
            "sliced_wasserstein_mean": float(np.mean(d)),
            "sliced_wasserstein_max": float(np.max(d)),
        }
        if self.save_all_distances:
            out["sliced_wasserstein_all"] = d.tolist()
        return out

    @property
    def baseline_metrics(self) -> dict[str, float]:
        n = self.original_samples.shape[0]
        d_self = self._distances(
            self.original_samples[: n // 2], self.original_samples[n // 2 :]
        )
        avg = np.mean(self.original_samples, axis=0, keepdims=True)
        d_dummy = self._distances(self.original_samples, avg)
        return {
            "sliced_wasserstein_mean_self": float(np.mean(d_self)),
            "sliced_wasserstein_max_self": float(np.max(d_self)),
            "sliced_wasserstein_mean_dummy": float(np.mean(d_dummy)),
            "sliced_wasserstein_max_dummy": float(np.max(d_dummy)),
        }

    @property
    def name(self) -> str:
        return "sliced_wasserstein"


class MarginalWasserstein(Metric):
    """W2 per flattened feature (reference ``metrics.py:161-217``)."""

    def __init__(
        self,
        original_samples,
        random_seed: int,
        save_all_distances: bool = False,
        normalisation: str = "none",
    ) -> None:
        super().__init__(original_samples)
        self.random_seed = random_seed
        self.save_all_distances = save_all_distances
        self.normalisation = normalisation

    def __call__(self, other_samples) -> dict[str, Any]:
        d = marginal_w2(
            self.original_samples,
            check_flat_array(other_samples),
            normalisation=self.normalisation,
        )
        out: dict[str, Any] = {
            "marginal_wasserstein_mean": float(np.mean(d)),
            "marginal_wasserstein_max": float(np.max(d)),
        }
        if self.save_all_distances:
            out["marginal_wasserstein_all"] = d.tolist()
        return out

    @property
    def baseline_metrics(self) -> dict[str, float]:
        n = self.original_samples.shape[0]
        d_self = marginal_w2(
            self.original_samples[: n // 2],
            self.original_samples[n // 2 :],
            normalisation=self.normalisation,
        )
        avg = np.mean(self.original_samples, axis=0, keepdims=True)
        d_dummy = marginal_w2(
            self.original_samples, avg, normalisation=self.normalisation
        )
        return {
            "marginal_wasserstein_mean_self": float(np.mean(d_self)),
            "marginal_wasserstein_max_self": float(np.max(d_self)),
            "marginal_wasserstein_mean_dummy": float(np.mean(d_dummy)),
            "marginal_wasserstein_max_dummy": float(np.max(d_dummy)),
        }

    @property
    def name(self) -> str:
        return "marginal_wasserstein"


METRIC_REGISTRY = {
    "sliced_wasserstein": SlicedWasserstein,
    "marginal_wasserstein": MarginalWasserstein,
}


class MetricCollection:
    """Time/freq/spectral composition (reference ``metrics.py:28-97``).

    ``metric_factories`` are callables ``(original_samples) -> Metric``
    (the analogue of the reference's partial-instantiated metrics).
    """

    def __init__(
        self,
        metric_factories: list,
        original_samples,
        include_baselines: bool = True,
        include_spectral_density: bool = False,
    ) -> None:
        original_samples = np.asarray(original_samples)
        original_freq = np.asarray(dft(original_samples))
        self.metrics_time = [f(original_samples) for f in metric_factories]
        self.metrics_freq = [f(original_freq) for f in metric_factories]
        self.include_baselines = include_baselines
        self.metric_spectral: Optional[MarginalWasserstein] = (
            MarginalWasserstein(
                original_samples=np.asarray(spectral_density(original_samples)),
                random_seed=42,
                save_all_distances=True,
            )
            if include_spectral_density
            else None
        )

    def __call__(self, other_samples) -> dict[str, Any]:
        other_samples = np.asarray(other_samples)
        other_freq = np.asarray(dft(other_samples))
        out: dict[str, Any] = {}
        for mt, mf in zip(self.metrics_time, self.metrics_freq):
            out.update({f"time_{k}": v for k, v in mt(other_samples).items()})
            out.update({f"freq_{k}": v for k, v in mf(other_freq).items()})
        if self.include_baselines:
            out.update(self.baseline_metrics)
        if self.metric_spectral is not None:
            spec = self.metric_spectral(np.asarray(spectral_density(other_samples)))
            out.update({f"spectral_{k}": v for k, v in spec.items()})
        return dict(sorted(out.items(), key=lambda kv: kv[0]))

    @property
    def baseline_metrics(self) -> dict[str, float]:
        out: dict[str, float] = {}
        for mt, mf in zip(self.metrics_time, self.metrics_freq):
            out.update({f"time_{k}": v for k, v in mt.baseline_metrics.items()})
            out.update({f"freq_{k}": v for k, v in mf.baseline_metrics.items()})
        return out
