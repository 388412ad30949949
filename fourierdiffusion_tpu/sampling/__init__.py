from fourierdiffusion_tpu.sampling.metrics import (
    MarginalWasserstein,
    Metric,
    MetricCollection,
    METRIC_REGISTRY,
    SlicedWasserstein,
)
from fourierdiffusion_tpu.sampling.sampler import DiffusionSampler, make_sample_fn

__all__ = [
    "DiffusionSampler",
    "MarginalWasserstein",
    "Metric",
    "MetricCollection",
    "METRIC_REGISTRY",
    "SlicedWasserstein",
    "make_sample_fn",
]
