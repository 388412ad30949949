"""In-training sampling/eval callback.

Feature parity with the reference ``SamplingCallback``
(``src/fdiff/utils/callbacks.py:12-89``): every ``every_n_epochs`` (and
on the final epoch) generate samples with the current parameters,
un-standardize, map back to the time domain when diffusing in frequency
space, run the metric collection (no baselines) and log under
``metrics/*``. The sampling path is the same fused ``lax.scan`` program
used at eval time, compiled once and reused across epochs.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax

from fourierdiffusion_tpu.data.datamodules import Datamodule
from fourierdiffusion_tpu.ops.fourier import idft
from fourierdiffusion_tpu.sampling.metrics import (
    MarginalWasserstein,
    MetricCollection,
    SlicedWasserstein,
)
from fourierdiffusion_tpu.sampling.sampler import DiffusionSampler

logger = logging.getLogger(__name__)


class SamplingCallback:
    def __init__(
        self,
        model,
        scheduler,
        datamodule: Datamodule,
        *,
        every_n_epochs: int = 10,
        sample_batch_size: int = 64,
        num_samples: int = 200,
        num_diffusion_steps: int = 1000,
        num_directions: int = 200,
        random_seed: int = 42,
        mesh=None,
        metrics_writer=None,
        max_epochs: Optional[int] = None,
    ) -> None:
        self.every_n_epochs = every_n_epochs
        self.num_samples = num_samples
        self.num_diffusion_steps = num_diffusion_steps
        self.max_epochs = max_epochs
        self.metrics_writer = metrics_writer
        self.random_seed = random_seed

        self.standardize = datamodule.standardize
        self.fourier_transform = datamodule.fourier_transform
        self.feature_mean, self.feature_std = datamodule.feature_mean_and_std

        params = datamodule.dataset_parameters
        self.sampler = DiffusionSampler(
            model,
            scheduler,
            max_len=params["max_len"],
            n_channels=params["n_channels"],
            sample_batch_size=sample_batch_size,
            mesh=mesh,
        )
        self.metric_collection = MetricCollection(
            metric_factories=[
                lambda o: SlicedWasserstein(
                    o, random_seed=random_seed, num_directions=num_directions
                ),
                lambda o: MarginalWasserstein(o, random_seed=random_seed),
            ],
            original_samples=datamodule.X_train,
            include_baselines=False,
        )

    def sample(self, params: Any, constants: Any) -> Any:
        x = self.sampler.sample(
            {"params": params, "constants": constants},
            jax.random.PRNGKey(self.random_seed),
            num_samples=self.num_samples,
            num_diffusion_steps=self.num_diffusion_steps,
        )
        if self.standardize:
            x = x * self.feature_std + self.feature_mean
        if self.fourier_transform:
            x = idft(x)
        return x

    def __call__(self, trainer, epoch: int, params, constants, metrics) -> None:
        max_epochs = self.max_epochs or trainer.max_epochs
        if epoch % self.every_n_epochs != 0 and epoch + 1 != max_epochs:
            return
        x = self.sample(params, constants)
        results = self.metric_collection(x)
        results = {f"metrics/{k}": v for k, v in results.items()}
        metrics.update(results)
        if self.metrics_writer is not None:
            self.metrics_writer.log(results)
        logger.info(
            "epoch %d sampling metrics: %s",
            epoch,
            {k: round(v, 4) for k, v in results.items() if isinstance(v, float)},
        )
