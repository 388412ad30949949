"""Sampling + evaluation CLI.

Usage (mirrors ``python cmd/sample.py model_id=XYZ``):

    fdiff-sample model_id=<run_id> [num_samples=10000 num_diffusion_steps=1000 ...]

Behavior parity with the reference ``cmd/sample.py:18-104``: reloads the
run's resolved ``train_config.yaml`` as the source of truth, rebuilds the
datamodule and score model, restores the best checkpoint (lowest recorded
val loss), generates samples with the fused sampler, un-standardizes,
maps frequency-domain samples back with ``idft``, evaluates the metric
collection (with baselines + spectral density) and writes
``results.yaml`` + ``samples.npy`` into the run directory.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

import jax
import numpy as np
import yaml

from fourierdiffusion_tpu.ops.fourier import idft
from fourierdiffusion_tpu.sampling.metrics import (
    MarginalWasserstein,
    MetricCollection,
    SlicedWasserstein,
)
from fourierdiffusion_tpu.sampling.sampler import DiffusionSampler
from fourierdiffusion_tpu.utils.checkpoint import get_best_checkpoint, load_checkpoint
from fourierdiffusion_tpu.utils.config import compose, dict_to_str, load_config, save_config
from fourierdiffusion_tpu.utils.instantiate import (
    build_datamodule,
    build_model_config,
    build_scheduler,
)

logger = logging.getLogger(__name__)


class SamplingRunner:
    def __init__(self, cfg: dict) -> None:
        # force=True: see cli/train.py — jax/absl pre-install a root
        # handler that would otherwise swallow INFO progress logs.
        logging.basicConfig(
            level=logging.INFO, format="%(asctime)s %(message)s", force=True
        )
        for noisy in ("jax", "orbax", "absl", "etils"):
            logging.getLogger(noisy).setLevel(logging.WARNING)
        logger.info("Sampling config:\n%s", dict_to_str(cfg))
        self.cfg = cfg
        self.save_dir = Path(cfg["model_path"]) / str(cfg["model_id"])
        if not self.save_dir.exists():
            raise FileNotFoundError(f"Run directory {self.save_dir} not found")
        save_config(cfg, self.save_dir / "sample_config.yaml")

        train_cfg = load_config(self.save_dir / "train_config.yaml")
        self.datamodule = build_datamodule(train_cfg["datamodule"])
        self.fourier_transform = self.datamodule.fourier_transform
        self.datamodule.prepare_data()
        self.datamodule.setup()

        self.num_samples = int(cfg["num_samples"])
        self.num_diffusion_steps = int(cfg["num_diffusion_steps"])

        # checkpoint=best (default) mirrors the reference's lowest-val-loss
        # selection (reference extraction.py:80-98). checkpoint=last loads
        # the final epoch instead — at the full 10k-sample protocol the
        # last checkpoint measures materially better than best-val
        # (RESULTS.md "EMA 10k tail divergence: resolved").
        which = self.checkpoint_kind = str(cfg.get("checkpoint", "best"))
        if which == "last":
            from fourierdiffusion_tpu.utils.checkpoint import load_last_checkpoint

            logger.info("Restoring last (final-epoch) checkpoint")
            self.variables = load_last_checkpoint(self.save_dir / "checkpoints")
        elif which == "best":
            ckpt_path = get_best_checkpoint(self.save_dir / "checkpoints")
            logger.info("Restoring %s", ckpt_path)
            self.variables = load_checkpoint(ckpt_path)
        else:
            raise ValueError(f"checkpoint must be 'best' or 'last', got {which!r}")

        self.scheduler = build_scheduler(train_cfg["score_model"]["noise_scheduler"])
        params = self.datamodule.dataset_parameters
        self.model = build_model_config(train_cfg["score_model"]).build(
            n_channels=params["n_channels"], max_len=params["max_len"]
        )

        from fourierdiffusion_tpu.parallel import auto_data_mesh

        s_cfg = cfg["sampler"]
        batch = int(s_cfg["sample_batch_size"])
        mesh = auto_data_mesh(batch)
        self.sampler = DiffusionSampler(
            self.model,
            self.scheduler,
            max_len=params["max_len"],
            n_channels=params["n_channels"],
            sample_batch_size=batch,
            mesh=mesh,
            method=str(s_cfg.get("method", "em")),
            corrector_steps=int(s_cfg.get("corrector_steps", 1)),
            snr=float(s_cfg.get("snr", 0.16)),
            score_clip=(
                float(s_cfg["score_clip"])
                if s_cfg.get("score_clip") not in (None, "null")
                else None
            ),
            divergence_threshold=(
                float(s_cfg["divergence_threshold"])
                if s_cfg.get("divergence_threshold") not in (None, "null")
                else None
            ),
            max_resample_retries=int(s_cfg.get("max_resample_retries", 2)),
        )

        seed = int(cfg.get("random_seed", 42))
        self.train_seed = int(train_cfg.get("random_seed", 42))
        m_cfg = cfg["metrics"]
        self.metrics = MetricCollection(
            metric_factories=[
                lambda o: SlicedWasserstein(
                    o,
                    random_seed=seed,
                    num_directions=int(m_cfg.get("num_directions", 1000)),
                    save_all_distances=bool(m_cfg.get("save_all_distances", True)),
                ),
                lambda o: MarginalWasserstein(
                    o,
                    random_seed=seed,
                    save_all_distances=bool(m_cfg.get("save_all_distances", True)),
                ),
            ],
            original_samples=self.datamodule.X_train,
            include_baselines=bool(m_cfg.get("include_baselines", True)),
            include_spectral_density=bool(m_cfg.get("include_spectral_density", True)),
        )
        self.random_seed = seed

    def sample(self) -> None:
        from fourierdiffusion_tpu.utils.profiling import trace_if_enabled

        with trace_if_enabled("sample"):
            x = self.sampler.sample(
                self.variables,
                jax.random.PRNGKey(self.random_seed),
                num_samples=self.num_samples,
                num_diffusion_steps=self.num_diffusion_steps,
            )

        if self.datamodule.standardize:
            mean, std = self.datamodule.feature_mean_and_std
            x = x * std + mean
        if self.fourier_transform:
            x = idft(x)

        results = self.metrics(x)
        # Always record the divergent-chain census (time-domain absmax
        # above the knife-edge threshold, RESULTS.md "Divergence rate")
        # so the count survives in results.yaml even when samples.npy /
        # decomposition logs are lost — wipe #5 cost exactly this for
        # the seed-49 runs. Provenance fields (protocol, guard state,
        # seeds, optional FDIFF_CENSUS_ARM tag) let the rate-statistics
        # scanner pool runs without directory-name conventions.
        import os

        from fourierdiffusion_tpu.utils.census import census_fields

        guard_active = self.sampler.divergence_threshold is not None
        results.update(
            census_fields(
                np.asarray(x),
                guard_active=guard_active,
                num_samples=self.num_samples,
                num_diffusion_steps=self.num_diffusion_steps,
                method=self.sampler.method,
                sampling_seed=self.random_seed,
                train_seed=self.train_seed,
                checkpoint=self.checkpoint_kind,
                arm=os.environ.get("FDIFF_CENSUS_ARM"),
            )
        )
        if guard_active:
            for k, v in self.sampler.last_resample_stats.items():
                results[f"divergence_guard_{k}"] = v
        elif results["divergence_census_count"] > 0:
            logger.warning(
                "%d chain(s) diverged (absmax > %.1f). The shipped "
                "mitigation re-draws them in place: re-run with "
                "sampler.divergence_threshold=8 "
                "sampler.max_resample_retries=3 (see RESULTS.md "
                "'Divergence guard').",
                results["divergence_census_count"],
                results["divergence_census_threshold"],
            )
        printable = {k: v for k, v in results.items() if not isinstance(v, list)}
        logger.info("Metrics:\n%s", dict_to_str(printable))

        logger.info("Saving samples and metrics to %s", self.save_dir)
        with open(self.save_dir / "results.yaml", "w") as f:
            yaml.safe_dump(results, f)
        np.save(self.save_dir / "samples.npy", np.asarray(x))


def main(argv: list[str] | None = None) -> None:
    from fourierdiffusion_tpu.utils.profiling import setup_compilation_cache

    setup_compilation_cache()
    overrides = list(sys.argv[1:] if argv is None else argv)
    cfg = compose("sample", overrides)
    if cfg.get("model_id") in (None, "???"):
        raise SystemExit("model_id=<run_id> is required")
    runner = SamplingRunner(cfg)
    runner.sample()


if __name__ == "__main__":
    main()
