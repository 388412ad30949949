"""Training CLI.

Usage (mirrors ``python cmd/train.py`` + hydra overrides):

    fdiff-train [group=option | key=value ...]
    e.g. fdiff-train fourier_transform=true datamodule=ecg score_model=lstm

Behavior parity with the reference ``cmd/train.py:19-73``: seeds, builds
the datamodule / scheduler / score model from the composed config,
saves the resolved config to ``<run_dir>/<run_id>/train_config.yaml``
(the artifact the sampling CLI reloads), asserts that noise scaling
implies the Fourier transform, and fits with checkpointing + periodic
sampling metrics. Data-parallelism over all visible devices is automatic
when the batch size divides the device count.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Any

from fourierdiffusion_tpu.parallel import auto_data_mesh
from fourierdiffusion_tpu.training.callbacks import SamplingCallback
from fourierdiffusion_tpu.training.trainer import Trainer
from fourierdiffusion_tpu.utils.checkpoint import BestCheckpointCallback
from fourierdiffusion_tpu.utils.config import compose, dict_to_str, save_config
from fourierdiffusion_tpu.utils.instantiate import (
    build_datamodule,
    build_model_config,
    build_scheduler,
)
from fourierdiffusion_tpu.utils.logging import JsonlWriter, MultiWriter, maybe_initialize_wandb
from fourierdiffusion_tpu.utils.profiling import trace_if_enabled

logger = logging.getLogger(__name__)


class TrainingRunner:
    def __init__(self, cfg: dict, run_id: str | None = None) -> None:
        import os

        import jax

        from fourierdiffusion_tpu.parallel.distributed import is_primary

        self.cfg = cfg
        primary = is_primary()
        # force=True: importing jax/absl installs a WARNING-level root
        # handler first, which would make a plain basicConfig a no-op
        # and swallow all epoch-progress INFO logs.
        logging.basicConfig(
            level=logging.INFO, format="%(asctime)s %(message)s", force=True
        )
        for noisy in ("jax", "orbax", "absl", "etils"):
            logging.getLogger(noisy).setLevel(logging.WARNING)
        if primary:
            logger.info("Training config:\n%s", dict_to_str(cfg))

        if run_id is None:
            if jax.process_count() > 1:
                # Multi-controller: every process must agree on the run
                # id without coordination — derive it deterministically.
                run_id = os.environ.get(
                    "FDIFF_RUN_ID", f"mh-{int(cfg.get('random_seed', 42)):06d}"
                )
                wandb_writer = None
            else:
                wandb_writer, run_id = maybe_initialize_wandb(cfg)
        else:
            wandb_writer = None
        self.run_id = run_id
        self.run_dir = Path(cfg.get("run_dir", "runs")) / run_id
        if primary:
            self.run_dir.mkdir(parents=True, exist_ok=True)
            save_config(cfg, self.run_dir / "train_config.yaml")
            logger.info("Run directory: %s", self.run_dir)

        self.datamodule = build_datamodule(cfg["datamodule"])
        self.datamodule.prepare_data()
        self.datamodule.setup("fit")

        self.scheduler = build_scheduler(cfg["score_model"]["noise_scheduler"])
        model_cfg = build_model_config(cfg["score_model"])
        params = self.datamodule.dataset_parameters
        self.model = model_cfg.build(
            n_channels=params["n_channels"], max_len=params["max_len"]
        )

        mesh = auto_data_mesh(self.datamodule.batch_size)
        if mesh is not None:
            logger.info("Data-parallel over %d devices", mesh.size)

        writer = MultiWriter(JsonlWriter(self.run_dir), wandb_writer)
        trainer_cfg = cfg["trainer"]
        max_epochs = int(trainer_cfg["max_epochs"])

        callbacks = [BestCheckpointCallback(self.run_dir / "checkpoints")]
        sampling_cfg = trainer_cfg.get("callbacks", {}).get("sampling", {})
        if sampling_cfg.get("enabled", False):
            callbacks.append(
                SamplingCallback(
                    self.model,
                    self.scheduler,
                    self.datamodule,
                    every_n_epochs=int(sampling_cfg.get("every_n_epochs", 10)),
                    sample_batch_size=int(sampling_cfg.get("sample_batch_size", 64)),
                    num_samples=int(sampling_cfg.get("num_samples", 200)),
                    num_diffusion_steps=int(
                        sampling_cfg.get("num_diffusion_steps", 1000)
                    ),
                    num_directions=int(sampling_cfg.get("num_directions", 200)),
                    random_seed=int(cfg.get("random_seed", 42)),
                    mesh=mesh,
                    metrics_writer=writer,
                    max_epochs=max_epochs,
                )
            )

        self.trainer = Trainer(
            self.model,
            self.scheduler,
            max_epochs=max_epochs,
            lr_max=float(cfg["score_model"]["lr_max"]),
            gradient_clip_val=float(trainer_cfg.get("gradient_clip_val", 1.0)),
            likelihood_weighting=bool(
                cfg["score_model"].get("likelihood_weighting", False)
            ),
            seed=int(cfg.get("random_seed", 42)),
            mesh=mesh,
            callbacks=tuple(callbacks),
            metrics_writer=writer,
            save_last_dir=self.run_dir / "checkpoints",
            accumulate_grad_batches=int(
                trainer_cfg.get("accumulate_grad_batches", 1)
            ),
            ema_decay=float(trainer_cfg.get("ema_decay", 0.0)),
            spike_rollback_factor=float(
                trainer_cfg.get("spike_rollback_factor", 2.5)
            ),
            spike_rollback_retries=int(
                trainer_cfg.get("spike_rollback_retries", 2)
            ),
            save_last_every_n=int(trainer_cfg.get("save_last_every_n", 1)),
            val_noise_draws=int(trainer_cfg.get("val_noise_draws", 4)),
            init_seed=(
                int(trainer_cfg["init_seed"])
                if trainer_cfg.get("init_seed") is not None
                else None
            ),
            perm_salt=int(trainer_cfg.get("perm_salt", 0)),
        )

    def train(self, resume_from: Path | None = None) -> Any:
        # Noise scaling without the Fourier transform would whiten the
        # wrong domain (reference guard, cmd/train.py:60-62).
        assert not (
            self.cfg["score_model"]["fourier_noise_scaling"]
            and not self.datamodule.fourier_transform
        ), "You cannot use noise scaling without the Fourier transform."
        with trace_if_enabled("train"):
            return self.trainer.fit(self.datamodule, resume_from=resume_from)


def main(argv: list[str] | None = None) -> None:
    # Multi-host (DCN): one process per host; must run before any other
    # JAX call. No-op unless the FDIFF_COORDINATOR_ADDRESS /
    # FDIFF_NUM_PROCESSES / FDIFF_PROCESS_ID env vars are set.
    from fourierdiffusion_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    from fourierdiffusion_tpu.utils.profiling import setup_compilation_cache

    setup_compilation_cache()
    overrides = list(sys.argv[1:] if argv is None else argv)
    # `resume=<run_id>` continues a previous run from its saved full
    # training state (config reloaded from the run dir as-is).
    resume_id = None
    for ov in list(overrides):
        if ov.startswith("resume="):
            resume_id = ov.split("=", 1)[1]
            overrides.remove(ov)
    if resume_id is not None:
        from fourierdiffusion_tpu.utils.config import load_config
        from pathlib import Path as _P

        run_dir_root = "runs"
        for ov in overrides:
            if ov.startswith("run_dir="):
                run_dir_root = ov.split("=", 1)[1]
        cfg = load_config(_P(run_dir_root) / resume_id / "train_config.yaml")
        runner = TrainingRunner(cfg, run_id=resume_id)
        last = runner.run_dir / "checkpoints" / "last"
        runner.train(resume_from=last if last.exists() else None)
    else:
        cfg = compose("train", overrides)
        runner = TrainingRunner(cfg)
        runner.train()
    print(f"run_id={runner.run_id}")


if __name__ == "__main__":
    main()
