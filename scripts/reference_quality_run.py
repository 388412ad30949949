"""Train and evaluate the ACTUAL reference implementation on our data.

VERDICT round-1 item 4 asks for *reference-confirmed* explanations of any
quality floor a config misses: the definitive evidence is running the
reference's own torch code (importable from ``/root/reference/src`` via
the stubs in ``tests/_reference_stubs.py``) through its full pipeline —
its ``ScoreModule``/``LSTMScoreModule`` (``score_models.py:22-317``), its
DSM loss (``utils/losses.py:12-127``), its Lightning training recipe
(AdamW lr_max, diffusers cosine-with-warmup stepped per optimizer step,
grad-clip 1.0 — ``score_models.py:122-130``, ``conf/trainer/default.yaml``)
and its ``DiffusionSampler`` (``sampling/sampler.py:11-122``) — on the
*identical* synthetic dataset our runs use, then scoring its samples with
our (validated-equivalent) metric collection.

Artifacts land in ``runs_reference/<tag>/results.yaml`` with the same key
layout as our ``fdiff-sample`` results, so the two sides are directly
comparable in RESULTS.md.

Usage:
    python scripts/reference_quality_run.py --tag ref-time42 \
        [--fourier] [--model transformer|lstm|mlp] [--epochs 300] \
        [--num-samples 1000] [--seed 42]
"""

from __future__ import annotations

import argparse
import copy
import math
import sys
import time
from pathlib import Path

import numpy as np
import torch
import yaml

# This script only needs jax for host-side data prep (our datamodule) —
# pin it to CPU so it never opens a TPU client that would contend with
# concurrently running TPU training/sampling jobs. (The JAX_PLATFORMS
# env var is ignored in this image; the config update is authoritative.)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tests._reference_stubs import install_reference_stubs  # noqa: E402

install_reference_stubs()

from fdiff.models.score_models import (  # noqa: E402  (reference code)
    LSTMScoreModule,
    MLPScoreModule,
    ScoreModule,
)
from fdiff.sampling.sampler import DiffusionSampler as RefSampler  # noqa: E402
from fdiff.schedulers.sde import VPScheduler as RefVPScheduler  # noqa: E402
from fdiff.utils.dataclasses import DiffusableBatch as RefBatch  # noqa: E402
from fdiff.utils.fourier import idft as ref_idft  # noqa: E402

from fourierdiffusion_tpu.data.datamodules import SyntheticDatamodule  # noqa: E402
from fourierdiffusion_tpu.sampling.metrics import (  # noqa: E402
    MarginalWasserstein,
    MetricCollection,
    SlicedWasserstein,
)

MODELS = {
    "transformer": ScoreModule,
    "lstm": LSTMScoreModule,
    "mlp": MLPScoreModule,
}


def cosine_warmup_lambda(total_steps: int):
    """The diffusers ``get_cosine_schedule_with_warmup`` multiplier the
    reference trains under (warmup = total // 10, ``score_models.py:42``)."""
    warmup = total_steps // 10

    def lam(step: int) -> float:
        if step < warmup:
            return step / max(1, warmup)
        progress = (step - warmup) / max(1, total_steps - warmup)
        return max(0.0, 0.5 * (1.0 + math.cos(math.pi * progress)))

    return lam


def train_reference(
    model: torch.nn.Module,
    x_train: torch.Tensor,
    x_val: torch.Tensor,
    *,
    epochs: int,
    batch_size: int,
    lr_max: float,
    seed: int,
    resume_path: Path | None = None,
) -> dict:
    """Mirror ``pl.Trainer.fit`` for the reference module: per-step
    optimizer + LR-scheduler updates, grad-clip 1.0, per-epoch val loss,
    best-val-loss checkpoint (``ModelCheckpoint(monitor="val/loss")``).

    When ``resume_path`` is given, full training state (model, optimizer,
    LR schedule, RNG streams, best-so-far) is checkpointed there after
    every epoch and reloaded on restart, so a multi-day CPU run can span
    process lifetimes without perturbing the trajectory.
    """
    n = x_train.shape[0]
    steps_per_epoch = -(-n // batch_size)
    total_steps = steps_per_epoch * epochs
    opt = torch.optim.AdamW(model.parameters(), lr=lr_max)
    sched = torch.optim.lr_scheduler.LambdaLR(opt, cosine_warmup_lambda(total_steps))
    gen = torch.Generator().manual_seed(seed)

    best_val = float("inf")
    best_state: dict | None = None
    history = []
    start_epoch = 0
    if resume_path is not None and resume_path.exists():
        ck = torch.load(resume_path, weights_only=False)
        model.load_state_dict(ck["model"])
        opt.load_state_dict(ck["opt"])
        sched.load_state_dict(ck["sched"])
        gen.set_state(ck["gen"])
        torch.set_rng_state(ck["torch_rng"])
        best_val = ck["best_val"]
        best_state = ck["best_state"]
        history = ck["history"]
        start_epoch = ck["epoch"] + 1
        print(f"Resumed training at epoch {start_epoch} from {resume_path}", flush=True)
    for epoch in range(start_epoch, epochs):
        model.train()
        perm = torch.randperm(n, generator=gen)
        train_losses = []
        t0 = time.perf_counter()
        for i in range(0, n, batch_size):
            idx = perm[i : i + batch_size]
            batch = RefBatch(X=x_train[idx])
            loss = model.training_loss_fn(model, batch)
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()
            sched.step()
            train_losses.append(float(loss))
        model.eval()
        with torch.no_grad():
            val_losses = [
                float(model.validation_loss_fn(model, RefBatch(X=x_val[i : i + batch_size])))
                for i in range(0, x_val.shape[0], batch_size)
            ]
        val_loss = float(np.mean(val_losses))
        history.append(
            {
                "epoch": epoch,
                "train/loss": float(np.mean(train_losses)),
                "val/loss": val_loss,
                "seconds": time.perf_counter() - t0,
            }
        )
        if val_loss < best_val:
            best_val = val_loss
            best_state = copy.deepcopy(model.state_dict())
        if resume_path is not None:
            tmp = resume_path.with_suffix(".tmp")
            torch.save(
                {
                    "model": model.state_dict(),
                    "opt": opt.state_dict(),
                    "sched": sched.state_dict(),
                    "gen": gen.get_state(),
                    "torch_rng": torch.get_rng_state(),
                    "best_val": best_val,
                    "best_state": best_state,
                    "history": history,
                    "epoch": epoch,
                },
                tmp,
            )
            tmp.replace(resume_path)
        if epoch % 10 == 0 or epoch + 1 == epochs:
            h = history[-1]
            print(
                f"epoch {epoch}: train/loss={h['train/loss']:.5f} "
                f"val/loss={val_loss:.5f} ({h['seconds']:.1f}s)",
                flush=True,
            )
    assert best_state is not None
    model.load_state_dict(best_state)
    return {"best_val_loss": best_val, "history": history}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--model", default="transformer", choices=sorted(MODELS))
    ap.add_argument("--fourier", action="store_true")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument(
        "--lr-max",
        type=float,
        default=None,
        help="default: the reference's per-model config "
        "(1e-4 for mlp, 1e-3 otherwise — cmd/conf/score_model/*.yaml)",
    )
    ap.add_argument("--d-model", type=int, default=72)
    ap.add_argument("--d-mlp", type=int, default=1024)
    ap.add_argument("--num-layers", type=int, default=10)
    ap.add_argument("--n-head", type=int, default=12)
    ap.add_argument("--num-samples", type=int, default=1000)
    ap.add_argument("--num-diffusion-steps", type=int, default=1000)
    ap.add_argument("--sample-batch-size", type=int, default=200)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", type=Path, default=REPO / "runs_reference")
    ap.add_argument(
        "--load-state",
        type=Path,
        default=None,
        help="skip training; load a model.pt saved by a previous run "
        "(CPU training is hours-long — this makes sampling restartable)",
    )
    ap.add_argument(
        "--skip-sampling",
        action="store_true",
        help="train (with per-epoch resume checkpointing) and exit; "
        "sampling can be run later with --load-state",
    )
    args = ap.parse_args()
    if args.lr_max is None:
        # Mirror the reference's per-model configs (cmd/conf/score_model/
        # {default,lstm,mlp}.yaml): mlp trains at 1e-4, the rest at 1e-3.
        args.lr_max = 1e-4 if args.model == "mlp" else 1e-3

    torch.manual_seed(args.seed)

    # Identical data to our runs: the same SyntheticDatamodule, with the
    # same in-diffusion-domain standardization contract.
    dm = SyntheticDatamodule(
        random_seed=args.seed,
        fourier_transform=args.fourier,
        standardize=True,
        batch_size=args.batch_size,
    )
    dm.prepare_data()
    dm.setup()
    train_split = dm.train_arrays()
    val_split = dm.val_arrays()
    x_train = torch.from_numpy(np.asarray(train_split.standardized(), np.float32))
    x_val = torch.from_numpy(np.asarray(val_split.standardized(), np.float32))
    params = dm.dataset_parameters
    steps_per_epoch = params["steps_per_epoch"]

    scheduler = RefVPScheduler(fourier_noise_scaling=args.fourier)
    # The reference sets G lazily on the first marginal_prob call during
    # training (sde.py:114,192); with --load-state nothing trains, so
    # prior_sampling would hit an unset G_matrix. Setting it up front is
    # identical to what the first training step would do.
    scheduler.set_noise_scaling(params["max_len"])
    model_kwargs = dict(
        n_channels=params["n_channels"],
        max_len=params["max_len"],
        noise_scheduler=scheduler,
        fourier_noise_scaling=args.fourier,
        num_training_steps=steps_per_epoch * args.epochs,
        lr_max=args.lr_max,
    )
    # Per-model architecture kwargs, mirroring the reference's configs
    # (cmd/conf/score_model/{default,lstm,mlp}.yaml). The reference
    # LSTM/MLP constructors take no n_head (score_models.py:169-180,249-261).
    model_kwargs.update(d_model=args.d_model, num_layers=args.num_layers)
    if args.model == "transformer":
        model_kwargs["n_head"] = args.n_head
    elif args.model == "mlp":
        model_kwargs["d_mlp"] = args.d_mlp
    model = MODELS[args.model](**model_kwargs)

    out_dir = args.out / args.tag
    out_dir.mkdir(parents=True, exist_ok=True)
    if args.load_state is not None:
        model.load_state_dict(torch.load(args.load_state, weights_only=True))
        fit_info = {"best_val_loss": float("nan"), "history": []}
        print(f"Loaded trained state from {args.load_state}", flush=True)
    else:
        print(f"Training reference {args.model} ({args.tag}): "
              f"{args.epochs} epochs x {steps_per_epoch} steps", flush=True)
        fit_info = train_reference(
            model,
            x_train,
            x_val,
            epochs=args.epochs,
            batch_size=args.batch_size,
            lr_max=args.lr_max,
            seed=args.seed,
            resume_path=out_dir / "train_state.pt",
        )
        torch.save(model.state_dict(), out_dir / "model.pt")
        with open(out_dir / "history.yaml", "w") as f:
            yaml.safe_dump(fit_info["history"], f)

    if args.skip_sampling:
        print("Training done (--skip-sampling); exiting.", flush=True)
        return

    # Chunked, restartable sampling: the reference's torch-CPU reverse
    # loop costs ~9 s per batch-200 forward on this 1-core host, so the
    # published 10k x 1000 protocol is a multi-day run. Each completed
    # batch is persisted (with the RNG stream) so the run can accumulate
    # across process lifetimes; identical to one RefSampler.sample(N, K)
    # call because the sampler draws from the global torch RNG.
    chunks_dir = out_dir / "sample_chunks"
    chunks_dir.mkdir(exist_ok=True)
    num_batches = max(1, args.num_samples // args.sample_batch_size)
    sampler = RefSampler(model, sample_batch_size=args.sample_batch_size)
    done = sorted(chunks_dir.glob("chunk_*.pt"))
    if done:
        rng = torch.load(chunks_dir / "rng_state.pt", weights_only=False)
        torch.set_rng_state(rng)
        print(f"Resuming sampling: {len(done)}/{num_batches} chunks done", flush=True)
    print("Sampling with the reference DiffusionSampler", flush=True)
    for b in range(len(done), num_batches):
        t0 = time.perf_counter()
        with torch.no_grad():
            xb = sampler.sample(args.sample_batch_size, args.num_diffusion_steps)
        torch.save(xb, chunks_dir / f"chunk_{b:04d}.pt")
        torch.save(torch.get_rng_state(), chunks_dir / "rng_state.pt")
        print(
            f"chunk {b + 1}/{num_batches} ({time.perf_counter() - t0:.0f}s)",
            flush=True,
        )
    x = torch.cat(
        [torch.load(p, weights_only=False) for p in sorted(chunks_dir.glob("chunk_*.pt"))]
    )

    mean, std = dm.feature_mean_and_std
    x = x.numpy() * np.asarray(std) + np.asarray(mean)
    if args.fourier:
        x = ref_idft(torch.from_numpy(x)).numpy()

    metrics = MetricCollection(
        metric_factories=[
            lambda o: SlicedWasserstein(
                o, random_seed=args.seed, num_directions=1000, save_all_distances=True
            ),
            lambda o: MarginalWasserstein(
                o, random_seed=args.seed, save_all_distances=True
            ),
        ],
        original_samples=np.asarray(dm.X_train),
        include_baselines=True,
        include_spectral_density=True,
    )
    results = metrics(x)

    with open(out_dir / "results.yaml", "w") as f:
        yaml.safe_dump(results, f)
    with open(out_dir / "run_config.yaml", "w") as f:
        yaml.safe_dump(
            {
                "implementation": "reference (/root/reference, torch CPU)",
                "model": args.model,
                "fourier_transform": args.fourier,
                "epochs": args.epochs,
                "seed": args.seed,
                "num_samples": args.num_samples,
                "num_diffusion_steps": args.num_diffusion_steps,
                "best_val_loss": fit_info["best_val_loss"],
            },
            f,
        )
    printable = {
        k: round(v, 5)
        for k, v in results.items()
        if isinstance(v, float) and not k.startswith("spectral")
    }
    print(yaml.safe_dump(printable), flush=True)
    print(f"Wrote {out_dir}/results.yaml", flush=True)


if __name__ == "__main__":
    main()
