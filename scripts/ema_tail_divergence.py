"""EMA 10k-sample tail-divergence investigation (round-3 item 3).

Round-2 observation (RESULTS.md): sampling 10k from the 600-epoch
freq-domain flagship's EMA checkpoint, 1 of 19 batches showed absmax 16
vs ~2, nudging fsw 0.0624; the non-EMA round-1 checkpoint tightened at
10k. Yet EMA (0.999) is the recommended recipe. This script settles it:

1. Samples the full 10k x 1000 protocol from BOTH weight sets of the
   SAME run — the EMA params (best checkpoint / last.ema_params) and the
   raw final params (last.params) — and reports per-batch absmax
   + divergent-batch counts + sliced/marginal W2 at 10k each.
2. Probes the t->eps regime directly: for small t, a well-trained score
   satisfies std(t)*score(x_t,t) ~ -z (unit scale); reports the mean
   |std*score| profile for both weight sets. An EMA score that is
   systematically SMALL near t=eps under-cancels the reverse drift and
   inflates tails.

Usage:
    python scripts/ema_tail_divergence.py --run 98982644 [--num-samples 10000]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import yaml

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="98982644")
    ap.add_argument("--num-samples", type=int, default=10000)
    ap.add_argument("--num-diffusion-steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument(
        "--checkpoint",
        default="last",
        choices=["last", "best"],
        help="Weight source: the final epoch ('last') or the lowest-val-loss "
        "checkpoint the sample CLI uses ('best'). Round 3 found the round-2 "
        "tail anomaly traces to 'best' (epoch 488) vs 'last' (epoch 599), "
        "not to EMA.",
    )
    args = ap.parse_args()

    import orbax.checkpoint as ocp

    from fourierdiffusion_tpu.data.batch import DiffusableBatch  # noqa: F401
    from fourierdiffusion_tpu.ops.fourier import idft
    from fourierdiffusion_tpu.sampling.metrics import (
        MarginalWasserstein,
        MetricCollection,
        SlicedWasserstein,
    )
    from fourierdiffusion_tpu.sampling.sampler import DiffusionSampler
    from fourierdiffusion_tpu.utils.config import load_config
    from fourierdiffusion_tpu.utils.instantiate import (
        build_datamodule,
        build_model_config,
        build_scheduler,
    )

    run_dir = REPO / "runs" / args.run
    cfg = load_config(run_dir / "train_config.yaml")
    dm = build_datamodule(cfg["datamodule"])
    dm.prepare_data()
    dm.setup()
    p = dm.dataset_parameters
    scheduler = build_scheduler(cfg["score_model"]["noise_scheduler"])
    model = build_model_config(cfg["score_model"]).build(
        n_channels=p["n_channels"], max_len=p["max_len"]
    )

    if args.checkpoint == "best":
        from fourierdiffusion_tpu.utils.checkpoint import get_best_checkpoint

        ckpt_path = get_best_checkpoint(run_dir / "checkpoints")
    else:
        ckpt_path = run_dir / "checkpoints" / "last"
    print(f"checkpoint: {ckpt_path.name}", flush=True)
    with ocp.StandardCheckpointer() as ck:
        last = ck.restore(ckpt_path.resolve())
    if args.checkpoint == "best" or last.get("ema_params") is None:
        # Best checkpoints store a single weight set (the EMA weights when
        # EMA was enabled — they drive validation/selection); probe it alone.
        weight_sets = {args.checkpoint: last["params"]}
    else:
        weight_sets = {
            "raw_final": last["params"],
            "ema": last["ema_params"],
        }
    constants = last["constants"]

    fourier = bool(cfg.get("fourier_transform", False))
    mean, std = dm.feature_mean_and_std

    # --- t->eps score-scale probe -----------------------------------------
    x0 = dm.train_arrays().standardized()[: args.batch_size]
    probe_ts = [1e-5, 1e-4, 1e-3, 1e-2, 5e-2, 0.2, 0.5]

    @jax.jit
    def probe(params, t, key):
        tv = jnp.full((x0.shape[0],), t, x0.dtype)
        m, s = scheduler.marginal_prob(x0, tv)  # std: (B, L) diagonal
        z = jax.random.normal(key, x0.shape, x0.dtype)
        x_t = m + s[:, :, None] * z
        score = model.apply(
            {"params": params, "constants": constants}, x_t, tv,
            deterministic=True,
        )
        # std*score ~ -z for a perfect score: unit scale.
        return jnp.mean(jnp.abs(s[:, :, None] * score))

    key = jax.random.PRNGKey(args.seed)
    print("t->eps probe: mean |std(t) * score| (1.0 = perfect scale)")
    for name, params in weight_sets.items():
        vals = [float(probe(params, t, jax.random.fold_in(key, i)))
                for i, t in enumerate(probe_ts)]
        print(f"  {name:9s}: " + " ".join(
            f"t={t:g}:{v:.3f}" for t, v in zip(probe_ts, vals)), flush=True)

    # --- full-protocol sampling from both weight sets ----------------------
    results = {}
    for name, params in weight_sets.items():
        sampler = DiffusionSampler(
            model,
            scheduler,
            max_len=p["max_len"],
            n_channels=p["n_channels"],
            sample_batch_size=args.batch_size,
        )
        x = sampler.sample(
            {"params": params, "constants": constants},
            jax.random.PRNGKey(args.seed),
            args.num_samples,
            args.num_diffusion_steps,
        )
        x = np.asarray(x)
        n_batches = -(-args.num_samples // args.batch_size)
        absmax = [
            float(np.abs(x[i * args.batch_size : (i + 1) * args.batch_size]).max())
            for i in range(n_batches)
        ]
        divergent = sum(1 for a in absmax if a > 8.0)
        x = x * np.asarray(std) + np.asarray(mean)
        if fourier:
            x = np.asarray(idft(jnp.asarray(x)))
        metrics = MetricCollection(
            metric_factories=[
                lambda o: SlicedWasserstein(o, random_seed=42, num_directions=1000),
                lambda o: MarginalWasserstein(o, random_seed=42),
            ],
            original_samples=np.asarray(dm.X_train),
            include_baselines=False,
            include_spectral_density=False,
        )(x)
        results[name] = {
            "absmax_per_batch_max": max(absmax),
            "absmax_per_batch_median": float(np.median(absmax)),
            "divergent_batches": divergent,
            "n_batches": n_batches,
            **{k: round(float(v), 5) for k, v in metrics.items()
               if isinstance(v, float)},
        }
        print(f"{name}: absmax max={max(absmax):.2f} "
              f"median={np.median(absmax):.2f} divergent={divergent}/{n_batches} "
              f"tsw={metrics['time_sliced_wasserstein_mean']:.4f} "
              f"fsw={metrics['freq_sliced_wasserstein_mean']:.4f}", flush=True)

    suffix = "" if args.checkpoint == "last" else f"_{args.checkpoint}"
    out = run_dir / f"ema_tail_divergence{suffix}.yaml"
    with open(out, "w") as f:
        yaml.safe_dump(results, f)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
