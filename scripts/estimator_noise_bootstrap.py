"""Quantify the 1k-sample W2-estimator noise from a committed 10k draw.

The reference-sampler corner of the full-budget triangle (RESULTS.md
"Full-budget head-to-head") is a 1,000-sample torch-CPU run — the 10k
protocol would take ~2 days on one CPU core. To judge whether its
metrics agree with the 10k-sample corners, we need the sampling noise
of the metric *estimator* at n=1000. This script bootstraps it from
the committed 10k cross-sampler draw of the SAME weights
(`runs_reference/<tag>/samples_cross_our_sampler.npy`): metrics on R
random 1k subsets give the spread any 1k draw from this model would
show, against which the torch corner's numbers can be placed.

Reference workload being calibrated: the published sampling protocol of
``/root/reference/cmd/conf/sample.yaml`` (10k samples) truncated to 1k
for the torch-CPU corner.

Usage:
    python scripts/estimator_noise_bootstrap.py \
        --run runs_reference/ref-freq42-e200 --fourier \
        [--subset-size 1000] [--reps 20] [--seed 0]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from fourierdiffusion_tpu.data.datamodules import SyntheticDatamodule
from fourierdiffusion_tpu.sampling.metrics import (
    MarginalWasserstein,
    MetricCollection,
    SlicedWasserstein,
)

KEYS = (
    "time_sliced_wasserstein_mean",
    "freq_sliced_wasserstein_mean",
    "time_marginal_wasserstein_mean",
    "freq_marginal_wasserstein_mean",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=Path, required=True)
    ap.add_argument("--fourier", action="store_true")
    ap.add_argument("--subset-size", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--metric-seed",
        type=int,
        default=42,
        help="random_seed of the metric projections (must match the "
        "protocol runs for comparability)",
    )
    args = ap.parse_args()

    x = np.load(args.run / "samples_cross_our_sampler.npy")
    dm = SyntheticDatamodule(
        random_seed=args.metric_seed,
        fourier_transform=args.fourier,
        standardize=True,
    )
    dm.prepare_data()
    dm.setup()
    metrics = MetricCollection(
        metric_factories=[
            lambda o: SlicedWasserstein(
                o, random_seed=args.metric_seed, num_directions=1000
            ),
            lambda o: MarginalWasserstein(o, random_seed=args.metric_seed),
        ],
        original_samples=np.asarray(dm.X_train),
        include_baselines=False,
        include_spectral_density=False,
    )

    full = metrics(x)
    print(f"full n={x.shape[0]}:")
    for k in KEYS:
        print(f"  {k}: {full[k]:.4f}")

    rng = np.random.default_rng(args.seed)
    rows: dict[str, list[float]] = {k: [] for k in KEYS}
    for r in range(args.reps):
        idx = rng.choice(x.shape[0], size=args.subset_size, replace=False)
        res = metrics(x[idx])
        for k in KEYS:
            rows[k].append(float(res[k]))
        print(
            f"rep {r:2d}: "
            + "  ".join(f"{k.split('_')[0][0]}{k.split('_')[1][0]}w="
                        f"{res[k]:.4f}" for k in KEYS)
        )

    print(f"\nn={args.subset_size} bootstrap over {args.reps} reps "
          f"(mean  std  [min, max]):")
    for k in KEYS:
        v = np.asarray(rows[k])
        print(
            f"  {k}: {v.mean():.4f}  {v.std(ddof=1):.4f}  "
            f"[{v.min():.4f}, {v.max():.4f}]"
        )


if __name__ == "__main__":
    main()
