"""Decompose e200 10k-sample metric gaps into divergent-tail vs bulk.

At the published 200-epoch budget some training draws land on the
under-trained knife edge (RESULTS.md "root cause"): a small fraction of
reverse chains blows up (series absmax > 8 vs data absmax ~2) and drags
the sliced/marginal W2 far above the clean corners. This script splits
a run's committed ``samples.npy`` into divergent / bulk subsets and
recomputes the metric collection on the bulk, answering: *is the gap
entirely the tail, or is the bulk itself worse?*

Usage:
    python scripts/divergence_decomposition.py <run_id> [<run_id> ...]
        [--threshold 8] [--model-path runs]

Reads each run's ``train_config.yaml`` to rebuild the datamodule
exactly as ``cli/sample.py`` does (same original samples, same metric
seeds), so the "all" row reproduces the committed ``results.yaml``
numbers. Reference workload being analysed: the published protocol of
``/root/reference/cmd/conf/sample.yaml`` (10k samples, 1000 steps).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from fourierdiffusion_tpu.utils.census import DIVERGENCE_CENSUS_THRESHOLD
from fourierdiffusion_tpu.sampling.metrics import (
    MarginalWasserstein,
    MetricCollection,
    SlicedWasserstein,
)
from fourierdiffusion_tpu.utils.config import load_config
from fourierdiffusion_tpu.utils.instantiate import build_datamodule

KEYS = (
    "time_sliced_wasserstein_mean",
    "freq_sliced_wasserstein_mean",
    "time_marginal_wasserstein_mean",
    "freq_marginal_wasserstein_mean",
)


def build_metrics(run_dir: Path, num_directions: int) -> MetricCollection:
    train_cfg = load_config(run_dir / "train_config.yaml")
    dm = build_datamodule(train_cfg["datamodule"])
    dm.prepare_data()
    dm.setup()
    sample_cfg = load_config(run_dir / "sample_config.yaml")
    seed = int(sample_cfg.get("random_seed", 42))
    return MetricCollection(
        metric_factories=[
            lambda o: SlicedWasserstein(
                o, random_seed=seed, num_directions=num_directions
            ),
            lambda o: MarginalWasserstein(o, random_seed=seed),
        ],
        original_samples=dm.X_train,
        include_baselines=False,
        include_spectral_density=False,
    )


def decompose(run_dir: Path, threshold: float, num_directions: int) -> None:
    x = np.load(run_dir / "samples.npy")
    absmax = np.abs(x).max(axis=tuple(range(1, x.ndim)))
    divergent = absmax > threshold
    n_div = int(divergent.sum())
    print(f"\n== {run_dir.name}: {x.shape[0]} samples, "
          f"{n_div} divergent (absmax>{threshold}; "
          f"max {absmax.max():.1f}, p99.9 {np.quantile(absmax, 0.999):.1f})")
    metrics = build_metrics(run_dir, num_directions)
    rows = {"all": x, "bulk": x[~divergent]}
    for name, subset in rows.items():
        if subset.shape[0] == 0:
            continue
        res = metrics(subset)
        vals = "  ".join(f"{k.replace('_wasserstein', '')}={res[k]:.4f}" for k in KEYS)
        print(f"  {name:>5} (n={subset.shape[0]:5d}): {vals}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_ids", nargs="+")
    ap.add_argument("--threshold", type=float,
                    default=DIVERGENCE_CENSUS_THRESHOLD)
    ap.add_argument("--model-path", type=Path, default=Path("runs"))
    ap.add_argument("--num-directions", type=int, default=1000)
    args = ap.parse_args()
    for rid in args.run_ids:
        decompose(args.model_path / rid, args.threshold, args.num_directions)


if __name__ == "__main__":
    main()
