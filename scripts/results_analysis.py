"""Aggregate per-run results into the paper's tables/plots.

Equivalent of the reference's ``notebooks/results.ipynb`` /
``results_lstm.ipynb``: reads every ``runs/<id>/{train_config.yaml,
results.yaml}``, builds a dataframe of sliced-Wasserstein metrics per
(dataset, domain, model), prints mean +- 2*SEM pivot tables (LaTeX
optional) and writes boxplots when matplotlib is available.

Usage:
    python scripts/results_analysis.py [--runs runs] [--latex] [--plots out/]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd
import yaml


def collect_runs(runs_dir: Path) -> pd.DataFrame:
    rows = []
    for run_dir in sorted(runs_dir.iterdir()):
        cfg_path = run_dir / "train_config.yaml"
        res_path = run_dir / "results.yaml"
        if not (cfg_path.exists() and res_path.exists()):
            continue
        cfg = yaml.safe_load(open(cfg_path))
        res = yaml.safe_load(open(res_path))
        row = {
            "run_id": run_dir.name,
            "dataset": cfg["datamodule"]["name"],
            "model": cfg["score_model"]["model_type"],
            "diffusion_domain": "frequency" if cfg["fourier_transform"] else "time",
            "max_epochs": int(cfg["trainer"]["max_epochs"]),
            "ema": float(cfg["trainer"].get("ema_decay", 0.0)) > 0.0,
            "d_model": int(cfg["score_model"]["d_model"]),
        }
        for key, val in res.items():
            if isinstance(val, (int, float)):
                row[key] = val
            elif isinstance(val, list) and key.endswith("_all"):
                arr = np.asarray(val, dtype=float)
                row[f"{key[:-4]}_mean"] = float(arr.mean())
                # 2 * standard error of the mean, the paper's error bar.
                row[f"{key[:-4]}_2sem"] = float(2 * arr.std(ddof=1) / np.sqrt(len(arr)))
        rows.append(row)
    if not rows:
        raise SystemExit(f"No completed runs with results.yaml under {runs_dir}")
    return pd.DataFrame(rows)


def pivot_table(df: pd.DataFrame, metric: str) -> pd.DataFrame:
    """(dataset, domain) x model pivot of `mean ± 2sem` strings."""
    sem_col = metric.replace("_mean", "_2sem")

    def fmt(group: pd.DataFrame) -> str:
        m = group[metric].mean()
        s = group[sem_col].mean() if sem_col in group else float("nan")
        return f"{m:.3f} ± {s:.3f}" if np.isfinite(s) else f"{m:.3f}"

    return (
        df.groupby(["dataset", "diffusion_domain", "model"])
        .apply(fmt, include_groups=False)
        .unstack("model")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=Path, default=Path("runs"))
    ap.add_argument("--latex", action="store_true")
    ap.add_argument("--plots", type=Path, default=None)
    ap.add_argument(
        "--model",
        default=None,
        help="restrict to one backbone (e.g. lstm — the reference's "
        "results_lstm.ipynb view)",
    )
    ap.add_argument(
        "--epochs",
        type=int,
        default=None,
        help="restrict to runs trained for exactly this many epochs "
        "(the tables should aggregate same-protocol runs only)",
    )
    args = ap.parse_args()

    df = collect_runs(args.runs)
    if args.model is not None:
        df = df[df["model"] == args.model]
        if df.empty:
            raise SystemExit(f"No runs with model={args.model}")
    if args.epochs is not None:
        df = df[df["max_epochs"] == args.epochs]
        if df.empty:
            raise SystemExit(f"No runs with max_epochs={args.epochs}")
    print(f"Aggregated {len(df)} runs\n")

    for metric in ("time_sliced_wasserstein_mean", "freq_sliced_wasserstein_mean"):
        if metric not in df.columns:
            continue
        table = pivot_table(df, metric)
        print(f"== {metric} (lower is better) ==")
        print(table.to_latex() if args.latex else table.to_string())
        print()

    if args.plots is not None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            raise SystemExit("matplotlib not available; skip --plots")
        args.plots.mkdir(parents=True, exist_ok=True)
        for metric in ("time_sliced_wasserstein_mean", "freq_sliced_wasserstein_mean"):
            if metric not in df.columns:
                continue
            fig, ax = plt.subplots(figsize=(8, 4))
            df.boxplot(column=metric, by=["dataset", "diffusion_domain"], ax=ax, rot=45)
            ax.set_ylabel("sliced $W_2$")
            fig.suptitle("")
            fig.tight_layout()
            fig.savefig(args.plots / f"{metric}.png", dpi=150)
        print(f"Plots written to {args.plots}")


if __name__ == "__main__":
    main()
