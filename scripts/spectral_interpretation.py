"""Dataset spectral-analysis figures.

Equivalent of the reference's ``notebooks/spectral_interpretation.ipynb``:
per-dataset spectral density profiles, energy distributions, time/
frequency delocalization histograms, and the ECG Gaussian-smoother
ablation (localization vs smoother width).

Usage:
    python scripts/spectral_interpretation.py --datamodule ecg --out out/
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from fourierdiffusion_tpu.data.datamodules import DATAMODULE_REGISTRY
from fourierdiffusion_tpu.ops.fourier import (
    localization_metrics,
    smooth_frequency,
    spectral_density,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--datamodule", default="ecg", choices=sorted(DATAMODULE_REGISTRY))
    ap.add_argument("--data-dir", type=Path, default=Path("data"))
    ap.add_argument("--out", type=Path, default=Path("out/spectral"))
    ap.add_argument("--smoother-widths", type=float, nargs="*", default=[0.5, 1.0, 2.0, 5.0])
    args = ap.parse_args()

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        raise SystemExit("matplotlib not available")

    dm = DATAMODULE_REGISTRY[args.datamodule](data_dir=args.data_dir)
    dm.prepare_data()
    dm.setup()
    X = dm.X_train
    args.out.mkdir(parents=True, exist_ok=True)

    # Mean spectral density per channel.
    dens = np.asarray(spectral_density(X)).mean(axis=0)  # (n_freq, C)
    fig, ax = plt.subplots(figsize=(7, 4))
    for c in range(dens.shape[1]):
        ax.semilogy(dens[:, c], label=f"channel {c}")
    ax.set_xlabel("frequency bin")
    ax.set_ylabel("mean spectral density")
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out / f"{args.datamodule}_spectral_density.png", dpi=150)

    # Delocalization histograms.
    x_loc, x_spec_loc = localization_metrics(X)
    fig, axes = plt.subplots(1, 2, figsize=(9, 3.5))
    axes[0].hist(np.asarray(x_loc), bins=50)
    axes[0].set_title("time delocalization")
    axes[1].hist(np.asarray(x_spec_loc), bins=50)
    axes[1].set_title("frequency delocalization")
    fig.tight_layout()
    fig.savefig(args.out / f"{args.datamodule}_delocalization.png", dpi=150)

    # Smoother ablation (the reference runs this on ECG).
    rows = []
    subset = X[: min(len(X), 2000)]
    for sigma in args.smoother_widths:
        sm = smooth_frequency(subset, sigma=float(sigma))
        t_loc, f_loc = localization_metrics(sm)
        rows.append((sigma, float(jnp.mean(t_loc)), float(jnp.mean(f_loc))))
    fig, ax = plt.subplots(figsize=(6, 4))
    sigmas, t_locs, f_locs = zip(*rows)
    ax.plot(sigmas, t_locs, "o-", label="time deloc.")
    ax.plot(sigmas, f_locs, "s-", label="freq deloc.")
    ax.set_xlabel("smoother width $\\sigma$")
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out / f"{args.datamodule}_smoother_ablation.png", dpi=150)
    print(f"Figures written to {args.out}")
    for sigma, t_l, f_l in rows:
        print(f"  sigma={sigma}: time deloc {t_l:.3g}, freq deloc {f_l:.3g}")


if __name__ == "__main__":
    main()
