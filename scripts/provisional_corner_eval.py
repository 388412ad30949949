"""Provisional metrics from a PARTIAL reference-sampler corner run.

The torch reference-sampler corner (``scripts/reference_quality_run.py``,
chunked restartable sampling) takes ~1 h of single-core CPU per 200-sample
chunk at the 1000-step budget. This evaluates whatever chunks have landed
so far with the exact post-processing + metric collection the full run
uses (un-standardize with the datamodule's train stats, reference idft,
``MetricCollection`` with baselines), so a machine wipe or round boundary
mid-run still yields a defensible n=<done> reading against the
bootstrap-calibrated expectation (RESULTS.md "Estimator calibration").

Usage:
    python scripts/provisional_corner_eval.py --tag ref-freq42-e200 \
        [--fourier] [--seed 42]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import torch
import yaml

import jax

jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tests._reference_stubs import install_reference_stubs  # noqa: E402

install_reference_stubs()

from fdiff.utils.fourier import idft as ref_idft  # noqa: E402

from fourierdiffusion_tpu.data.datamodules import SyntheticDatamodule  # noqa: E402
from fourierdiffusion_tpu.sampling.metrics import (  # noqa: E402
    MarginalWasserstein,
    MetricCollection,
    SlicedWasserstein,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--fourier", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", type=Path, default=REPO / "runs_reference")
    args = ap.parse_args()

    chunks_dir = args.out / args.tag / "sample_chunks"
    chunks = sorted(chunks_dir.glob("chunk_*.pt"))
    if not chunks:
        sys.exit(f"no chunks in {chunks_dir}")
    x = torch.cat([torch.load(p, weights_only=False) for p in chunks])
    print(f"{len(chunks)} chunks, n={x.shape[0]}")

    dm = SyntheticDatamodule(
        random_seed=args.seed,
        fourier_transform=args.fourier,
        standardize=True,
        batch_size=64,
    )
    dm.prepare_data()
    dm.setup()

    mean, std = dm.feature_mean_and_std
    xn = x.numpy() * np.asarray(std) + np.asarray(mean)
    if args.fourier:
        xn = ref_idft(torch.from_numpy(xn)).numpy()

    metrics = MetricCollection(
        metric_factories=[
            lambda o: SlicedWasserstein(o, random_seed=args.seed, num_directions=1000),
            lambda o: MarginalWasserstein(o, random_seed=args.seed),
        ],
        original_samples=np.asarray(dm.X_train),
        include_baselines=True,
        include_spectral_density=False,
    )
    results = metrics(xn)
    out = args.out / args.tag / f"results_provisional_n{x.shape[0]}.yaml"
    with open(out, "w") as f:
        yaml.safe_dump(results, f)
    printable = {
        k: round(v, 5)
        for k, v in results.items()
        if isinstance(v, float) and not k.startswith("spectral")
    }
    print(yaml.safe_dump(printable))
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
