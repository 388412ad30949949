"""Sample reference-TRAINED weights with OUR fused TPU sampler.

Closes the cross-implementation loop: ``reference_quality_run.py`` trains
the actual reference torch model and samples it with the reference's own
Python-loop sampler; this script imports that run's ``model.pt`` through
``utils/torch_import.py`` and generates with our single-``lax.scan``
fused sampler under the identical eval protocol. Metrics landing within
seed noise of the reference's own demonstrate end-to-end sampler parity
at full scale — on top of the step-level trajectory-parity tests
(``tests/test_reference_sampler_parity.py``).

Usage:
    python scripts/cross_sample_reference_weights.py \
        --run runs_reference/ref-time42-e60 [--fourier] \
        [--num-samples 500] [--num-diffusion-steps 250]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import yaml

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from fourierdiffusion_tpu.data.datamodules import SyntheticDatamodule  # noqa: E402
from fourierdiffusion_tpu.models import ScoreModelConfig  # noqa: E402
from fourierdiffusion_tpu.ops.fourier import idft  # noqa: E402
from fourierdiffusion_tpu.sampling.metrics import (  # noqa: E402
    MarginalWasserstein,
    MetricCollection,
    SlicedWasserstein,
)
from fourierdiffusion_tpu.sampling.sampler import DiffusionSampler  # noqa: E402
from fourierdiffusion_tpu.schedulers import VPScheduler  # noqa: E402
from fourierdiffusion_tpu.utils.torch_import import (  # noqa: E402
    _IMPORTERS,
    load_torch_state_dict,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=Path, required=True)
    ap.add_argument("--model", default="transformer", choices=sorted(_IMPORTERS))
    ap.add_argument("--fourier", action="store_true")
    ap.add_argument("--d-model", type=int, default=72)
    ap.add_argument("--num-layers", type=int, default=10)
    ap.add_argument("--n-head", type=int, default=12)
    ap.add_argument("--num-samples", type=int, default=500)
    ap.add_argument("--num-diffusion-steps", type=int, default=250)
    ap.add_argument("--sample-batch-size", type=int, default=500)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--save-samples",
        action="store_true",
        help="also write the post-processed samples to "
        "<run>/samples_cross_our_sampler.npy (enables "
        "divergence_decomposition.py-style tail analysis on this corner)",
    )
    args = ap.parse_args()

    import jax

    dm = SyntheticDatamodule(
        random_seed=args.seed, fourier_transform=args.fourier, standardize=True
    )
    dm.prepare_data()
    dm.setup()
    params = dm.dataset_parameters

    model_pt = args.run / "model.pt"
    if not model_pt.exists():
        raise SystemExit(
            f"{model_pt} not found. model.pt is gitignored (13 MB of torch "
            "weights); regenerate it first with\n"
            f"  python scripts/reference_quality_run.py --tag {args.run.name} ..."
            "\n(see RESULTS.md 'Reproduce' for the exact flags)."
        )
    sd = load_torch_state_dict(model_pt)
    variables = _IMPORTERS[args.model](sd, num_layers=args.num_layers)

    model_kwargs = {"n_head": args.n_head} if args.model == "transformer" else {}
    model = ScoreModelConfig(
        model_type=args.model,
        d_model=args.d_model,
        num_layers=args.num_layers,
        **model_kwargs,
    ).build(n_channels=params["n_channels"], max_len=params["max_len"])
    scheduler = VPScheduler(fourier_noise_scaling=args.fourier)
    sampler = DiffusionSampler(
        model,
        scheduler,
        max_len=params["max_len"],
        n_channels=params["n_channels"],
        sample_batch_size=args.sample_batch_size,
    )
    x = sampler.sample(
        variables,
        jax.random.PRNGKey(args.seed),
        num_samples=args.num_samples,
        num_diffusion_steps=args.num_diffusion_steps,
    )

    mean, std = dm.feature_mean_and_std
    x = np.asarray(x) * np.asarray(std) + np.asarray(mean)
    if args.fourier:
        x = np.asarray(idft(x))

    # Divergent-chain census, shared definition with cli/sample.py and
    # the decomposition/stats tooling (final time-domain samples; data
    # absmax ~2).
    from fourierdiffusion_tpu.utils.census import (
        DIVERGENCE_CENSUS_THRESHOLD,
        census_fields,
    )

    absmax = np.abs(x).max(axis=tuple(range(1, x.ndim)))
    n_div = int((absmax > DIVERGENCE_CENSUS_THRESHOLD).sum())
    print(
        f"divergent chains (absmax>{DIVERGENCE_CENSUS_THRESHOLD:g}): "
        f"{n_div}/{x.shape[0]} "
        f"(max {absmax.max():.1f}, p99.9 {np.quantile(absmax, 0.999):.1f})"
    )
    if args.save_samples:
        np.save(args.run / "samples_cross_our_sampler.npy", x)

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
    # Persist the census in the committed yaml (wipe #5 destroyed the
    # seed-49 counts that lived only in /tmp logs; same fields as
    # cli/sample.py, arm tagged "reference" for the rate scanner).
    results.update(
        census_fields(
            x,
            guard_active=False,
            num_samples=args.num_samples,
            num_diffusion_steps=args.num_diffusion_steps,
            method="em",
            sampling_seed=args.seed,
            train_seed=args.seed,
            arm="reference",
        )
    )
    out = args.run / "results_cross_our_sampler.yaml"
    with open(out, "w") as f:
        yaml.safe_dump(results, f)
    printable = {
        k: round(v, 5)
        for k, v in results.items()
        if isinstance(v, float) and "mean" in k and "dummy" not in k
    }
    print(yaml.safe_dump(printable))
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
