"""End-to-end CLI test: ``fdiff-train`` on the dummy datamodule then
``fdiff-sample`` from the written run directory — the minimum end-to-end
slice of SURVEY.md §7 step 4, exercising config composition, training,
checkpointing, the fused sampler, metrics, and the artifact contract
(train_config.yaml / checkpoints / results.yaml / samples.npy).
"""

import os

import numpy as np
import pytest
import yaml

from fourierdiffusion_tpu.cli.sample import main as sample_main
from fourierdiffusion_tpu.cli.train import main as train_main


@pytest.mark.parametrize("fourier", ["false", "true"])
def test_train_then_sample(tmp_path, monkeypatch, fourier) -> None:
    monkeypatch.chdir(tmp_path)
    run_dir = tmp_path / "runs"

    train_main([
        "datamodule=dummy",
        f"datamodule.data_dir={tmp_path / 'data'}",
        "score_model=mlp",
        "score_model.d_model=16",
        "score_model.d_mlp=32",
        "score_model.num_layers=1",
        "trainer.max_epochs=2",
        "trainer.callbacks.sampling.enabled=true",
        "trainer.callbacks.sampling.every_n_epochs=1",
        "trainer.callbacks.sampling.num_samples=16",
        "trainer.callbacks.sampling.num_diffusion_steps=5",
        "trainer.callbacks.sampling.num_directions=10",
        f"fourier_transform={fourier}",
        f"run_dir={run_dir}",
    ])

    run_ids = [p.name for p in run_dir.iterdir() if p.is_dir()]
    assert len(run_ids) == 1
    run_id = run_ids[0]
    assert (run_dir / run_id / "train_config.yaml").exists()
    assert (run_dir / run_id / "metrics.jsonl").exists()
    ckpts = list((run_dir / run_id / "checkpoints").glob("epoch=*"))
    assert ckpts, "no checkpoint written"

    sample_main([
        f"model_path={run_dir}",
        f"model_id={run_id}",
        "num_samples=24",
        "num_diffusion_steps=5",
        "sampler.sample_batch_size=16",
        "metrics.num_directions=10",
    ])

    results = yaml.safe_load(open(run_dir / run_id / "results.yaml"))
    assert "time_sliced_wasserstein_mean" in results
    assert "freq_marginal_wasserstein_mean" in results
    assert "spectral_marginal_wasserstein_mean" in results
    assert "time_sliced_wasserstein_mean_self" in results  # baselines on
    # Divergence census is always recorded (wipe-proof knife-edge audit)
    assert results["divergence_census_count"] >= 0
    assert results["divergence_census_max_absmax"] > 0

    samples = np.load(run_dir / run_id / "samples.npy")
    assert samples.shape == (24, 20, 3)
    assert np.all(np.isfinite(samples))
    assert (run_dir / run_id / "sample_config.yaml").exists()

    if fourier == "true":
        # checkpoint=last loads the final epoch instead of best-val
        # (RESULTS.md "EMA 10k tail divergence: resolved").
        sample_main([
            f"model_path={run_dir}",
            f"model_id={run_id}",
            "checkpoint=last",
            "num_samples=16",
            "num_diffusion_steps=5",
            "sampler.sample_batch_size=16",
            "metrics.num_directions=10",
        ])
        assert np.all(np.isfinite(np.load(run_dir / run_id / "samples.npy")))


def test_train_guard_noise_scaling_without_fourier(tmp_path, monkeypatch) -> None:
    monkeypatch.chdir(tmp_path)
    with pytest.raises(AssertionError, match="noise scaling"):
        train_main([
            "datamodule=dummy",
            "score_model=mlp",
            "score_model.d_model=8",
            "score_model.d_mlp=16",
            "score_model.num_layers=1",
            "trainer.max_epochs=1",
            "trainer.callbacks.sampling.enabled=false",
            "score_model.fourier_noise_scaling=true",
            f"run_dir={tmp_path / 'runs'}",
        ])
