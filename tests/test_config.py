"""Config system tests: composition, overrides, interpolation threading,
and the all-configs-constructible sweep (reference
``tests/test_hydra_configs.py:20-51``).
"""

import pytest

from fourierdiffusion_tpu.utils.config import compose, dict_to_str, flatten_config
from fourierdiffusion_tpu.utils.instantiate import (
    build_datamodule,
    build_model_config,
    build_scheduler,
)


def test_train_defaults() -> None:
    cfg = compose("train")
    assert cfg["random_seed"] == 42
    assert cfg["fourier_transform"] is False
    assert cfg["standardize"] is True
    assert cfg["score_model"]["model_type"] == "transformer"
    assert cfg["score_model"]["d_model"] == 72
    assert cfg["score_model"]["num_layers"] == 10
    assert cfg["score_model"]["n_head"] == 12
    assert cfg["score_model"]["noise_scheduler"]["kind"] == "vpsde"
    assert cfg["datamodule"]["name"] == "ecg"
    assert cfg["trainer"]["max_epochs"] == 200


def test_fourier_switch_threads_through() -> None:
    """The single ${fourier_transform} switch flips datamodule AND the
    scheduler's noise scaling (reference conf/score_model/default.yaml:8,
    noise_scheduler/vpsde.yaml:5)."""
    cfg = compose("train", ["fourier_transform=true"])
    assert cfg["datamodule"]["fourier_transform"] is True
    assert cfg["score_model"]["fourier_noise_scaling"] is True
    assert cfg["score_model"]["noise_scheduler"]["fourier_noise_scaling"] is True


def test_group_and_dotted_overrides() -> None:
    cfg = compose(
        "train",
        ["score_model=lstm", "datamodule=nasa", "datamodule.batch_size=8",
         "score_model.noise_scheduler=vesde", "trainer.max_epochs=3"],
    )
    assert cfg["score_model"]["model_type"] == "lstm"
    assert cfg["datamodule"]["name"] == "nasa"
    assert cfg["datamodule"]["batch_size"] == 8
    assert cfg["trainer"]["max_epochs"] == 3


def test_scheduler_group_override() -> None:
    cfg = compose("train", ["score_model/noise_scheduler=vesde"])
    assert cfg["score_model"]["noise_scheduler"]["kind"] == "vesde"


def test_fast_score_model_config() -> None:
    """Opt-in MXU-aligned shape (configs/score_model/fast.yaml): head_dim
    128/8 = 16 fills the bf16 sublane tile; ``fourier_transform`` still
    threads into its noise scaling."""
    cfg = compose("train", ["score_model=fast", "fourier_transform=true"])
    sm = cfg["score_model"]
    assert sm["model_type"] == "transformer"
    assert sm["d_model"] == 128 and sm["n_head"] == 8
    assert sm["d_model"] // sm["n_head"] == 16
    assert sm["fourier_noise_scaling"] is True
    assert sm["noise_scheduler"]["kind"] == "vpsde"


def test_heads6_score_model_config() -> None:
    """Opt-in head-repartitioning shape (configs/score_model/heads6.yaml):
    flagship d_model 72 split over 6 heads -> head_dim 12 (75% sublane
    fill); everything else identical to the reference flagship."""
    cfg = compose("train", ["score_model=heads6", "fourier_transform=true"])
    sm = cfg["score_model"]
    assert sm["model_type"] == "transformer"
    assert sm["d_model"] == 72 and sm["n_head"] == 6
    assert sm["d_model"] // sm["n_head"] == 12
    assert sm["fourier_noise_scaling"] is True
    assert sm["noise_scheduler"]["kind"] == "vpsde"


def test_dim_feedforward_override_threads_to_module() -> None:
    """``score_model.dim_feedforward`` (torch ``dim_feedforward``, default
    2048 per the reference's ``nn.TransformerEncoderLayer``) must reach the
    built flax module — it is the dominant FLOP term at MXU-aligned widths."""
    cfg = compose(
        "train", ["score_model=fast", "score_model.dim_feedforward=512"]
    )
    mc = build_model_config(cfg["score_model"])
    assert mc.dim_feedforward == 512
    model = mc.build(n_channels=1, max_len=16)
    assert model.dim_feedforward == 512
    # Default stays the torch/reference value when unset.
    mc_default = build_model_config(
        compose("train", [])["score_model"]
    )
    assert mc_default.dim_feedforward == 2048


@pytest.mark.parametrize("score_model", ["default", "mlp", "lstm"])
@pytest.mark.parametrize("scheduler", ["vpsde", "vesde"])
def test_all_score_model_configs_constructible(score_model, scheduler) -> None:
    cfg = compose(
        "train",
        [f"score_model={score_model}", f"score_model/noise_scheduler={scheduler}"],
    )
    build_scheduler(cfg["score_model"]["noise_scheduler"])
    mc = build_model_config(cfg["score_model"])
    mc.build(n_channels=2, max_len=16)


@pytest.mark.parametrize(
    "datamodule", ["ecg", "synthetic", "mimiciii", "nasdaq", "nasa", "usdroughts", "dummy"]
)
def test_all_datamodule_configs_constructible(datamodule, tmp_path) -> None:
    cfg = compose(
        "train", [f"datamodule={datamodule}", f"datamodule.data_dir={tmp_path}"]
    )
    dm = build_datamodule(cfg["datamodule"])
    assert dm.dataset_name is not None


def test_sample_config() -> None:
    cfg = compose("sample", ["model_id=abc123"])
    assert cfg["num_samples"] == 10000
    assert cfg["num_diffusion_steps"] == 1000
    assert cfg["sampler"]["sample_batch_size"] == 200
    assert cfg["metrics"]["include_spectral_density"] is True


def test_flatten_and_pretty_print() -> None:
    cfg = compose("train")
    flat = flatten_config(cfg)
    assert "d_model" in flat
    s = dict_to_str(cfg)
    assert "d_model" in s
