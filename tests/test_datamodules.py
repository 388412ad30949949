"""Datamodule tests mirroring the reference categories
(``tests/test_datamodules.py``): standardize/unstandardize identity,
val-uses-train-stats, and Fourier dataset == dft of plain dataset.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fourierdiffusion_tpu.data.datamodules import (
    DATAMODULE_REGISTRY,
    DummyDatamodule,
    SyntheticDatamodule,
)
from fourierdiffusion_tpu.ops import idft

BATCH = 12
MAX_LEN = 30
CHANNELS = 2


def _dummy(**kw) -> DummyDatamodule:
    dm = DummyDatamodule(
        batch_size=BATCH, n_channels=CHANNELS, max_len=MAX_LEN, **kw
    )
    dm.prepare_data()
    dm.setup()
    return dm


def test_dataset_parameters() -> None:
    dm = _dummy()
    params = dm.dataset_parameters
    assert params["n_channels"] == CHANNELS
    assert params["max_len"] == MAX_LEN
    assert params["steps_per_epoch"] == 10  # 10*B samples / B


def test_standardization_round_trip() -> None:
    dm = _dummy(standardize=True)
    split = dm.train_arrays()
    X_std = split.standardized()
    # Standardized features have ~zero mean / unit std per (pos, channel).
    np.testing.assert_allclose(np.asarray(jnp.mean(X_std, axis=0)), 0.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.std(X_std, axis=0, ddof=1)), 1.0, atol=1e-4
    )
    # Un-standardize recovers the raw data (sampling-time contract).
    X_back = X_std * split.feature_std + split.feature_mean
    np.testing.assert_allclose(np.asarray(X_back), np.asarray(split.X), atol=1e-5)


def test_val_uses_train_stats() -> None:
    dm = _dummy(standardize=True)
    train, val = dm.train_arrays(), dm.val_arrays()
    np.testing.assert_allclose(
        np.asarray(val.feature_mean), np.asarray(train.feature_mean)
    )
    np.testing.assert_allclose(
        np.asarray(val.feature_std), np.asarray(train.feature_std)
    )


def test_fourier_dataset_is_dft_of_plain() -> None:
    dm_time = _dummy(fourier_transform=False)
    dm_freq = _dummy(fourier_transform=True)
    X_time = dm_time.train_arrays().X
    X_freq = dm_freq.train_arrays().X
    np.testing.assert_allclose(
        np.asarray(idft(X_freq)), np.asarray(X_time), atol=1e-5
    )


def test_synthetic_datamodule(tmp_path) -> None:
    dm = SyntheticDatamodule(
        data_dir=tmp_path, batch_size=16, max_len=50, num_samples=40
    )
    dm.prepare_data()
    dm.setup()
    assert dm.X_train.shape == (40, 50, 1)
    assert dm.X_test.shape == (40, 50, 1)
    # Sinusoids live in [-1, 1].
    assert float(jnp.max(jnp.abs(dm.X_train))) <= 1.0 + 1e-6
    # prepare_data is idempotent: second call reuses the CSV cache.
    dm2 = SyntheticDatamodule(
        data_dir=tmp_path, batch_size=16, max_len=50, num_samples=40
    )
    dm2.prepare_data()
    dm2.setup()
    np.testing.assert_allclose(np.asarray(dm2.X_train), np.asarray(dm.X_train))


def test_registry_complete() -> None:
    assert set(DATAMODULE_REGISTRY) == {
        "ecg", "synthetic", "mimiciii", "nasdaq", "nasa", "usdroughts", "dummy",
    }


def test_synthetic_families(tmp_path):
    """Extra synthetic DGPs (beyond the reference's single sine):
    distinct cache dirs, reproducible, stationary."""
    import numpy as np

    from fourierdiffusion_tpu.data.datamodules import SyntheticDatamodule

    stats = {}
    for fam in SyntheticDatamodule.FAMILIES:
        dm = SyntheticDatamodule(
            data_dir=tmp_path, family=fam, num_samples=64, max_len=48
        )
        dm.prepare_data()
        dm.setup()
        x = np.asarray(dm.X_train)
        assert x.shape == (64, 48, 1)
        assert np.isfinite(x).all()
        stats[fam] = float(x.std())
    # Families genuinely differ and cache separately.
    assert len({round(s, 4) for s in stats.values()}) == 3
    assert (tmp_path / "synthetic_ar2" / "train.csv").exists()

    import pytest

    with pytest.raises(ValueError):
        SyntheticDatamodule(data_dir=tmp_path, family="bogus")
