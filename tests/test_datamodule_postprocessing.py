"""Feature-filtering rules of the cached-preprocess datamodules,
exercised against synthetic cache files (no kaggle downloads): NASA
charge stride/feature selection, NASDAQ volume drop, US-droughts
correlated-feature drop, MIMIC top-variance selection — the exact rules
of reference ``datamodules.py:326-353,406-410,469-476,529-538``.
"""

import numpy as np
import pytest

from fourierdiffusion_tpu.data.datamodules import (
    MIMICIIIDatamodule,
    NASADatamodule,
    NASDAQDatamodule,
    USDroughtsDatamodule,
)


def _write_cache(cache_dir, shape_train, shape_test, seed=0):
    cache_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    np.save(cache_dir / "X_train.npy", rng.normal(size=shape_train).astype(np.float32))
    np.save(cache_dir / "X_test.npy", rng.normal(size=shape_test).astype(np.float32))


def test_nasa_charge_postprocessing(tmp_path) -> None:
    # Raw charge cache: (N, 501, 5); stride-2 + features [0,1,3,4] -> (N, 251, 4).
    _write_cache(tmp_path / "nasa" / "charge", (10, 501, 5), (4, 501, 5))
    dm = NASADatamodule(data_dir=tmp_path, subdataset="charge", batch_size=4)
    dm.setup()
    assert dm.X_train.shape == (10, 251, 4)
    assert dm.X_test.shape == (4, 251, 4)
    raw = np.load(tmp_path / "nasa" / "charge" / "X_train.npy")
    np.testing.assert_allclose(
        np.asarray(dm.X_train), raw[:, ::2, :][:, :, [0, 1, 3, 4]]
    )


def test_nasa_discharge_keeps_all_features(tmp_path) -> None:
    _write_cache(tmp_path / "nasa" / "discharge", (6, 134, 5), (2, 134, 5))
    dm = NASADatamodule(data_dir=tmp_path, subdataset="discharge", batch_size=4)
    dm.setup()
    assert dm.X_train.shape == (6, 134, 5)


def test_nasdaq_drops_volume(tmp_path) -> None:
    _write_cache(tmp_path / "nasdaq", (8, 252, 6), (3, 252, 6))
    dm = NASDAQDatamodule(data_dir=tmp_path, batch_size=4)
    dm.setup()
    assert dm.X_train.shape == (8, 252, 5)
    assert dm.X_test.shape == (3, 252, 5)


def test_usdroughts_drops_correlated_features(tmp_path) -> None:
    _write_cache(tmp_path / "droughts", (7, 365, 12), (2, 365, 12))
    dm = USDroughtsDatamodule(data_dir=tmp_path, batch_size=4)
    dm.setup()
    # Drops {4,5,6,7,9} -> 7 features.
    assert dm.X_train.shape == (7, 365, 7)
    raw = np.load(tmp_path / "droughts" / "X_train.npy")
    keep = [i for i in range(12) if i not in {4, 5, 6, 7, 9}]
    np.testing.assert_allclose(np.asarray(dm.X_train), raw[:, :, keep])


def test_mimic_selects_top_variance_features(tmp_path) -> None:
    rng = np.random.default_rng(1)
    x = rng.normal(size=(20, 24, 104)).astype(np.float32)
    # Inflate the variance of a known set of features.
    boosted = [3, 17, 50]
    x[:, :, boosted] *= 100.0
    (tmp_path / "mimiciii").mkdir(parents=True)
    np.save(tmp_path / "mimiciii" / "X_train.npy", x)
    np.save(tmp_path / "mimiciii" / "X_test.npy", x[:5])
    dm = MIMICIIIDatamodule(data_dir=tmp_path, batch_size=4, n_feats=3)
    dm.setup()
    assert dm.X_train.shape == (20, 24, 3)
    # The 3 boosted features must be the ones kept (per-feature std
    # averaged over time, descending).
    selected_std = np.std(np.asarray(dm.X_train), axis=(0, 1))
    assert np.all(selected_std > 50)
