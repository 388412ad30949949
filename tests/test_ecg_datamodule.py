"""ECG datamodule on synthetic MIT-BIH-format CSVs: shapes, labels,
localization-based subsampling, and frequency smoothing (reference
``datamodules.py:164-241``).
"""

import numpy as np
import pandas as pd
import pytest

from fourierdiffusion_tpu.data.datamodules import ECGDatamodule
from fourierdiffusion_tpu.ops.fourier import localization_metrics


def _write_mitbih(path, n_rows, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(187)
    # Half localized "beats" (gaussian bumps), half spread sinusoids.
    X = np.zeros((n_rows, 187), dtype=np.float32)
    for i in range(n_rows):
        if i % 2 == 0:
            center = rng.integers(40, 140)
            X[i] = np.exp(-((t - center) ** 2) / 20)
        else:
            X[i] = np.sin(t * rng.uniform(0.1, 1.0))
    y = rng.integers(0, 5, size=n_rows)
    df = pd.DataFrame(np.column_stack([X, y]))
    df.to_csv(path, index=False)


@pytest.fixture
def ecg_dir(tmp_path):
    d = tmp_path / "ecg"
    d.mkdir()
    _write_mitbih(d / "mitbih_train.csv", 64)
    _write_mitbih(d / "mitbih_test.csv", 16, seed=1)
    return tmp_path


def test_ecg_shapes_and_labels(ecg_dir) -> None:
    dm = ECGDatamodule(data_dir=ecg_dir, batch_size=8)
    dm.setup()
    # Header row consumes one sample (reference reads with a header too).
    assert dm.X_train.shape[1:] == (187, 1)
    assert dm.X_test.shape[1:] == (187, 1)
    assert dm.y_train.shape[0] == dm.X_train.shape[0]
    assert dm.y_train.dtype.kind in "iu"


def test_ecg_subsample_localization(ecg_dir) -> None:
    dm = ECGDatamodule(
        data_dir=ecg_dir, batch_size=8, subsample_localization=True
    )
    dm.setup()
    # Keeps min(1000, N) most time-localized series; with 63 rows all
    # are kept but ORDERED by localization score — top rows must be the
    # gaussian bumps (more localized than the sinusoids).
    x_loc, x_spec_loc = localization_metrics(dm.X_train)
    score = np.asarray(x_loc / x_spec_loc)
    assert np.all(np.diff(score) >= -1e-3), "not sorted by localization"


def test_ecg_smoothing_reduces_high_freq(ecg_dir) -> None:
    dm_plain = ECGDatamodule(data_dir=ecg_dir, batch_size=8)
    dm_plain.setup()
    dm_smooth = ECGDatamodule(
        data_dir=ecg_dir, batch_size=8, smooth_frequency=True, smoother_width=3.0
    )
    dm_smooth.setup()
    from fourierdiffusion_tpu.ops.fourier import spectral_density

    dens_plain = np.asarray(spectral_density(dm_plain.X_train)).mean(axis=(0, 2))
    dens_smooth = np.asarray(spectral_density(dm_smooth.X_train)).mean(axis=(0, 2))
    hi = len(dens_plain) // 2
    assert dens_smooth[hi:].sum() < dens_plain[hi:].sum()
