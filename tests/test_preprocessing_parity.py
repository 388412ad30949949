"""GOLDEN parity: our host-side preprocessing vs the ACTUAL reference code.

``tests/test_preprocessing.py`` validates our pipelines against hand-built
expectations; this module goes further (VERDICT r03 "Missing #2") and runs
the reference's own ``fdiff/utils/preprocessing.py`` (importable — torch +
pandas are installed) and our ``data/preprocessing.py`` on the SAME
synthetic raw fixture files, asserting array equality of the outputs for
all four pipelines, plus the ECG datamodule path (loc-subsample +
frequency smoother) against the reference ``ECGDatamodule``.

The two implementations intentionally use different split RNGs (the
reference: ``torch.randperm`` / ``np.random.permutation``; ours:
``np.random.default_rng``), so membership of the train/test splits is not
a parity surface. Each test pins BOTH splits to the same deterministic
permutation (identity / sorted) via monkeypatching, which makes the
comparison exact end-to-end: filtering, pivoting, imputation and
standardization must then agree bit-for-bit.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
import torch

from _reference_stubs import REFERENCE_SRC, install_reference_stubs

install_reference_stubs()

import fdiff.utils.preprocessing as ref_pre  # noqa: E402

import fourierdiffusion_tpu.data.preprocessing as our_pre  # noqa: E402
from test_preprocessing import HOLIDAYS_2019, _write_stock  # noqa: E402


def _pin_splits(monkeypatch) -> None:
    """Pin both implementations to the identity train/test split."""
    # Reference: torch.manual_seed + torch.randperm.
    monkeypatch.setattr(
        ref_pre.torch, "randperm", lambda n, **kw: torch.arange(n)
    )
    # Ours: the shared _random_split helper.
    monkeypatch.setattr(
        our_pre,
        "_random_split",
        lambda X, frac, seed: (X[: int(frac * len(X))], X[int(frac * len(X)) :]),
    )


def _load_pair(data_dir: Path, name: str) -> tuple[np.ndarray, np.ndarray]:
    ours = np.load(data_dir / f"X_{name}.npy")
    ref = torch.load(data_dir / f"X_{name}.pt", weights_only=True).numpy()
    return ours, ref


def _assert_split_parity(data_dir: Path) -> None:
    for name in ("train", "test"):
        ours, ref = _load_pair(data_dir, name)
        assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
        np.testing.assert_array_equal(ours, ref, err_msg=name)


# ---------------------------------------------------------------------------
# NASDAQ (reference preprocessing.py:183-258)
# ---------------------------------------------------------------------------


def test_nasdaq_parity(tmp_path, monkeypatch) -> None:
    _pin_splits(monkeypatch)
    stocks = tmp_path / "stocks"
    stocks.mkdir()
    rng = np.random.default_rng(7)
    for i in range(8):
        # NOTE: names must not start/end with characters in ".csv" — the
        # reference mangles those via str.strip(".csv") (preprocessing.py:205).
        _write_stock(stocks, f"TKR{i}", "2018-12-01", "2020-01-15")
    _write_stock(stocks, "LATE0", "2019-06-01", "2020-01-15")  # dropped
    # Distinct per-stock values so a row mix-up cannot pass by accident.
    for i in range(8):
        f = pd.read_csv(stocks / f"TKR{i}.csv", parse_dates=["Date"])
        for col in ("Open", "High", "Low", "Close", "Adj Close", "Volume"):
            f[col] = rng.normal(size=len(f)).astype(np.float64)
        f.to_csv(stocks / f"TKR{i}.csv", index=False)

    our_pre.nasdaq_preprocess(tmp_path, random_seed=0)
    ref_pre.nasdaq_preprocess(tmp_path, random_seed=0)
    _assert_split_parity(tmp_path)


# ---------------------------------------------------------------------------
# US droughts (reference preprocessing.py:353-395)
# ---------------------------------------------------------------------------


def test_droughts_parity(tmp_path, monkeypatch) -> None:
    _pin_splits(monkeypatch)
    (tmp_path / "train_timeseries").mkdir()
    dates = pd.date_range("2010-12-01", "2012-02-01")
    rng = np.random.default_rng(11)
    rows = []
    for fips in [1001, 1002, 1003, 1004, 1005]:
        for d in dates:
            rows.append(
                {
                    "fips": fips,
                    "date": d,
                    "T2M": rng.normal(),
                    "PRECTOT": rng.normal(),
                    "WS10M": rng.normal(),
                    "score": np.nan,  # all-nan column must be dropped
                }
            )
    pd.DataFrame(rows).to_csv(
        tmp_path / "train_timeseries" / "train_timeseries.csv", index=False
    )
    our_pre.droughts_preprocess(tmp_path, random_seed=0)
    ref_pre.droughts_preprocess(tmp_path, random_seed=0)
    _assert_split_parity(tmp_path)


# ---------------------------------------------------------------------------
# NASA batteries (reference preprocessing.py:261-350), both subdatasets
# ---------------------------------------------------------------------------


def _write_nasa_fixture(tmp_path: Path, subdataset: str) -> None:
    data_dir = tmp_path / "cleaned_dataset" / "data"
    data_dir.mkdir(parents=True)
    load_feats = (
        ["Current_charge", "Voltage_charge"]
        if subdataset == "charge"
        else ["Current_load", "Voltage_load"]
    )
    feats = [
        "Voltage_measured",
        "Current_measured",
        "Temperature_measured",
        *load_feats,
    ]
    dt, t_max = (5.0, 5200) if subdataset == "charge" else (7.0, 2100)
    rng = np.random.default_rng(3)
    meta_rows = []
    for i in range(7):
        name = f"cycle_{i}.csv"
        t = np.arange(0, t_max, dt)
        df = pd.DataFrame({f: rng.normal(size=len(t)) for f in feats})
        df["Time"] = t
        df.to_csv(data_dir / name, index=False)
        meta_rows.append({"type": subdataset, "filename": name})
    # One too-short cycle: must be dropped by both pipelines.
    short = pd.DataFrame({f: [0.0, 1.0] for f in feats})
    short["Time"] = [0.0, dt]
    short.to_csv(data_dir / "short.csv", index=False)
    meta_rows.append({"type": subdataset, "filename": "short.csv"})
    pd.DataFrame(meta_rows).to_csv(
        tmp_path / "cleaned_dataset" / "metadata.csv", index=False
    )


@pytest.mark.parametrize("subdataset", ["charge", "discharge"])
def test_nasa_parity(tmp_path, monkeypatch, subdataset) -> None:
    _pin_splits(monkeypatch)
    _write_nasa_fixture(tmp_path, subdataset)
    our_pre.nasa_preprocess(tmp_path, subdataset=subdataset, random_seed=0)
    ref_pre.nasa_preprocess(tmp_path, subdataset=subdataset, random_seed=0)
    _assert_split_parity(tmp_path / subdataset)


# ---------------------------------------------------------------------------
# MIMIC-III (reference preprocessing.py:10-181): pd.read_hdf is
# monkeypatched (pytables is not installed) to serve the same fixture
# frames to both pipelines; the split permutation is pinned to sorted
# subject order on both sides so standardization stats agree exactly.
# ---------------------------------------------------------------------------


def _mimic_fixture() -> tuple[pd.DataFrame, pd.DataFrame]:
    n_subj, n_feat, n_hours = 10, 104, 30
    features = [f"f{i:03d}" for i in range(n_feat)]
    rng = np.random.default_rng(5)

    statics_index = pd.MultiIndex.from_tuples(
        [(1000 + s, 2000 + s, 3000 + s) for s in range(n_subj)],
        names=["subject_id", "hadm_id", "icustay_id"],
    )
    # Two stays are too short (max_hours <= 30) and must be filtered out.
    statics = pd.DataFrame(
        {
            "max_hours": [40.0] * (n_subj - 2) + [20.0, 25.0],
            "mort_hosp": rng.integers(0, 2, n_subj).astype(float),
            "mort_icu": rng.integers(0, 2, n_subj).astype(float),
            "los_icu": rng.uniform(1, 10, n_subj),
        },
        index=statics_index,
    )

    vitals_index = pd.MultiIndex.from_tuples(
        [
            (1000 + s, 2000 + s, 3000 + s, h)
            for s in range(n_subj)
            for h in range(n_hours)
        ],
        names=["subject_id", "hadm_id", "icustay_id", "hours_in"],
    )
    cols = pd.MultiIndex.from_product(
        [features, ["mean", "count"]], names=["LEVEL2", "Aggregation Function"]
    )
    vitals = pd.DataFrame(
        rng.normal(size=(len(vitals_index), len(cols))), index=vitals_index, columns=cols
    )
    # Sparse observations: missing means + matching zero counts exercise the
    # LOCF -> stay-mean -> 0 imputation and the mask/time-since channels.
    idx = pd.IndexSlice
    mask = rng.uniform(size=(len(vitals_index), n_feat)) < 0.35
    means = vitals.loc[:, idx[:, "mean"]].to_numpy().copy()
    means[mask] = np.nan
    vitals.loc[:, idx[:, "mean"]] = means
    counts = (~mask).astype(float) * rng.integers(1, 4, size=mask.shape)
    vitals.loc[:, idx[:, "count"]] = counts
    # One feature never observed for one stay: falls through to fillna(0).
    vitals.loc[idx[1000, :, :, :], idx["f000", "mean"]] = np.nan
    vitals.loc[idx[1000, :, :, :], idx["f000", "count"]] = 0.0
    return statics, vitals


def test_mimic_parity(tmp_path, monkeypatch) -> None:
    statics, vitals = _mimic_fixture()

    # pandas >= 2.2 removed DataFrameGroupBy.fillna, which the reference's
    # mimic_imputer calls (preprocessing.py:39-46). Reinstate the legacy
    # behavior (fill each group's NaNs from a DataFrame indexed by the
    # group keys) so the REAL reference code runs unmodified.
    from pandas.core.groupby.generic import DataFrameGroupBy

    def _legacy_groupby_fillna(self, value):
        obj = self.obj
        id_cols = ["subject_id", "hadm_id", "icustay_id"]
        aligned = value.reindex(
            pd.MultiIndex.from_arrays(
                [obj.index.get_level_values(c) for c in id_cols]
            )
        )
        aligned.index = obj.index
        return obj.fillna(aligned)

    monkeypatch.setattr(
        DataFrameGroupBy, "fillna", _legacy_groupby_fillna, raising=False
    )

    def fake_read_hdf(path, key):
        return {"patients": statics.copy(), "vitals_labs": vitals.copy()}[key]

    monkeypatch.setattr(pd, "read_hdf", fake_read_hdf)
    # Pin both split permutations to sorted subject order.
    monkeypatch.setattr(
        ref_pre.np.random,
        "permutation",
        lambda x: np.sort(np.asarray(list(x))),
    )

    class _SortedRng:
        @staticmethod
        def permutation(x):
            return np.sort(np.asarray(list(x)))

    monkeypatch.setattr(our_pre.np.random, "default_rng", lambda seed=None: _SortedRng())

    our_pre.mimic_preprocess(tmp_path, random_seed=0)
    ref_pre.mimic_preprocess(tmp_path, random_seed=0)
    _assert_split_parity(tmp_path)
    ours = np.load(tmp_path / "X_train.npy")
    assert ours.shape[1:] == (24, 104) and np.isfinite(ours).all()


# ---------------------------------------------------------------------------
# ECG datamodule path (reference datamodules.py:164-241): loc-subsample
# ranking + Gaussian frequency smoother on the same raw CSVs. L=187 is
# odd, so the reference's even-N smoother grid bug (which we fix) is not
# in play and outputs must agree to float tolerance.
# ---------------------------------------------------------------------------


def test_ecg_datamodule_parity(tmp_path, monkeypatch) -> None:
    import fdiff.dataloaders.datamodules as ref_dm

    from fourierdiffusion_tpu.data.datamodules import ECGDatamodule

    rng = np.random.default_rng(13)
    ecg_dir = tmp_path / "ecg"
    ecg_dir.mkdir()
    for name, n in (("mitbih_train.csv", 40), ("mitbih_test.csv", 12)):
        X = rng.normal(size=(n, 187))
        y = rng.integers(0, 5, size=(n, 1))
        pd.DataFrame(np.concatenate([X, y], axis=1)).to_csv(
            ecg_dir / name, index=False
        )

    kwargs = dict(
        data_dir=tmp_path,
        random_seed=42,
        batch_size=8,
        subsample_localization=True,
        smooth_frequency=True,
        smoother_width=2.0,
    )
    ours = ECGDatamodule(**kwargs)
    ours.setup()
    ref = ref_dm.ECGDatamodule(**kwargs)
    ref.setup()

    np.testing.assert_allclose(
        np.asarray(ours.X_train), ref.X_train.numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours.X_test), ref.X_test.numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(ours.y_train), ref.y_train.numpy())
    np.testing.assert_array_equal(np.asarray(ours.y_test), ref.y_test.numpy())
