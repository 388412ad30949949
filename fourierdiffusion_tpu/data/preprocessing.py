"""One-shot raw -> array preprocessing pipelines (host-side, pandas).

Feature parity with the reference ``src/fdiff/utils/preprocessing.py``:
MIMIC-III hourly vitals/labs (24h window, per-feature standardization,
ffill/mean/0 imputation), NASDAQ 2019 daily OHLCV (complete 252-day
coverage), NASA battery cycles (time-binned charge/discharge), and
US-droughts 2011 county pivots. These run once on the host and cache
``X_train.npy``/``X_test.npy`` — they are not perf-critical
(SURVEY.md §2 "Preprocessing pipelines").
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

ID_COLS = ["subject_id", "hadm_id", "icustay_id"]


def _save_splits(X_train: np.ndarray, X_test: np.ndarray, out_dir: Path) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(out_dir / "X_train.npy", X_train.astype(np.float32))
    np.save(out_dir / "X_test.npy", X_test.astype(np.float32))


def _random_split(
    X: np.ndarray, train_frac: float, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(X))
    n_train = int(train_frac * len(X))
    return X[perm[:n_train]], X[perm[n_train:]]


# --------------------------------------------------------------------------
# MIMIC-III (reference preprocessing.py:10-181)
# --------------------------------------------------------------------------


def _mimic_impute(df):
    """LOCF -> per-stay mean -> 0 imputation of the hourly 'mean'
    aggregates, plus presence masks and time-since-measured channels
    (reference ``mimic_imputer``, preprocessing.py:10-70)."""
    import pandas as pd

    idx = pd.IndexSlice
    df = df.copy()
    if len(df.columns.names) > 2:
        df.columns = df.columns.droplevel(("label", "LEVEL1", "LEVEL2"))

    out = df.loc[:, idx[:, ["mean", "count"]]]
    stay_means = out.loc[:, idx[:, "mean"]].groupby(ID_COLS).mean()
    # LOCF within each stay, then fill remaining gaps with that stay's
    # mean (the reference uses the since-removed ``GroupBy.fillna``,
    # preprocessing.py:39-46; aligning the per-stay means to the hourly
    # row index reproduces it on pandas >= 2.2).
    mean_block = out.loc[:, idx[:, "mean"]].groupby(ID_COLS).ffill()
    stay_aligned = stay_means.reindex(
        pd.MultiIndex.from_arrays(
            [mean_block.index.get_level_values(c) for c in ID_COLS]
        )
    )
    stay_aligned.index = mean_block.index
    out.loc[:, idx[:, "mean"]] = mean_block.fillna(stay_aligned).fillna(0)

    out.loc[:, idx[:, "count"]] = (df.loc[:, idx[:, "count"]] > 0).astype(float)
    out.rename(columns={"count": "mask"}, level="Aggregation Function", inplace=True)

    is_absent = 1 - out.loc[:, idx[:, "mask"]]
    hours_absent = is_absent.cumsum()
    time_since = hours_absent - hours_absent[is_absent == 0].ffill()
    time_since.rename(
        columns={"mask": "time_since_measured"},
        level="Aggregation Function",
        inplace=True,
    )
    out = __import__("pandas").concat((out, time_since), axis=1)
    out.loc[:, idx[:, "time_since_measured"]] = out.loc[
        :, idx[:, "time_since_measured"]
    ].fillna(100)
    out.sort_index(axis=1, inplace=True)
    return out


def _mimic_to_3d(df) -> np.ndarray:
    import pandas as pd

    idx = pd.IndexSlice
    hours = sorted(set(df.index.get_level_values("hours_in")))
    return np.dstack([df.loc[idx[:, :, :, h], :].values for h in hours])


def mimic_preprocess(data_dir: Path, random_seed: int, train_frac: float = 0.8) -> None:
    """MIMIC-Extract h5 -> (N, 24, 104) splits (preprocessing.py:83-181)."""
    import pandas as pd

    dataset_path = data_dir / "all_hourly_data.h5"
    GAP_TIME, WINDOW_SIZE = 6, 24

    statics = pd.read_hdf(dataset_path, "patients")
    df = pd.read_hdf(dataset_path, "vitals_labs")

    ys = statics[statics.max_hours > WINDOW_SIZE + GAP_TIME][
        ["mort_hosp", "mort_icu", "los_icu"]
    ]
    lvl2 = df[
        df.index.get_level_values("icustay_id").isin(
            set(ys.index.get_level_values("icustay_id"))
        )
        & (df.index.get_level_values("hours_in") < WINDOW_SIZE)
    ]

    subjects = set(lvl2.index.get_level_values("subject_id"))
    assert subjects == set(ys.index.get_level_values("subject_id")), "Subject ID pools differ!"

    rng = np.random.default_rng(random_seed)
    subj = rng.permutation(sorted(subjects))
    n_train = int(train_frac * len(subj))
    train_subj, test_subj = set(subj[:n_train]), set(subj[n_train:])
    lvl2_train = lvl2[lvl2.index.get_level_values("subject_id").isin(train_subj)]
    lvl2_test = lvl2[lvl2.index.get_level_values("subject_id").isin(test_subj)]

    idx = pd.IndexSlice
    means = lvl2_train.loc[:, idx[:, "mean"]].mean(axis=0)
    stds = lvl2_train.loc[:, idx[:, "mean"]].std(axis=0)
    lvl2_train = lvl2_train.copy()
    lvl2_test = lvl2_test.copy()
    lvl2_train.loc[:, idx[:, "mean"]] = (lvl2_train.loc[:, idx[:, "mean"]] - means) / stds
    lvl2_test.loc[:, idx[:, "mean"]] = (lvl2_test.loc[:, idx[:, "mean"]] - means) / stds

    lvl2_train, lvl2_test = _mimic_impute(lvl2_train), _mimic_impute(lvl2_test)
    for d in (lvl2_train, lvl2_test):
        assert not d.isnull().any().any()

    splits = []
    for d in (lvl2_train, lvl2_test):
        arr = _mimic_to_3d(d.loc[:, idx[:, "mean"]]).astype(np.float32)
        arr = np.transpose(arr, (0, 2, 1))  # (example, time, channel)
        assert arr.shape[1:] == (24, 104)
        splits.append(arr)
    _save_splits(splits[0], splits[1], data_dir)


# --------------------------------------------------------------------------
# NASDAQ (reference preprocessing.py:183-258)
# --------------------------------------------------------------------------


def nasdaq_preprocess(
    data_dir: Path,
    random_seed: int,
    train_frac: float = 0.9,
    start_date: str = "2019-01-01",
    end_date: str = "2020-01-01",
) -> None:
    """Raw stock CSVs -> (N, 252, 6) splits, keeping only stocks active
    over the full interval with no missing trading day."""
    import pandas as pd

    frames = []
    stock_paths = sorted((data_dir / "stocks").glob("*.csv"))
    for path in stock_paths:
        f = pd.read_csv(path)
        f["Name"] = path.stem
        frames.append(f)
    df = pd.concat(frames, axis=0, ignore_index=True)
    df["Date"] = pd.to_datetime(df["Date"])
    start, end = pd.to_datetime(start_date), pd.to_datetime(end_date)

    first = df.groupby("Name")["Date"].min()
    last = df.groupby("Name")["Date"].max()
    valid = set(first[first <= start].index) & set(last[last >= end].index)
    df = df[df["Name"].isin(valid) & (df["Date"] >= start) & (df["Date"] < end)]

    n_days = df.groupby("Name")["Date"].nunique()
    df = df[df["Name"].isin(set(n_days[n_days == 252].index))]

    pivot = df.pivot_table(
        index="Name",
        columns="Date",
        values=["Open", "High", "Low", "Close", "Adj Close", "Volume"],
    )
    X = pivot.to_numpy(np.float32).reshape(len(pivot), 6, 252)
    X = np.transpose(X, (0, 2, 1))
    X_train, X_test = _random_split(X, train_frac, random_seed)
    _save_splits(X_train, X_test, data_dir)


# --------------------------------------------------------------------------
# NASA batteries (reference preprocessing.py:261-350)
# --------------------------------------------------------------------------

_NASA_SPECS = {
    "charge": (
        ["Voltage_measured", "Current_measured", "Temperature_measured",
         "Current_charge", "Voltage_charge"],
        10,
        5000,
    ),
    "discharge": (
        ["Voltage_measured", "Current_measured", "Temperature_measured",
         "Current_load", "Voltage_load"],
        15,
        1995,  # 2000 - 2000 % 15
    ),
}


def nasa_preprocess(
    data_dir: Path,
    subdataset: str = "charge",
    train_frac: float = 0.9,
    random_seed: int = 42,
) -> None:
    """Time-binned battery cycles -> (N, T, 5) splits; cycles shorter
    than the cutoff or with sampling gaps above the bin size are dropped."""
    import pandas as pd

    features, interval_bin, cutoff_raw = _NASA_SPECS[subdataset]
    cutoff_time = cutoff_raw - cutoff_raw % interval_bin

    metadata = pd.read_csv(data_dir / "cleaned_dataset" / "metadata.csv")
    files = metadata[metadata["type"] == subdataset]["filename"].values

    rows = []
    for filename in files:
        data = pd.read_csv(data_dir / "cleaned_dataset" / "data" / filename)
        if data["Time"].max() <= cutoff_time:
            continue
        if data["Time"].diff().max() > interval_bin:
            continue
        data = data[data["Time"] < cutoff_time]
        data["Time_Bin"] = pd.cut(
            data["Time"],
            bins=range(-interval_bin, int(cutoff_time + interval_bin), interval_bin),
        )
        binned = data.groupby("Time_Bin", observed=False).mean(numeric_only=True).reset_index()
        binned["Time_Bin"] = binned.index
        binned["filename"] = filename
        rows.append(binned)
    full = pd.concat(rows)

    pivot = full.pivot(index="filename", columns="Time_Bin", values=features)
    n_steps = cutoff_time // interval_bin + 1
    X = pivot.to_numpy(np.float32).reshape(len(pivot), len(features), n_steps)
    X = np.transpose(X, (0, 2, 1))
    X_train, X_test = _random_split(X, train_frac, random_seed)
    _save_splits(X_train, X_test, data_dir / subdataset)


# --------------------------------------------------------------------------
# US droughts (reference preprocessing.py:353-395)
# --------------------------------------------------------------------------


def droughts_preprocess(
    data_dir: Path,
    random_seed: int,
    train_frac: float = 0.9,
    start_date: str = "2011-01-01",
    end_date: str = "2012-01-01",
) -> None:
    """Daily meteo CSV -> (N_counties, 365, F) splits for one year."""
    import pandas as pd

    df = pd.read_csv(data_dir / "train_timeseries" / "train_timeseries.csv")
    df["date"] = pd.to_datetime(df["date"])
    start, end = pd.to_datetime(start_date), pd.to_datetime(end_date)
    df = df[(df["date"] >= start) & (df["date"] < end)]
    df = df.dropna(axis=1)

    pivot = df.pivot_table(index="fips", columns="date")
    n_days = (end - start).days
    n_feats = pivot.shape[1] // n_days
    X = pivot.to_numpy(np.float32).reshape(len(pivot), n_feats, n_days)
    X = np.transpose(X, (0, 2, 1))
    X_train, X_test = _random_split(X, train_frac, random_seed)
    _save_splits(X_train, X_test, data_dir)
