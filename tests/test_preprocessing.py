"""Host-side preprocessing pipelines on synthetic raw files: NASDAQ
stock CSVs, US-droughts daily CSV, NASA battery cycles — verifying the
shapes, filtering rules, and train/test split fractions of reference
``preprocessing.py:183-395``.
"""

import numpy as np
import pandas as pd
import pytest

from fourierdiffusion_tpu.data.preprocessing import (
    droughts_preprocess,
    nasa_preprocess,
    nasdaq_preprocess,
)


HOLIDAYS_2019 = [
    "2019-01-01", "2019-01-21", "2019-02-18", "2019-04-19", "2019-05-27",
    "2019-07-04", "2019-09-02", "2019-11-28", "2019-12-25",
]  # 261 business days - 9 holidays = 252 trading days


def _write_stock(dir_, name, start, end, skip_days=0):
    dates = pd.bdate_range(start, end)
    dates = dates[~dates.isin(pd.to_datetime(HOLIDAYS_2019))]
    if skip_days:
        dates = dates[:-skip_days]
    df = pd.DataFrame(
        {
            "Date": dates,
            "Open": np.linspace(1, 2, len(dates)),
            "High": np.linspace(1.1, 2.1, len(dates)),
            "Low": np.linspace(0.9, 1.9, len(dates)),
            "Close": np.linspace(1, 2, len(dates)),
            "Adj Close": np.linspace(1, 2, len(dates)),
            "Volume": np.arange(len(dates), dtype=float),
        }
    )
    df.to_csv(dir_ / f"{name}.csv", index=False)


def test_nasdaq_preprocess(tmp_path) -> None:
    stocks = tmp_path / "stocks"
    stocks.mkdir()
    for i in range(10):
        _write_stock(stocks, f"GOOD{i}", "2018-12-01", "2020-01-15")
    # A stock starting too late and one with missing days must be dropped.
    _write_stock(stocks, "LATE", "2019-06-01", "2020-01-15")
    _write_stock(stocks, "GAPPY", "2018-12-01", "2020-01-15", skip_days=0)
    # Remove some 2019 rows from GAPPY to create missing days.
    g = pd.read_csv(stocks / "GAPPY.csv", parse_dates=["Date"])
    g = g.drop(g[(g.Date > "2019-05-01") & (g.Date < "2019-05-10")].index)
    g.to_csv(stocks / "GAPPY.csv", index=False)

    nasdaq_preprocess(tmp_path, random_seed=0)
    X_train = np.load(tmp_path / "X_train.npy")
    X_test = np.load(tmp_path / "X_test.npy")
    assert X_train.shape[1:] == (252, 6)
    assert X_train.shape[0] + X_test.shape[0] == 10  # LATE + GAPPY dropped
    assert X_train.shape[0] == 9  # 90/10 split


def test_droughts_preprocess(tmp_path) -> None:
    (tmp_path / "train_timeseries").mkdir()
    dates = pd.date_range("2010-12-01", "2012-02-01")
    rows = []
    for fips in [1001, 1002, 1003]:
        for d in dates:
            rows.append(
                {"fips": fips, "date": d, "T2M": 1.0, "PRECTOT": 2.0,
                 "WS10M": 3.0, "score": np.nan}  # nan column must be dropped
            )
    pd.DataFrame(rows).to_csv(
        tmp_path / "train_timeseries" / "train_timeseries.csv", index=False
    )
    droughts_preprocess(tmp_path, random_seed=0)
    X_train = np.load(tmp_path / "X_train.npy")
    X_test = np.load(tmp_path / "X_test.npy")
    # 2011 = 365 days; 3 features survive (score dropped as all-nan).
    assert X_train.shape[1:] == (365, 3)
    assert X_train.shape[0] + X_test.shape[0] == 3


def test_nasa_preprocess_charge(tmp_path) -> None:
    data_dir = tmp_path / "cleaned_dataset" / "data"
    data_dir.mkdir(parents=True)
    feats = ["Voltage_measured", "Current_measured", "Temperature_measured",
             "Current_charge", "Voltage_charge"]
    meta_rows = []
    rng = np.random.default_rng(0)
    for i in range(8):
        name = f"cycle_{i}.csv"
        t = np.arange(0, 5200, 5.0)  # max time > cutoff (4990), gap 5 < 10
        df = pd.DataFrame({f: rng.normal(size=len(t)) for f in feats})
        df["Time"] = t
        df.to_csv(data_dir / name, index=False)
        meta_rows.append({"type": "charge", "filename": name})
    # A too-short cycle and a gappy cycle must be dropped.
    short = pd.DataFrame({f: [0.0, 1.0] for f in feats})
    short["Time"] = [0.0, 10.0]
    short.to_csv(data_dir / "short.csv", index=False)
    meta_rows.append({"type": "charge", "filename": "short.csv"})
    gappy_t = np.concatenate([np.arange(0, 2000, 5.0), np.arange(2100, 5200, 5.0)])
    gappy = pd.DataFrame({f: rng.normal(size=len(gappy_t)) for f in feats})
    gappy["Time"] = gappy_t
    gappy.to_csv(data_dir / "gappy.csv", index=False)
    meta_rows.append({"type": "charge", "filename": "gappy.csv"})
    pd.DataFrame(meta_rows).to_csv(tmp_path / "cleaned_dataset" / "metadata.csv", index=False)

    nasa_preprocess(tmp_path, subdataset="charge", random_seed=0)
    X_train = np.load(tmp_path / "charge" / "X_train.npy")
    X_test = np.load(tmp_path / "charge" / "X_test.npy")
    # cutoff 5000 - 5000%10 = 5000; bins of 10s -> 501 steps.
    assert X_train.shape[1:] == (501, 5)
    assert X_train.shape[0] + X_test.shape[0] == 8
