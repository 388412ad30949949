"""Datamodules: per-dataset loading, preprocessing hooks, and the
DFT/standardize-on-load dataset contract.

Feature parity with the reference ``src/fdiff/dataloaders/datamodules.py``:

* ``DiffusionDataset`` (``datamodules.py:23-65``) becomes
  :class:`DiffusionArrays` — the whole split lives as one device-resident
  jnp array (every dataset here fits in HBM), transformed to the packed
  frequency domain at construction when ``fourier_transform`` and
  standardized with per-(position, channel) stats computed *in the
  diffusion domain* from a reference split (val uses train stats,
  ``datamodules.py:127-140``). Std uses ddof=1 (torch ``Tensor.std``).
* ``Datamodule`` ABC (``datamodules.py:68-161``): ``prepare_data``
  downloads when the directory is missing; ``setup`` produces
  ``X_train``/``X_test``; ``dataset_parameters`` exposes the shape
  params and steps-per-epoch used to size the LR schedule.
* Concrete datamodules: ecg, synthetic, mimiciii, nasdaq, nasa
  (charge/discharge), usdroughts — with the exact feature-filtering
  rules of the reference (``datamodules.py:164-550``).

TPU re-design: no DataLoader / collate machinery. Batching is an index
gather over a device-resident array driven by ``jax.random.permutation``;
the last batch wraps around the permutation so every step has a static
shape (ceil(N/B) steps per epoch like the reference's DataLoader).
"""

from __future__ import annotations

import dataclasses
import logging
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from fourierdiffusion_tpu.ops.fourier import dft, localization_metrics, smooth_frequency

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class DiffusionArrays:
    """A device-resident split in the diffusion domain.

    ``X`` is already DFT'd (if requested); ``standardized()`` returns
    the model-ready array.
    """

    X: Array
    y: Optional[Array]
    feature_mean: Array
    feature_std: Array
    standardize: bool

    def standardized(self) -> Array:
        if not self.standardize:
            return self.X
        return (self.X - self.feature_mean) / self.feature_std

    def __len__(self) -> int:
        return self.X.shape[0]


def make_diffusion_arrays(
    X: Array,
    y: Optional[Array] = None,
    *,
    fourier_transform: bool = False,
    standardize: bool = False,
    X_ref: Optional[Array] = None,
) -> DiffusionArrays:
    """Build a split with stats from ``X_ref`` (default: itself).

    Mirrors ``DiffusionDataset.__init__`` (``datamodules.py:23-56``):
    the DFT is applied *before* computing mean/std, so standardization
    happens in the diffusion domain and is inverted at sampling time.
    """
    if fourier_transform:
        X = dft(X)
        if X_ref is not None:
            X_ref = dft(X_ref)
    if X_ref is None:
        X_ref = X
    mean = jnp.mean(X_ref, axis=0)
    std = jnp.std(X_ref, axis=0, ddof=1)
    return DiffusionArrays(
        X=X, y=y, feature_mean=mean, feature_std=std, standardize=standardize
    )


class Datamodule(ABC):
    """Dataset loading + split construction (reference ``datamodules.py:68-161``)."""

    def __init__(
        self,
        data_dir: Path | str = Path.cwd() / "data",
        random_seed: int = 42,
        batch_size: int = 32,
        fourier_transform: bool = False,
        standardize: bool = False,
    ) -> None:
        self.data_dir = Path(data_dir) / self.dataset_name
        self.random_seed = random_seed
        self.batch_size = batch_size
        self.fourier_transform = fourier_transform
        self.standardize = standardize
        self.X_train: Optional[Array] = None
        self.y_train: Optional[Array] = None
        self.X_test: Optional[Array] = None
        self.y_test: Optional[Array] = None

    # -- data acquisition ------------------------------------------------
    def prepare_data(self) -> None:
        if not self.data_dir.exists():
            logger.info("Downloading %s dataset into %s", self.dataset_name, self.data_dir)
            self.data_dir.mkdir(parents=True, exist_ok=True)
            self.download_data()

    @abstractmethod
    def download_data(self) -> None: ...

    @abstractmethod
    def setup(self, stage: str = "fit") -> None: ...

    @property
    @abstractmethod
    def dataset_name(self) -> str: ...

    # -- splits ----------------------------------------------------------
    def train_arrays(self) -> DiffusionArrays:
        assert self.X_train is not None, "call setup() first"
        return make_diffusion_arrays(
            self.X_train,
            self.y_train,
            fourier_transform=self.fourier_transform,
            standardize=self.standardize,
        )

    def val_arrays(self) -> DiffusionArrays:
        """Validation split standardized with *train* stats
        (reference ``val_dataloader``, ``datamodules.py:127-140``)."""
        assert self.X_test is not None, "call setup() first"
        return make_diffusion_arrays(
            self.X_test,
            self.y_test,
            fourier_transform=self.fourier_transform,
            standardize=self.standardize,
            X_ref=self.X_train,
        )

    def test_arrays(self) -> DiffusionArrays:
        assert self.X_test is not None, "call setup() first"
        return make_diffusion_arrays(
            self.X_test,
            self.y_test,
            fourier_transform=self.fourier_transform,
            standardize=False,
        )

    @property
    def steps_per_epoch(self) -> int:
        assert self.X_train is not None
        return -(-self.X_train.shape[0] // self.batch_size)  # ceil, like len(DataLoader)

    @property
    def dataset_parameters(self) -> dict:
        """Shape params injected into the score model
        (reference ``datamodules.py:145-151``)."""
        assert self.X_train is not None
        # Note: the reference's key of the same name also holds
        # steps-per-epoch at this point (``datamodules.py:145-151``);
        # its trainer later multiplies by max_epochs. We expose the
        # honest name; the trainer computes the schedule length itself.
        return {
            "n_channels": int(self.X_train.shape[2]),
            "max_len": int(self.X_train.shape[1]),
            "steps_per_epoch": self.steps_per_epoch,
        }

    @property
    def feature_mean_and_std(self) -> tuple[Array, Array]:
        split = self.train_arrays()
        return split.feature_mean, split.feature_std


def _kaggle_download(dataset: str, path: Path) -> None:
    try:
        import kaggle  # type: ignore
    except ImportError as e:  # pragma: no cover - no kaggle in CI image
        raise RuntimeError(
            f"Dataset requires the kaggle API to download {dataset!r}. "
            f"Install/authenticate kaggle, or place the raw files in {path} manually."
        ) from e
    kaggle.api.authenticate()
    kaggle.api.dataset_download_files(dataset, path=str(path), unzip=True)


class ECGDatamodule(Datamodule):
    """MIT-BIH heartbeat CSVs (kaggle ``shayanfazeli/heartbeat``):
    187-step univariate series + label column
    (reference ``datamodules.py:164-241``)."""

    def __init__(
        self,
        data_dir: Path | str = Path.cwd() / "data",
        random_seed: int = 42,
        batch_size: int = 32,
        fourier_transform: bool = False,
        standardize: bool = False,
        subsample_localization: bool = False,
        smooth_frequency: bool = False,
        smoother_width: float = 0.0,
    ) -> None:
        super().__init__(data_dir, random_seed, batch_size, fourier_transform, standardize)
        self.subsample_localization = subsample_localization
        self.smooth_frequency = smooth_frequency
        self.smoother_width = smoother_width

    def setup(self, stage: str = "fit") -> None:
        import pandas as pd

        df_train = pd.read_csv(self.data_dir / "mitbih_train.csv")
        df_test = pd.read_csv(self.data_dir / "mitbih_test.csv")
        X_train = df_train.iloc[:, :187].to_numpy(np.float32)
        y_train = df_train.iloc[:, 187].to_numpy(np.int64)
        X_test = df_test.iloc[:, :187].to_numpy(np.float32)
        y_test = df_test.iloc[:, 187].to_numpy(np.int64)

        self.X_train = jnp.asarray(X_train)[:, :, None]
        self.y_train = jnp.asarray(y_train)
        self.X_test = jnp.asarray(X_test)[:, :, None]
        self.y_test = jnp.asarray(y_test)

        if self.subsample_localization:
            # Keep the 1000 most time-localized series (datamodules.py:207-218).
            x_loc, x_spec_loc = localization_metrics(self.X_train)
            loc_score = x_loc / x_spec_loc
            idx = jnp.argsort(loc_score)[:1000]
            self.X_train = self.X_train[idx]
            self.y_train = self.y_train[idx]
            x_loc, x_spec_loc = localization_metrics(self.X_train)
            logger.info("Subsampled by localization: time deloc %.3g, freq deloc %.3g",
                        float(x_loc.mean()), float(x_spec_loc.mean()))

        if self.smooth_frequency and self.smoother_width > 0.0:
            self.X_train = smooth_frequency(self.X_train, sigma=self.smoother_width)
            self.X_test = smooth_frequency(self.X_test, sigma=self.smoother_width)
            logger.info("Smoothed the frequency domain (sigma=%s)", self.smoother_width)

    def download_data(self) -> None:
        _kaggle_download("shayanfazeli/heartbeat", self.data_dir)

    @property
    def dataset_name(self) -> str:
        return "ecg"


class SyntheticDatamodule(Datamodule):
    """Synthetic generators, cached as CSV for cross-process
    reproducibility. ``family`` selects the DGP:

    * ``sine`` — sin(t*f + phi), f ~ Beta(2, 2), phi ~ N(0, 1): the
      reference's own DGP (``datamodules.py:244-304``);
    * ``multisine`` — sum of three random sines with random amplitudes
      (richer spectrum, still frequency-sparse);
    * ``ar2`` — a stationary AR(2) process with random per-series
      oscillation frequency (broadband spectrum, the opposite regime).

    The extra families are additions beyond the reference: the real
    datasets need Kaggle (unreachable from this image), so they broaden
    the quality evidence across spectral regimes.
    """

    FAMILIES = ("sine", "multisine", "ar2")

    def __init__(
        self,
        data_dir: Path | str = Path.cwd() / "data",
        random_seed: int = 42,
        batch_size: int = 32,
        fourier_transform: bool = False,
        standardize: bool = False,
        max_len: int = 100,
        num_samples: int = 1000,
        family: str = "sine",
    ) -> None:
        if family not in self.FAMILIES:
            raise ValueError(f"Unknown synthetic family: {family!r}")
        # Set before super().__init__: dataset_name (and therefore the
        # cache directory) is family-dependent.
        self.family = family
        super().__init__(data_dir, random_seed, batch_size, fourier_transform, standardize)
        self.max_len = max_len
        self.num_samples = num_samples

    def setup(self, stage: str = "fit") -> None:
        X_train = np.loadtxt(self.data_dir / "train.csv", delimiter=",", dtype=np.float32)
        X_test = np.loadtxt(self.data_dir / "test.csv", delimiter=",", dtype=np.float32)
        self.X_train = jnp.asarray(X_train)[:, :, None]
        self.X_test = jnp.asarray(X_test)[:, :, None]

    def _generate(self, rng: np.random.Generator, n: int) -> np.ndarray:
        t = np.arange(self.max_len)
        if self.family == "sine":
            phase = rng.normal(size=(n, 1))
            frequency = rng.beta(a=2, b=2, size=(n, 1))
            return np.sin(t * frequency + phase)
        if self.family == "multisine":
            x = np.zeros((n, self.max_len))
            for _ in range(3):
                amp = rng.uniform(0.2, 1.0, size=(n, 1))
                phase = rng.normal(size=(n, 1))
                frequency = rng.beta(a=2, b=2, size=(n, 1))
                x += amp * np.sin(t * frequency + phase)
            return x / np.sqrt(3.0)
        # ar2: x_k = a1 x_{k-1} + a2 x_{k-2} + eps, parameterized by a
        # per-series resonance (r, theta) with poles inside the unit
        # circle so the process is stationary.
        r = rng.uniform(0.7, 0.95, size=n)
        theta = rng.uniform(0.1, np.pi / 2, size=n)
        a1, a2 = 2 * r * np.cos(theta), -(r**2)
        burn = 100
        x = np.zeros((n, self.max_len + burn))
        eps = rng.normal(size=(n, self.max_len + burn)) * 0.3
        for k in range(2, self.max_len + burn):
            x[:, k] = a1 * x[:, k - 1] + a2 * x[:, k - 2] + eps[:, k]
        return x[:, burn:]

    def download_data(self) -> None:
        rng = np.random.default_rng(self.random_seed)
        n = 2 * self.num_samples
        X = self._generate(rng, n).astype(np.float32)
        np.savetxt(self.data_dir / "train.csv", X[: self.num_samples], delimiter=",")
        np.savetxt(self.data_dir / "test.csv", X[self.num_samples :], delimiter=",")

    @property
    def dataset_name(self) -> str:
        return "synthetic" if self.family == "sine" else f"synthetic_{self.family}"


class _CachedPreprocessDatamodule(Datamodule):
    """Shared contract: run a one-shot preprocessing pipeline when the
    cached ``X_train.npy``/``X_test.npy`` are missing, then load them."""

    cache_subdir: str = ""

    def _cache_dir(self) -> Path:
        return self.data_dir / self.cache_subdir if self.cache_subdir else self.data_dir

    @abstractmethod
    def _preprocess(self) -> None: ...

    def setup(self, stage: str = "fit") -> None:
        cache = self._cache_dir()
        if not (cache / "X_train.npy").exists() or not (cache / "X_test.npy").exists():
            logger.info("Cache missing for %s; running preprocessing.", self.dataset_name)
            self._preprocess()
        self.X_train = jnp.asarray(np.load(cache / "X_train.npy"))
        self.X_test = jnp.asarray(np.load(cache / "X_test.npy"))
        self._postprocess()

    def _postprocess(self) -> None:
        pass


class MIMICIIIDatamodule(_CachedPreprocessDatamodule):
    """MIMIC-III hourly vitals/labs (restricted; user-supplied
    ``all_hourly_data.h5`` from MIMIC-Extract). Keeps the ``n_feats``
    highest-variance features (reference ``datamodules.py:307-366``)."""

    def __init__(
        self,
        data_dir: Path | str = Path.cwd() / "data",
        random_seed: int = 42,
        batch_size: int = 32,
        fourier_transform: bool = False,
        standardize: bool = False,
        n_feats: int = 40,
    ) -> None:
        super().__init__(data_dir, random_seed, batch_size, fourier_transform, standardize)
        self.n_feats = n_feats

    def _preprocess(self) -> None:
        from fourierdiffusion_tpu.data.preprocessing import mimic_preprocess

        mimic_preprocess(data_dir=self.data_dir, random_seed=self.random_seed)

    def _postprocess(self) -> None:
        # Keep features with highest variance (averaged across time).
        std = jnp.std(self.X_train, axis=0, ddof=1).mean(axis=0)
        top = jnp.argsort(-std)[: self.n_feats]
        self.X_train = self.X_train[:, :, top]
        self.X_test = self.X_test[:, :, top]

    def download_data(self) -> None:
        path = self.data_dir / "all_hourly_data.h5"
        if not path.exists():
            raise RuntimeError(
                f"MIMIC-III is restricted; place the MIMIC-Extract "
                f"'all_hourly_data.h5' at {path} (see "
                f"https://github.com/MLforHealth/MIMIC_Extract)."
            )

    @property
    def dataset_name(self) -> str:
        return "mimiciii"


class NASDAQDatamodule(_CachedPreprocessDatamodule):
    """2019 daily OHLCV for NASDAQ stocks with full 252-day coverage;
    drops the Volume feature (reference ``datamodules.py:369-422``)."""

    def _preprocess(self) -> None:
        from fourierdiffusion_tpu.data.preprocessing import nasdaq_preprocess

        nasdaq_preprocess(data_dir=self.data_dir, random_seed=self.random_seed)

    def _postprocess(self) -> None:
        assert self.X_train.shape[1:] == self.X_test.shape[1:] == (252, 6)
        self.X_train = self.X_train[:, :, :-1]
        self.X_test = self.X_test[:, :, :-1]

    def download_data(self) -> None:
        _kaggle_download("jacksoncrow/stock-market-dataset", self.data_dir)

    @property
    def dataset_name(self) -> str:
        return "nasdaq"


class NASADatamodule(_CachedPreprocessDatamodule):
    """NASA battery dataset, ``subdataset`` in {charge, discharge}.
    Charge + outlier removal: stride-2 subsample to 251 steps, keep
    features [0, 1, 3, 4] (reference ``datamodules.py:425-490``)."""

    def __init__(
        self,
        data_dir: Path | str = Path.cwd() / "data",
        random_seed: int = 42,
        batch_size: int = 32,
        fourier_transform: bool = False,
        standardize: bool = False,
        subdataset: str = "charge",
        remove_outlier_feature: bool = True,
    ) -> None:
        super().__init__(data_dir, random_seed, batch_size, fourier_transform, standardize)
        assert subdataset in ("charge", "discharge")
        self.subdataset = subdataset
        self.remove_outlier_feature = remove_outlier_feature
        self.cache_subdir = subdataset

    def _preprocess(self) -> None:
        from fourierdiffusion_tpu.data.preprocessing import nasa_preprocess

        nasa_preprocess(
            data_dir=self.data_dir,
            subdataset=self.subdataset,
            random_seed=self.random_seed,
        )

    def _postprocess(self) -> None:
        if self.remove_outlier_feature and self.subdataset == "charge":
            self.X_train = self.X_train[:, ::2, :][:, :, jnp.array([0, 1, 3, 4])]
            self.X_test = self.X_test[:, ::2, :][:, :, jnp.array([0, 1, 3, 4])]
            assert self.X_train.shape[1] == self.X_test.shape[1] == 251
            assert self.X_train.shape[2] == self.X_test.shape[2] == 4

    def download_data(self) -> None:
        _kaggle_download("patrickfleith/nasa-battery-dataset", self.data_dir)

    @property
    def dataset_name(self) -> str:
        return "nasa"


class USDroughtsDatamodule(_CachedPreprocessDatamodule):
    """365-day daily meteorological series per county; drops features
    {4, 5, 6, 7, 9} (T2M-correlated) (reference ``datamodules.py:493-550``)."""

    def _preprocess(self) -> None:
        from fourierdiffusion_tpu.data.preprocessing import droughts_preprocess

        droughts_preprocess(data_dir=self.data_dir, random_seed=self.random_seed)

    def _postprocess(self) -> None:
        keep = [i for i in range(self.X_train.shape[2]) if i not in {4, 5, 6, 7, 9}]
        keep = jnp.array(keep)
        self.X_train = self.X_train[:, :, keep]
        self.X_test = self.X_test[:, :, keep]
        assert self.X_train.shape[1] % 365 == self.X_test.shape[1] % 365 == 0

    def download_data(self) -> None:
        _kaggle_download("cdminix/us-drought-meteorological-data", self.data_dir)

    @property
    def dataset_name(self) -> str:
        return "droughts"


class DummyDatamodule(Datamodule):
    """Seeded Gaussian data for tests/CI — the only datamodule the test
    suite exercises (mirrors reference ``tests/test_datamodules.py:16-53``)."""

    def __init__(
        self,
        data_dir: Path | str = Path.cwd() / "data",
        random_seed: int = 42,
        batch_size: int = 32,
        fourier_transform: bool = False,
        standardize: bool = False,
        n_channels: int = 3,
        max_len: int = 20,
    ) -> None:
        super().__init__(data_dir, random_seed, batch_size, fourier_transform, standardize)
        self.n_channels = n_channels
        self.max_len = max_len

    def prepare_data(self) -> None:
        pass

    def download_data(self) -> None:
        pass

    def setup(self, stage: str = "fit") -> None:
        key = jax.random.PRNGKey(self.random_seed)
        k1, k2 = jax.random.split(key)
        shape = (10 * self.batch_size, self.max_len, self.n_channels)
        self.X_train = jax.random.normal(k1, shape)
        self.X_test = jax.random.normal(k2, shape)

    @property
    def dataset_name(self) -> str:
        return "dummy"


DATAMODULE_REGISTRY: dict[str, type[Datamodule]] = {
    "ecg": ECGDatamodule,
    "synthetic": SyntheticDatamodule,
    "mimiciii": MIMICIIIDatamodule,
    "nasdaq": NASDAQDatamodule,
    "nasa": NASADatamodule,
    "usdroughts": USDroughtsDatamodule,
    "dummy": DummyDatamodule,
}
