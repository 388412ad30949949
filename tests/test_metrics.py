"""Metric tests mirroring the reference (``tests/test_metrics.py``):
sliced W2 vs POT within 0.1, marginal W2 vs the analytic shift, plus
exact parity of our quantile W2 against ``ot.emd2_1d`` when POT is
available and against scipy-free closed forms otherwise.
"""

import numpy as np
import pytest

from fourierdiffusion_tpu.ops.wasserstein import marginal_w2, sliced_w2, w2_1d
from fourierdiffusion_tpu.sampling.metrics import (
    MarginalWasserstein,
    MetricCollection,
    SlicedWasserstein,
)

RANDOM_SEED = 42
N_SAMPLES = 1000
MAX_LEN = 2
N_CHANNELS = 1
NUM_DIRECTIONS = 500


@pytest.mark.parametrize("shift", [0.0, 0.1, 1.0])
def test_marginal_wasserstein_analytic_shift(shift: float) -> None:
    rng = np.random.default_rng(RANDOM_SEED)
    d1 = rng.random((N_SAMPLES, MAX_LEN, N_CHANNELS))
    d2 = rng.random((N_SAMPLES, MAX_LEN, N_CHANNELS)) + shift

    mw = MarginalWasserstein(
        original_samples=d1, random_seed=RANDOM_SEED, save_all_distances=True
    )
    metrics = mw(d2)
    all_d = np.array(metrics["marginal_wasserstein_all"])
    assert abs(metrics["marginal_wasserstein_mean"] - np.mean(all_d)) <= 1e-5
    assert metrics["marginal_wasserstein_mean"] <= metrics["marginal_wasserstein_max"]
    assert abs(metrics["marginal_wasserstein_mean"] - shift) <= 0.1
    assert abs(metrics["marginal_wasserstein_max"] - shift) <= 0.1


@pytest.mark.parametrize("shift", [0.0, 1.0])
def test_sliced_wasserstein_shift(shift: float) -> None:
    rng = np.random.default_rng(RANDOM_SEED)
    d1 = rng.random((N_SAMPLES, MAX_LEN, N_CHANNELS))
    d2 = rng.random((N_SAMPLES, MAX_LEN, N_CHANNELS)) + shift

    sw = SlicedWasserstein(
        original_samples=d1,
        random_seed=RANDOM_SEED,
        num_directions=NUM_DIRECTIONS,
        save_all_distances=True,
    )
    metrics = sw(d2)
    all_d = np.array(metrics["sliced_wasserstein_all"])
    assert abs(metrics["sliced_wasserstein_mean"] - np.mean(all_d)) <= 1e-5
    assert metrics["sliced_wasserstein_mean"] <= metrics["sliced_wasserstein_max"]
    # For a shift s in R^d, sliced W2 over random directions has mean
    # s * E|u . 1| <= s; at shift 0 the distance is near 0.
    if shift == 0.0:
        assert metrics["sliced_wasserstein_mean"] <= 0.1
    else:
        assert 0.3 <= metrics["sliced_wasserstein_mean"] <= shift * np.sqrt(MAX_LEN)


def test_w2_exact_equal_sizes() -> None:
    # W2 between two point sets of equal size = L2 of sorted diff.
    x = np.array([[0.0, 1.0, 2.0]])
    y = np.array([[1.0, 0.0, 5.0]])
    d = w2_1d(x, y)
    np.testing.assert_allclose(d, np.sqrt(np.mean([0.0, 0.0, 9.0])), rtol=1e-6)


def test_w2_exact_unequal_sizes() -> None:
    # n=2 vs m=1: quantile functions constant pieces; W2^2 =
    # 0.5*(x1-y)^2 + 0.5*(x2-y)^2.
    x = np.array([[0.0, 2.0]])
    y = np.array([[1.0]])
    d = w2_1d(x, y)
    np.testing.assert_allclose(d, np.sqrt(0.5 * 1 + 0.5 * 1), rtol=1e-6)


def _w2_oracle(x: np.ndarray, y: np.ndarray) -> float:
    """Brute-force exact 1-D W2: northwest-corner rule on the sorted
    samples. For 1-D costs |x-y|^2 with sorted supports the NW-corner
    plan IS the optimal transport plan (the cost is Monge), so this is
    an independent oracle for the merged-quantile-grid implementation
    (``ops/wasserstein.py``) — the in-repo stand-in for the reference's
    POT cross-check (``/root/reference/tests/test_metrics.py:26-52``,
    ``ot.emd2_1d``; POT is not installed in this image)."""
    x = np.sort(np.asarray(x, np.float64))
    y = np.sort(np.asarray(y, np.float64))
    n, m = len(x), len(y)
    wx, wy = 1.0 / n, 1.0 / m
    rx, ry = wx, wy
    i = j = 0
    cost = 0.0
    while i < n and j < m:
        w = min(rx, ry)
        cost += w * (x[i] - y[j]) ** 2
        rx -= w
        ry -= w
        if rx <= 1e-15:
            i += 1
            rx = wx
        if ry <= 1e-15:
            j += 1
            ry = wy
    return float(np.sqrt(cost))


@pytest.mark.parametrize(
    "n,m",
    [(300, 170), (7, 5), (1000, 999), (64, 64), (251, 17), (2, 1000)],
)
def test_w2_unequal_matches_bruteforce_oracle(n: int, m: int) -> None:
    rng = np.random.default_rng(n * 1000 + m)
    x = rng.normal(size=n)
    y = rng.normal(size=m) * 1.7 + 0.5
    ours = float(w2_1d(x[None], y[None])[0])
    oracle = _w2_oracle(x, y)
    np.testing.assert_allclose(ours, oracle, rtol=2e-5, atol=1e-6)


def test_w2_unequal_oracle_heavy_tails_and_ties() -> None:
    rng = np.random.default_rng(0)
    x = np.round(rng.standard_cauchy(321), 1)  # ties + heavy tails
    y = np.round(rng.standard_cauchy(123), 1)
    ours = float(w2_1d(x[None], y[None])[0])
    np.testing.assert_allclose(ours, _w2_oracle(x, y), rtol=1e-4)


def test_sliced_w2_matches_oracle_per_direction() -> None:
    # The full sliced pipeline (projection + batched quantile W2) against
    # the NW-corner oracle applied per direction, unequal sample counts.
    from fourierdiffusion_tpu.ops.wasserstein import random_directions

    rng = np.random.default_rng(RANDOM_SEED)
    d1 = rng.random((200, 6))
    d2 = rng.random((77, 6)) + 0.3
    k = 25
    ours = sliced_w2(d1, d2, num_directions=k, seed=RANDOM_SEED)
    dirs = random_directions(6, k, RANDOM_SEED)
    for q in range(k):
        oracle = _w2_oracle(d1 @ dirs[q], d2 @ dirs[q])
        np.testing.assert_allclose(ours[q], oracle, rtol=1e-4, atol=1e-5)


def test_w2_matches_pot_if_available() -> None:
    ot = pytest.importorskip("ot")
    rng = np.random.default_rng(0)
    x = rng.normal(size=300)
    y = rng.normal(size=170) + 0.5
    ours = float(w2_1d(x[None], y[None])[0])
    ref = float(np.sqrt(ot.emd2_1d(x, y)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_sliced_matches_pot_sliced_if_available() -> None:
    ot = pytest.importorskip("ot")
    rng = np.random.default_rng(RANDOM_SEED)
    d1 = rng.random((N_SAMPLES, 2))
    d2 = rng.random((N_SAMPLES, 2)) + 0.5
    pot_est = ot.sliced.sliced_wasserstein_distance(
        X_s=d2, X_t=d1, n_projections=NUM_DIRECTIONS, seed=RANDOM_SEED
    )
    ours = np.mean(sliced_w2(d1, d2, num_directions=NUM_DIRECTIONS, seed=RANDOM_SEED))
    assert abs(ours - pot_est) <= 0.1


def test_metric_collection_keys_and_sorting() -> None:
    rng = np.random.default_rng(0)
    orig = rng.normal(size=(200, 10, 2)).astype(np.float32)
    other = rng.normal(size=(100, 10, 2)).astype(np.float32)

    factories = [
        lambda o: SlicedWasserstein(o, random_seed=RANDOM_SEED, num_directions=20),
        lambda o: MarginalWasserstein(o, random_seed=RANDOM_SEED),
    ]
    coll = MetricCollection(
        factories, orig, include_baselines=True, include_spectral_density=True
    )
    results = coll(other)
    keys = list(results)
    assert keys == sorted(keys)
    for prefix in ("time_", "freq_"):
        for base in (
            "sliced_wasserstein_mean",
            "sliced_wasserstein_max",
            "marginal_wasserstein_mean",
            "marginal_wasserstein_max",
            "sliced_wasserstein_mean_self",
            "sliced_wasserstein_mean_dummy",
        ):
            assert f"{prefix}{base}" in results, f"{prefix}{base} missing"
    assert "spectral_marginal_wasserstein_mean" in results
    assert "spectral_marginal_wasserstein_all" in results


def test_standardise_normalisation():
    """Reference ``wasserstein.py:152-160``: both sides divided by the
    std of the original projection before the 1-D OT."""
    from fourierdiffusion_tpu.ops.wasserstein import marginal_w2, sliced_w2

    rng = np.random.default_rng(3)
    orig = (rng.normal(size=(100, 4)) * 5.0).astype(np.float32)
    other = rng.normal(size=(80, 4)).astype(np.float32)

    plain = marginal_w2(orig, other)
    standardised = marginal_w2(orig, other, normalisation="standardise")
    np.testing.assert_allclose(
        standardised, plain / orig.std(axis=0), rtol=1e-5
    )

    s_plain = sliced_w2(orig, other, num_directions=8, seed=0)
    s_std = sliced_w2(
        orig, other, num_directions=8, seed=0, normalisation="standardise"
    )
    assert (s_std < s_plain).all()  # orig std > 1 everywhere

    import pytest

    with pytest.raises(ValueError):
        marginal_w2(orig, other, normalisation="bogus")


def test_w2_against_bruteforce_transport_plan():
    """Independent oracle for unequal-n exact 1-D W2 (the ``ot.emd2_1d``
    semantics the reference relies on): build the full monotone optimal
    transport plan between sorted atoms with an explicit two-pointer
    loop and compare. POT itself is not installed in this image; this
    pins the same contract without it."""
    from fourierdiffusion_tpu.ops.wasserstein import w2_1d

    def brute_w2(x, y):
        x, y = np.sort(x), np.sort(y)
        n, m = len(x), len(y)
        i = j = 0
        wi, wj = 1.0 / n, 1.0 / m
        ri, rj = wi, wj
        total = 0.0
        while i < n and j < m:
            move = min(ri, rj)
            total += move * (x[i] - y[j]) ** 2
            ri -= move
            rj -= move
            if ri <= 1e-15:
                i += 1
                ri = wi
            if rj <= 1e-15:
                j += 1
                rj = wj
        return np.sqrt(total)

    rng = np.random.default_rng(11)
    for n, m in [(10, 10), (17, 5), (100, 37), (64, 128)]:
        x = rng.normal(size=n)
        y = rng.normal(loc=0.5, size=m) * 2.0
        ours = float(w2_1d(np.asarray(x, np.float32)[None], np.asarray(y, np.float32)[None])[0])
        ref = brute_w2(x, y)
        np.testing.assert_allclose(ours, ref, rtol=2e-4), (n, m)
