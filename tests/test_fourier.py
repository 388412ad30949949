"""Round-trip, invariant, and golden-parity tests for the Fourier ops.

Covers the reference test categories in ``tests/test_utils.py:36-51``
(idft∘dft and dft∘idft identities for even & odd lengths) plus parity of
the packed layout against a NumPy re-derivation of the reference
semantics (``src/fdiff/utils/fourier.py:8-209``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourierdiffusion_tpu.ops import (
    dft,
    idft,
    localization_metrics,
    smooth_frequency,
    spectral_density,
)

BATCH = 16
CHANNELS = 3


def _numpy_dft_reference(x: np.ndarray) -> np.ndarray:
    """Independent NumPy derivation of the packed mirror transform."""
    max_len = x.shape[1]
    f = np.fft.rfft(x, axis=1, norm="ortho")
    re = np.real(f)
    im = np.imag(f)[:, 1:]
    if max_len % 2 == 0:
        im = im[:, :-1]
    return np.concatenate((re, im), axis=1)


@pytest.mark.parametrize("max_len", [100, 101, 187, 24])
def test_dft_round_trip(max_len: int) -> None:
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BATCH, max_len, CHANNELS))
    np.testing.assert_allclose(idft(dft(x)), x, atol=1e-5)
    np.testing.assert_allclose(dft(idft(x)), x, atol=1e-5)


@pytest.mark.parametrize("max_len", [50, 51])
def test_dft_matches_reference_packing(max_len: int) -> None:
    rng = np.random.default_rng(7)
    x = rng.normal(size=(BATCH, max_len, CHANNELS)).astype(np.float32)
    ours = np.asarray(dft(jnp.asarray(x)))
    ref = _numpy_dft_reference(x)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_dft_energy_identity() -> None:
    """Parseval for the packed layout: interior frequencies carry half
    the energy (their conjugate mirror is dropped), DC and Nyquist carry
    full energy — the identity the Fourier noise scaling G compensates.
    """
    max_len = 64
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, max_len, CHANNELS))
    xf = np.asarray(dft(x))
    n_real = (max_len + 2) // 2  # even length
    dc = xf[:, 0, :]
    nyq = xf[:, n_real - 1, :]
    interior = np.concatenate([xf[:, 1 : n_real - 1, :], xf[:, n_real:, :]], axis=1)
    energy = (
        np.sum(dc**2, axis=-1)
        + np.sum(nyq**2, axis=-1)
        + 2 * np.sum(interior**2, axis=(1, 2))
    )
    np.testing.assert_allclose(energy, np.sum(np.asarray(x) ** 2, axis=(1, 2)), rtol=1e-4)


@pytest.mark.parametrize("max_len", [40, 41])
def test_spectral_density(max_len: int) -> None:
    x = jax.random.normal(jax.random.PRNGKey(2), (BATCH, max_len, CHANNELS))
    dens = spectral_density(x)
    n_freq = (max_len + 2) // 2 if max_len % 2 == 0 else (max_len + 1) // 2
    assert dens.shape == (BATCH, n_freq, CHANNELS)
    assert bool(jnp.all(dens >= 0))
    # Parseval: total power equals total energy for an orthonormal DFT,
    # counting the mirrored (conjugate) frequencies once more.
    full = np.fft.fft(np.asarray(x), axis=1, norm="ortho")
    power_full = np.sum(np.abs(full) ** 2, axis=(1, 2))
    if max_len % 2 == 0:
        mirrored = np.asarray(dens)[:, 1:-1, :]
    else:
        mirrored = np.asarray(dens)[:, 1:, :]
    power_packed = np.sum(np.asarray(dens), axis=(1, 2)) + np.sum(
        mirrored, axis=(1, 2)
    )
    np.testing.assert_allclose(power_packed, power_full, rtol=1e-4)


def test_localization_metrics_shapes_and_ordering() -> None:
    max_len = 50
    t = jnp.arange(max_len, dtype=jnp.float32)
    # A delta-like series is time-localized; a constant is delocalized.
    delta = jnp.zeros((1, max_len, 1)).at[0, max_len // 2, 0].set(1.0)
    spread = jnp.ones((1, max_len, 1))
    x = jnp.concatenate([delta, spread], axis=0)
    x_loc, x_spec_loc = localization_metrics(x)
    assert x_loc.shape == (2,) and x_spec_loc.shape == (2,)
    assert float(x_loc[0]) < float(x_loc[1])
    # Constant series = pure DC = frequency-localized.
    assert float(x_spec_loc[1]) < float(x_spec_loc[0])
    del t


@pytest.mark.parametrize("max_len", [50, 51])
def test_smooth_frequency_preserves_shape_and_smooths(max_len: int) -> None:
    x = jax.random.normal(jax.random.PRNGKey(3), (BATCH, max_len, CHANNELS))
    out = smooth_frequency(x, sigma=2.0)
    assert out.shape == x.shape
    # Smoothing concentrates spectral mass at low frequencies relative
    # to white noise: high-frequency power must drop.
    dens_in = spectral_density(x)
    dens_out = spectral_density(out)
    hi = dens_in.shape[1] // 2
    assert float(jnp.sum(dens_out[:, hi:, :])) < float(jnp.sum(dens_in[:, hi:, :]))
