"""Fourier mirror transform and spectral utilities (TPU-native, jnp).

The mirror transform maps a real time series ``(B, L, C)`` through an
orthonormal real FFT into an *equal-sized real* representation:

    dft(x) = concat(Re(rfft(x))[0 .. n_real-1],  Im(rfft(x))[1 .. ])

where ``n_real = ceil((L + 1) / 2)`` and — when ``L`` is even — the
always-zero imaginary part at the Nyquist frequency is dropped, so the
packed representation has exactly ``L`` rows. ``idft`` re-inserts the
structural zeros and inverts with ``irfft(norm="ortho")``.

Feature parity with the reference ``src/fdiff/utils/fourier.py:8-209``
(functions ``dft``/``idft``/``spectral_density``/``localization_metrics``/
``smooth_frequency``), re-designed as pure, jit-compatible functions:
no assertions on traced values, no host synchronization, static shapes
derived from the input so XLA fuses everything into neighbouring ops.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array


def n_real_components(max_len: int) -> int:
    """Number of real (cosine) coefficients in the packed representation."""
    return math.ceil((max_len + 1) / 2)


@jax.jit
def dft(x: Array) -> Array:
    """Orthonormal real-DFT mirror transform.

    Args:
        x: Real time series of shape ``(..., max_len, n_channels)``
           (the transform runs over axis ``-2``).

    Returns:
        Packed real representation with the same shape and dtype
        ``float32`` (reference: ``fourier.py:8-45``).
    """
    max_len = x.shape[-2]
    dft_full = jnp.fft.rfft(x, axis=-2, norm="ortho")
    dft_re = jnp.real(dft_full)
    # Drop Im at DC (always zero for real input); drop Im at Nyquist when
    # max_len is even (also structurally zero).
    if max_len % 2 == 0:
        dft_im = jnp.imag(dft_full)[..., 1:-1, :]
    else:
        dft_im = jnp.imag(dft_full)[..., 1:, :]
    x_tilde = jnp.concatenate((dft_re, dft_im), axis=-2)
    return x_tilde.astype(x.dtype)


@jax.jit
def idft(x: Array) -> Array:
    """Inverse of :func:`dft` (reference: ``fourier.py:48-87``)."""
    max_len = x.shape[-2]
    n_real = n_real_components(max_len)

    x_re = x[..., :n_real, :]
    x_im = x[..., n_real:, :]

    zero = jnp.zeros_like(x[..., :1, :])
    x_im = jnp.concatenate((zero, x_im), axis=-2)
    if max_len % 2 == 0:
        x_im = jnp.concatenate((x_im, zero), axis=-2)

    x_freq = jax.lax.complex(x_re, x_im)
    x_time = jnp.fft.irfft(x_freq, n=max_len, axis=-2, norm="ortho")
    return x_time.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("apply_dft",))
def spectral_density(x: Array, apply_dft: bool = True) -> Array:
    """Per-frequency power ``Re^2 + Im^2`` from the packed representation.

    Args:
        x: ``(..., max_len, n_channels)`` series (time domain if
           ``apply_dft``, packed frequency domain otherwise).

    Returns:
        ``(..., n_freq, n_channels)`` with ``n_freq = ceil((L+1)/2)``
        (reference: ``fourier.py:90-124``).
    """
    max_len = x.shape[-2]
    if apply_dft:
        x = dft(x)
    n_real = n_real_components(max_len)
    x_re = x[..., :n_real, :]
    x_im = x[..., n_real:, :]
    zero = jnp.zeros_like(x[..., :1, :])
    x_im = jnp.concatenate((zero, x_im), axis=-2)
    if max_len % 2 == 0:
        x_im = jnp.concatenate((x_im, zero), axis=-2)
    return x_re**2 + x_im**2


def _cyclic_distance_sq(max_len: int, dtype=jnp.float32) -> Array:
    """Squared cyclic distance matrix ``min(|i-j|, L-|i-j|)^2``."""
    t = jnp.arange(max_len, dtype=dtype)
    d = jnp.abs(t[:, None] - t[None, :])
    d = jnp.minimum(d, max_len - d)
    return d**2


@jax.jit
def localization_metrics(x: Array) -> tuple[Array, Array]:
    """Time/frequency delocalization of each series.

    Energy distribution (over time, and over the full mirrored spectrum)
    contracted with the squared cyclic-distance matrix, minimized over
    shifts (reference: ``fourier.py:127-175``).

    Args:
        x: ``(B, max_len, n_channels)``.

    Returns:
        ``(time_delocalization, freq_delocalization)``, each ``(B,)``.
    """
    max_len = x.shape[-2]

    energy = jnp.sum(x**2, axis=2)
    energy = energy / jnp.sum(energy, axis=1, keepdims=True)

    spec = spectral_density(x)
    # Mirror the strictly-positive frequencies beyond Nyquist so the
    # distribution again has max_len bins.
    if max_len % 2 == 0:
        spec_mirror = jnp.flip(spec[:, 1:-1, :], axis=1)
    else:
        spec_mirror = jnp.flip(spec[:, 1:, :], axis=1)
    spec = jnp.concatenate((spec, spec_mirror), axis=1)
    spec = jnp.sum(spec, axis=2)
    spec = spec / jnp.sum(spec, axis=1, keepdims=True)

    dist_sq = _cyclic_distance_sq(max_len, dtype=x.dtype)
    x_loc = jnp.min(energy @ dist_sq, axis=1)
    x_spec_loc = jnp.min(spec @ dist_sq, axis=1)
    return x_loc, x_spec_loc


@functools.partial(jax.jit, static_argnames=("sigma",))
def smooth_frequency(x: Array, sigma: float) -> Array:
    """Convolve the packed frequency representation with a Gaussian kernel.

    Frequency indices mirror across the Nyquist frequency:
    ``k = concat(arange(0, L/2), arange(1, L/2))`` for odd ``L``
    (identical to the reference, ``fourier.py:178-209``). For even ``L``
    the reference's grid has only ``L-1`` entries and its einsum fails —
    a latent bug (it is only ever used on ECG, ``L=187``); here the grid
    is ``concat(arange(0, L/2+1), arange(1, L/2))`` so the Nyquist bin is
    addressed and even lengths work (conscious fix, SURVEY.md §7).

    Args:
        x: ``(B, max_len, n_channels)`` time series.
        sigma: Gaussian kernel width (static).

    Returns:
        Smoothed time series, same shape.
    """
    max_len = x.shape[-2]
    n_real = n_real_components(max_len)
    k = jnp.concatenate(
        (
            jnp.arange(0, n_real, dtype=jnp.float32),
            jnp.arange(1, max_len - n_real + 1, dtype=jnp.float32),
        )
    )
    diff = (k[:, None] - k[None, :]) / sigma
    kernel = jnp.exp(-(diff**2) / 2)
    kernel = kernel / jnp.sum(kernel, axis=0, keepdims=True)

    x_freq = dft(x)
    # einsum("btc,ts->bsc") — one MXU matmul over the frequency axis.
    x_freq = jnp.einsum("btc,ts->bsc", x_freq, kernel.astype(x_freq.dtype))
    return idft(x_freq)
