"""Continuous SDE noise schedulers (VP / VE), TPU-native.

Feature parity with the reference ``src/fdiff/schedulers/sde.py:13-246``
(classes ``SDE``/``VEScheduler``/``VPScheduler``), re-designed for XLA:

* Schedulers are frozen, hashable dataclasses of Python scalars — they
  are *static* under ``jax.jit`` so every method traces to pure jnp.
* The diagonal noise-scaling matrix ``G`` is never materialized as a
  matrix: the reference's ``torch.diag`` / ``diag_embed`` matmuls
  (``sde.py:59,149,230``) become broadcast multiplies by the
  ``(max_len,)`` vector ``g_vector``.
* ``step`` takes an explicit PRNG key and a static ``step_size`` so the
  full reverse loop compiles into one ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.typing import DTypeLike


class SamplingOutput(NamedTuple):
    prev_sample: Array


def g_vector(max_len: int, fourier_noise_scaling: bool, dtype: DTypeLike = jnp.float32) -> Array:
    """Diagonal of the noise-scaling matrix G.

    All-ones, or — with Fourier noise scaling — ``1/sqrt(2)`` with the DC
    component (and the Nyquist component for even ``max_len``) kept at 1,
    so the time-domain covariance of ``G z`` is white
    (reference: ``sde.py:42-60``).
    """
    if not fourier_noise_scaling:
        return jnp.ones((max_len,), dtype=dtype)
    g = jnp.full((max_len,), 1.0 / math.sqrt(2.0), dtype=dtype)
    g = g.at[0].set(1.0)
    if max_len % 2 == 0:
        g = g.at[max_len // 2].set(1.0)
    return g


@dataclasses.dataclass(frozen=True)
class SDE:
    """Base continuous SDE over ``t in [eps, T=1]``.

    Subclasses implement ``marginal_prob`` (forward perturbation kernel
    parameters) and ``step`` (one reverse Euler–Maruyama step).
    """

    fourier_noise_scaling: bool = False
    eps: float = 1e-5

    @property
    def T(self) -> float:
        return 1.0

    # -- schedule -----------------------------------------------------
    def timesteps(self, num_diffusion_steps: int, dtype: DTypeLike = jnp.float32) -> Array:
        """Descending time grid ``linspace(T, eps, K)`` (``sde.py:62-64``)."""
        return jnp.linspace(self.T, self.eps, num_diffusion_steps, dtype=dtype)

    def step_size(self, num_diffusion_steps: int) -> float:
        """Uniform reverse-step size (``sde.py:64``)."""
        return (self.T - self.eps) / (num_diffusion_steps - 1)

    def g(self, max_len: int, dtype: DTypeLike = jnp.float32) -> Array:
        return g_vector(max_len, self.fourier_noise_scaling, dtype)

    # -- forward ------------------------------------------------------
    def marginal_prob(self, x: Array, t: Array) -> tuple[Array, Array]:
        """Mean/std of the perturbation kernel ``p(x(t) | x(0))``.

        Args:
            x: ``(B, max_len, n_channels)``.
            t: ``(B,)`` diffusion times.

        Returns:
            ``mean`` of shape ``(B, max_len, n_channels)`` and ``std`` of
            shape ``(B, max_len)`` (the per-frequency diagonal).
        """
        raise NotImplementedError

    def add_noise(self, original_samples: Array, noise: Array, timesteps: Array) -> Array:
        """Perturb ``x0`` with *pre-scaled* noise (``sde.py:66-77``)."""
        mean, _ = self.marginal_prob(original_samples, timesteps)
        return mean + noise

    def prior_sampling(self, key: Array, shape: tuple[int, ...], dtype: DTypeLike = jnp.float32) -> Array:
        """Sample ``G z`` with ``z ~ N(0, I)`` (``sde.py:79-87``)."""
        z = jax.random.normal(key, shape, dtype)
        g = self.g(shape[-2], dtype)
        return g[:, None] * z

    # -- reverse ------------------------------------------------------
    def step(
        self,
        key: Array,
        model_output: Array,
        timestep: Array,
        sample: Array,
        step_size: Array | float,
    ) -> SamplingOutput:
        """One reverse Euler–Maruyama step."""
        raise NotImplementedError

    def reverse_drift_sde(
        self, model_output: Array, timestep: Array, sample: Array
    ) -> Array:
        """Reverse-SDE drift ``f(x,t) - G G^T score`` (per unit time)."""
        raise NotImplementedError

    def reverse_drift_ode(
        self, model_output: Array, timestep: Array, sample: Array
    ) -> Array:
        """Probability-flow ODE drift ``f(x,t) - 1/2 G G^T score``.

        The deterministic flow with the same marginals as the SDE (Song
        et al. 2021, eq. 13). Not present in the reference — a sampler
        capability this framework adds.
        """
        raise NotImplementedError

    def ode_step(
        self, model_output: Array, timestep: Array, sample: Array,
        step_size: Array | float,
    ) -> SamplingOutput:
        """One reverse Euler step of the probability-flow ODE."""
        drift = self.reverse_drift_ode(model_output, timestep, sample)
        return SamplingOutput(prev_sample=sample - drift * step_size)

    def corrector_alpha(self, timestep: Array, step_size: Array | float) -> Array:
        """Step-scale for the Langevin corrector (1 for VE; the
        discretized ``1 - beta dt`` for VP, per Song et al.'s PC
        sampler)."""
        return jnp.ones((), jnp.float32)


@dataclasses.dataclass(frozen=True)
class VEScheduler(SDE):
    """Variance-exploding SDE (reference: ``sde.py:90-165``)."""

    sigma_min: float = 0.01
    sigma_max: float = 50.0

    def marginal_prob(self, x: Array, t: Array) -> tuple[Array, Array]:
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        g = self.g(x.shape[-2], x.dtype)
        std = sigma[:, None] * g[None, :]
        return x, std

    def prior_sampling(self, key: Array, shape: tuple[int, ...], dtype: DTypeLike = jnp.float32) -> Array:
        return self.sigma_max * super().prior_sampling(key, shape, dtype)

    def _diffusion_vec(self, timestep: Array, max_len: int, dtype) -> Array:
        # d(sigma^2)/dt expressed through the log-derivative of sigma(t).
        sqrt_derivative = (
            self.sigma_min
            * math.sqrt(2.0 * math.log(self.sigma_max / self.sigma_min))
            * (self.sigma_max / self.sigma_min) ** timestep
        )
        return sqrt_derivative * self.g(max_len, dtype)  # (max_len,) diagonal

    def reverse_drift_sde(
        self, model_output: Array, timestep: Array, sample: Array
    ) -> Array:
        # Reverse drift: f(x,t) - G G^T score, with forward drift f = 0.
        diffusion = self._diffusion_vec(timestep, sample.shape[-2], sample.dtype)
        return -(diffusion**2)[:, None] * model_output

    def reverse_drift_ode(
        self, model_output: Array, timestep: Array, sample: Array
    ) -> Array:
        diffusion = self._diffusion_vec(timestep, sample.shape[-2], sample.dtype)
        return -0.5 * (diffusion**2)[:, None] * model_output

    def step(
        self,
        key: Array,
        model_output: Array,
        timestep: Array,
        sample: Array,
        step_size: Array | float,
    ) -> SamplingOutput:
        diffusion = self._diffusion_vec(timestep, sample.shape[-2], sample.dtype)
        drift = self.reverse_drift_sde(model_output, timestep, sample)
        z = jax.random.normal(key, sample.shape, sample.dtype)
        x = (
            sample
            - drift * step_size
            + jnp.sqrt(step_size) * diffusion[:, None] * z
        )
        return SamplingOutput(prev_sample=x)


@dataclasses.dataclass(frozen=True)
class VPScheduler(SDE):
    """Variance-preserving SDE (reference: ``sde.py:168-246``); the default."""

    beta_min: float = 0.1
    beta_max: float = 20.0

    def _log_mean_coeff(self, t: Array) -> Array:
        # -1/2 * int_0^t beta(s) ds with beta(s) = beta_0 + s (beta_1 - beta_0).
        return -0.25 * t**2 * (self.beta_max - self.beta_min) - 0.5 * t * self.beta_min

    def marginal_prob(self, x: Array, t: Array) -> tuple[Array, Array]:
        lmc = self._log_mean_coeff(t)
        mean = jnp.exp(lmc)[:, None, None] * x
        g = self.g(x.shape[-2], x.dtype)
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * lmc))[:, None] * g[None, :]
        return mean, std

    def beta(self, timestep: Array) -> Array:
        return self.beta_min + timestep * (self.beta_max - self.beta_min)

    def _diffusion_vec(self, timestep: Array, max_len: int, dtype) -> Array:
        return jnp.sqrt(self.beta(timestep)) * self.g(max_len, dtype)

    def reverse_drift_sde(
        self, model_output: Array, timestep: Array, sample: Array
    ) -> Array:
        beta = self.beta(timestep)
        diffusion = self._diffusion_vec(timestep, sample.shape[-2], sample.dtype)
        return -0.5 * beta * sample - (diffusion**2)[:, None] * model_output

    def reverse_drift_ode(
        self, model_output: Array, timestep: Array, sample: Array
    ) -> Array:
        beta = self.beta(timestep)
        diffusion = self._diffusion_vec(timestep, sample.shape[-2], sample.dtype)
        return -0.5 * beta * sample - 0.5 * (diffusion**2)[:, None] * model_output

    def corrector_alpha(self, timestep: Array, step_size: Array | float) -> Array:
        return 1.0 - self.beta(timestep) * step_size

    def step(
        self,
        key: Array,
        model_output: Array,
        timestep: Array,
        sample: Array,
        step_size: Array | float,
    ) -> SamplingOutput:
        diffusion = self._diffusion_vec(timestep, sample.shape[-2], sample.dtype)
        drift = self.reverse_drift_sde(model_output, timestep, sample)
        z = jax.random.normal(key, sample.shape, sample.dtype)
        x = (
            sample
            - drift * step_size
            + jnp.sqrt(step_size) * diffusion[:, None] * z
        )
        return SamplingOutput(prev_sample=x)
