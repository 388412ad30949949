"""Probability-flow ODE and predictor-corrector samplers.

Capabilities beyond the reference (Euler–Maruyama only,
``sampler.py:83-104``), validated analytically: for unit-Gaussian data
under the VP SDE the perturbed marginal is N(0, I) at every t and the
true score is ``-x``. With that score:

* the probability-flow ODE drift is identically zero, so ODE sampling
  must return the prior draws exactly;
* EM and PC sampling must preserve the N(0, I) statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from fourierdiffusion_tpu.sampling.sampler import make_sample_fn
from fourierdiffusion_tpu.schedulers import VPScheduler

B, L, C, K = 64, 12, 2, 50


class _TrueScore(nn.Module):
    """Exact score of N(0, I) under the (unscaled) VP perturbation."""

    @nn.compact
    def __call__(self, x, timesteps, deterministic=True):
        return -x


def _setup(method, **kw):
    model = _TrueScore()
    scheduler = VPScheduler(fourier_noise_scaling=False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, L, C)), jnp.zeros((1,))
    )
    fn = make_sample_fn(
        model,
        scheduler,
        num_diffusion_steps=K,
        batch_size=B,
        max_len=L,
        n_channels=C,
        fused=False,
        method=method,
        **kw,
    )
    return fn, variables, scheduler


def test_ode_with_true_score_is_identity_on_prior():
    fn, variables, scheduler = _setup("ode")
    key = jax.random.PRNGKey(3)
    out = np.asarray(fn(variables, key))
    prior_key, _ = jax.random.split(key)
    prior = np.asarray(scheduler.prior_sampling(prior_key, (B, L, C)))
    np.testing.assert_allclose(out, prior, atol=1e-4, rtol=1e-4)


def test_ode_is_deterministic():
    fn, variables, _ = _setup("ode")
    a = np.asarray(fn(variables, jax.random.PRNGKey(1)))
    b = np.asarray(fn(variables, jax.random.PRNGKey(1)))
    c = np.asarray(fn(variables, jax.random.PRNGKey(2)))
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


@pytest.mark.parametrize("method,kw", [
    ("em", {}),
    ("pc", {"corrector_steps": 2, "snr": 0.16}),
])
def test_stochastic_methods_preserve_unit_gaussian(method, kw):
    fn, variables, _ = _setup(method, **kw)
    out = np.asarray(fn(variables, jax.random.PRNGKey(5)))
    assert np.isfinite(out).all()
    assert abs(out.mean()) < 0.1
    assert abs(out.std() - 1.0) < 0.15


def test_unknown_method_rejected():
    with pytest.raises(ValueError):
        _setup("heun")


class _BlowUpScore(nn.Module):
    """Pathological backbone: emits a huge constant score (the MLP
    failure mode near t=eps, RESULTS.md)."""

    @nn.compact
    def __call__(self, x, timesteps, deterministic=True):
        return jnp.full_like(x, 1e4)


def test_score_clip_guard_bounds_divergence():
    model = _BlowUpScore()
    scheduler = VPScheduler(fourier_noise_scaling=False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, L, C)), jnp.zeros((1,))
    )
    kwargs = dict(
        num_diffusion_steps=K, batch_size=8, max_len=L, n_channels=C,
        fused=False,
    )
    wild = np.asarray(
        make_sample_fn(model, scheduler, **kwargs)(variables, jax.random.PRNGKey(1))
    )
    guarded = np.asarray(
        make_sample_fn(model, scheduler, score_clip=2.0, **kwargs)(
            variables, jax.random.PRNGKey(1)
        )
    )
    # The guard clamps the score to the physical 1/std(t) scale: it
    # cannot make a pathological backbone produce good samples, but it
    # must keep the trajectory finite and orders of magnitude tamer.
    assert np.isfinite(guarded).all()
    assert np.abs(guarded).max() < np.abs(wild).max() / 10


def test_score_clip_inactive_for_true_score():
    """A generous clip must not change well-behaved sampling."""
    fn_plain, variables, _ = _setup("em")
    model = _TrueScore()
    scheduler = VPScheduler(fourier_noise_scaling=False)
    fn_clip = make_sample_fn(
        model, scheduler, num_diffusion_steps=K, batch_size=B,
        max_len=L, n_channels=C, fused=False, score_clip=100.0,
    )
    a = np.asarray(fn_plain(variables, jax.random.PRNGKey(4)))
    b = np.asarray(fn_clip(variables, jax.random.PRNGKey(4)))
    np.testing.assert_allclose(a, b, atol=1e-5)
