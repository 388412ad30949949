"""Scheduler unit tests (mirrors reference ``tests/test_schedulers.py``)
plus golden-value parity of the SDE math against closed forms.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourierdiffusion_tpu.schedulers import SDE, VEScheduler, VPScheduler, g_vector

BATCH = 8
MAX_LEN = 20
CHANNELS = 3


@pytest.mark.parametrize("max_len", [20, 21])
def test_g_vector(max_len: int) -> None:
    g_plain = g_vector(max_len, fourier_noise_scaling=False)
    np.testing.assert_allclose(g_plain, np.ones(max_len))

    g_scaled = np.asarray(g_vector(max_len, fourier_noise_scaling=True))
    assert g_scaled[0] == pytest.approx(1.0)
    if max_len % 2 == 0:
        assert g_scaled[max_len // 2] == pytest.approx(1.0)
        interior = np.delete(g_scaled, [0, max_len // 2])
    else:
        interior = g_scaled[1:]
    np.testing.assert_allclose(interior, 1 / math.sqrt(2), rtol=1e-6)


@pytest.mark.parametrize("scheduler", [VEScheduler(), VPScheduler()])
def test_forward_add_noise_shape(scheduler: SDE) -> None:
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BATCH, MAX_LEN, CHANNELS))
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    t = jax.random.uniform(jax.random.PRNGKey(2), (BATCH,))
    x_noisy = scheduler.add_noise(original_samples=x, noise=noise, timesteps=t)
    assert x_noisy.shape == x.shape


@pytest.mark.parametrize("scheduler", [VEScheduler(), VPScheduler()])
def test_backward_step_shape(scheduler: SDE) -> None:
    sample = jax.random.normal(jax.random.PRNGKey(0), (BATCH, MAX_LEN, CHANNELS))
    score = jax.random.normal(jax.random.PRNGKey(1), sample.shape)
    step_size = scheduler.step_size(1000)
    assert step_size > 0
    out = scheduler.step(
        jax.random.PRNGKey(2), score, jnp.float32(0.5), sample, step_size
    )
    assert out.prev_sample.shape == sample.shape


def test_timesteps_grid() -> None:
    sched = VPScheduler()
    ts = np.asarray(sched.timesteps(1000))
    assert ts.shape == (1000,)
    assert ts[0] == pytest.approx(1.0)
    assert ts[-1] == pytest.approx(1e-5)
    np.testing.assert_allclose(
        ts[0] - ts[1], sched.step_size(1000), rtol=1e-4
    )


def test_vp_marginal_prob_closed_form() -> None:
    sched = VPScheduler(beta_min=0.1, beta_max=20.0)
    x = jnp.ones((2, MAX_LEN, 1))
    t = jnp.array([0.25, 0.75])
    mean, std = sched.marginal_prob(x, t)
    lmc = -0.25 * t**2 * (20.0 - 0.1) - 0.5 * t * 0.1
    np.testing.assert_allclose(
        np.asarray(mean)[:, 0, 0], np.exp(np.asarray(lmc)), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(std)[:, 0], np.sqrt(1 - np.exp(2 * np.asarray(lmc))), rtol=1e-5
    )
    assert std.shape == (2, MAX_LEN)


def test_ve_marginal_prob_closed_form() -> None:
    sched = VEScheduler(sigma_min=0.01, sigma_max=2.0)
    x = jnp.ones((2, MAX_LEN, 1))
    t = jnp.array([0.0, 1.0])
    mean, std = sched.marginal_prob(x, t)
    np.testing.assert_allclose(mean, x)
    np.testing.assert_allclose(np.asarray(std)[0, 0], 0.01, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(std)[1, 0], 2.0, rtol=1e-5)


@pytest.mark.parametrize("max_len", [20, 21])
def test_prior_sampling_variance(max_len: int) -> None:
    # With Fourier scaling, prior variance is 1/2 except DC (and Nyquist).
    sched = VPScheduler(fourier_noise_scaling=True)
    x = sched.prior_sampling(jax.random.PRNGKey(0), (8192, max_len, 2))
    var = np.var(np.asarray(x), axis=(0, 2))
    assert var[0] == pytest.approx(1.0, abs=0.05)
    assert var[1] == pytest.approx(0.5, abs=0.05)
    if max_len % 2 == 0:
        assert var[max_len // 2] == pytest.approx(1.0, abs=0.05)


def test_vp_step_deterministic_part() -> None:
    """With zero noise the Euler–Maruyama update matches the closed form."""
    sched = VPScheduler(beta_min=0.1, beta_max=20.0)
    sample = jnp.full((1, 4, 1), 2.0)
    score = jnp.full((1, 4, 1), -1.0)
    t = jnp.float32(0.5)
    dt = 0.1
    out = sched.step(jax.random.PRNGKey(0), score, t, sample, dt)
    beta = 0.1 + 0.5 * (20.0 - 0.1)
    drift = -0.5 * beta * 2.0 - beta * (-1.0)
    z = jax.random.normal(jax.random.PRNGKey(0), sample.shape)
    expected = 2.0 - drift * dt + math.sqrt(dt) * math.sqrt(beta) * np.asarray(z)
    np.testing.assert_allclose(out.prev_sample, expected, rtol=1e-5)
