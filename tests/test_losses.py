"""DSM loss tests: shape/finiteness, weighting semantics, and an
analytic sanity check with a perfect score model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourierdiffusion_tpu.data.batch import DiffusableBatch
from fourierdiffusion_tpu.losses import sde_loss
from fourierdiffusion_tpu.schedulers import VEScheduler, VPScheduler

BATCH = 32
MAX_LEN = 20
CHANNELS = 3


def _zero_score(batch: DiffusableBatch) -> jnp.ndarray:
    return jnp.zeros_like(batch.X)


@pytest.mark.parametrize("scheduler", [VPScheduler(), VEScheduler()])
@pytest.mark.parametrize("likelihood_weighting", [False, True])
def test_loss_finite_scalar(scheduler, likelihood_weighting) -> None:
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, MAX_LEN, CHANNELS))
    batch = DiffusableBatch(X=x)
    loss = sde_loss(
        _zero_score,
        scheduler,
        batch,
        jax.random.PRNGKey(1),
        likelihood_weighting=likelihood_weighting,
    )
    assert loss.shape == ()
    assert bool(jnp.isfinite(loss))
    assert float(loss) > 0


def test_perfect_score_gives_zero_loss() -> None:
    """If the model outputs exactly -Sigma^{-1/2} z the loss vanishes.

    We fix the timesteps so std is deterministic and recover z from the
    noisy input (x=0 so x_noisy = std*z for the VE SDE whose mean is x).
    """
    scheduler = VEScheduler()
    x = jnp.zeros((BATCH, MAX_LEN, CHANNELS))
    t = jnp.full((BATCH,), 0.5)
    _, std = scheduler.marginal_prob(x, t)

    def perfect_score(batch: DiffusableBatch) -> jnp.ndarray:
        z = batch.X / std[..., None]
        return -z / std[..., None]

    loss = sde_loss(
        perfect_score,
        scheduler,
        DiffusableBatch(X=x, timesteps=t),
        jax.random.PRNGKey(2),
    )
    assert float(loss) == pytest.approx(0.0, abs=1e-10)


def test_weighting_factor_matches_reference_formula() -> None:
    """Default weighting is 1/tr(Sigma^{-1}) per sample (losses.py:92-109)."""
    scheduler = VPScheduler()
    x = jnp.zeros((4, MAX_LEN, 1))
    t = jnp.full((4,), 0.3)
    _, std = scheduler.marginal_prob(x, t)
    weighting = 1.0 / jnp.sum(1.0 / std**2, axis=1)

    # With a zero score model and x=0: loss_i = w_i * mean(target_noise^2)
    # where target_noise = z/std. Verify against a manual recomputation
    # with the same key-split as sde_loss.
    key = jax.random.PRNGKey(3)
    _, z_key = jax.random.split(key)
    z = jax.random.normal(z_key, x.shape, x.dtype)
    target = z / std[..., None]
    expected = jnp.mean(
        weighting[:, None, None] * jnp.square(target), axis=(1, 2)
    ).mean()

    loss = sde_loss(
        _zero_score, scheduler, DiffusableBatch(X=x, timesteps=t), key
    )
    np.testing.assert_allclose(float(loss), float(expected), rtol=1e-5)


def test_loss_is_jittable_and_differentiable() -> None:
    scheduler = VPScheduler(fourier_noise_scaling=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, MAX_LEN, CHANNELS))

    def loss_of_scale(scale: jnp.ndarray) -> jnp.ndarray:
        def score(batch: DiffusableBatch) -> jnp.ndarray:
            return scale * batch.X

        return sde_loss(
            score, scheduler, DiffusableBatch(X=x), jax.random.PRNGKey(1)
        )

    g = jax.jit(jax.grad(loss_of_scale))(jnp.float32(0.1))
    assert bool(jnp.isfinite(g))
