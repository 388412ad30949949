"""Sampler tests: shape smoke (reference ``tests/test_sampling.py``),
fused-scan parity against a slow Python-loop implementation, and
sharded multi-device sampling on the virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourierdiffusion_tpu.models import ScoreModelConfig
from fourierdiffusion_tpu.sampling.sampler import DiffusionSampler, make_sample_fn
from fourierdiffusion_tpu.schedulers import VEScheduler, VPScheduler

MAX_LEN = 20
CHANNELS = 3
NUM_SAMPLES = 48
BATCH = 50
K = 10


def _model_and_vars():
    cfg = ScoreModelConfig(model_type="mlp", d_model=16, num_layers=1, d_mlp=32)
    model = cfg.build(n_channels=CHANNELS, max_len=MAX_LEN)
    x = jnp.zeros((2, MAX_LEN, CHANNELS))
    t = jnp.zeros((2,))
    variables = model.init(jax.random.PRNGKey(0), x, t)
    return model, variables


@pytest.mark.parametrize("scheduler", [VEScheduler(), VPScheduler()])
def test_sample_shape(scheduler) -> None:
    model, variables = _model_and_vars()
    sampler = DiffusionSampler(
        model, scheduler, max_len=MAX_LEN, n_channels=CHANNELS, sample_batch_size=BATCH
    )
    samples = sampler.sample(
        variables, jax.random.PRNGKey(1), num_samples=NUM_SAMPLES, num_diffusion_steps=K
    )
    assert samples.shape == (NUM_SAMPLES, MAX_LEN, CHANNELS)
    assert bool(jnp.all(jnp.isfinite(samples)))


def test_fused_scan_matches_python_loop() -> None:
    """The one-program scan equals a step-by-step host-driven loop with
    the same key schedule (SURVEY.md §7 build step 5)."""
    scheduler = VPScheduler(fourier_noise_scaling=False)
    model, variables = _model_and_vars()
    batch = 8
    fn = make_sample_fn(
        model,
        scheduler,
        num_diffusion_steps=K,
        batch_size=batch,
        max_len=MAX_LEN,
        n_channels=CHANNELS,
    )
    key = jax.random.PRNGKey(7)
    fused = fn(variables, key)

    # Slow reference: replicate the exact key schedule on the host.
    prior_key, scan_key = jax.random.split(key)
    x = scheduler.prior_sampling(prior_key, (batch, MAX_LEN, CHANNELS))
    ts = scheduler.timesteps(K)
    dt = scheduler.step_size(K)
    step_keys = jax.random.split(scan_key, K)
    for i in range(K):
        t_vec = jnp.full((batch,), ts[i])
        score = model.apply(variables, x, t_vec, deterministic=True)
        x = scheduler.step(step_keys[i], score, ts[i], x, dt).prev_sample

    np.testing.assert_allclose(np.asarray(fused), np.asarray(x), atol=1e-3)


def test_exact_sample_count_not_truncated() -> None:
    """Conscious fix of the reference's truncation quirk
    (``sampler.py:63``): 130 samples at batch 50 -> exactly 130."""
    model, variables = _model_and_vars()
    sampler = DiffusionSampler(
        model, VPScheduler(), max_len=MAX_LEN, n_channels=CHANNELS,
        sample_batch_size=50,
    )
    out = sampler.sample(variables, jax.random.PRNGKey(0), 130, num_diffusion_steps=5)
    assert out.shape[0] == 130


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_sharded_sampling_on_mesh() -> None:
    from jax.sharding import Mesh

    devices = np.array(jax.devices())
    mesh = Mesh(devices, axis_names=("data",))
    model, variables = _model_and_vars()
    sampler = DiffusionSampler(
        model, VPScheduler(fourier_noise_scaling=False),
        max_len=MAX_LEN, n_channels=CHANNELS,
        sample_batch_size=len(devices) * 4, mesh=mesh,
    )
    out = sampler.sample(
        variables, jax.random.PRNGKey(0), len(devices) * 4, num_diffusion_steps=5
    )
    assert out.shape == (len(devices) * 4, MAX_LEN, CHANNELS)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_sampler_caches_compiled_program() -> None:
    """Compile-count regression (SURVEY.md §4): repeated sampling with the
    same (steps, batch) reuses one fused program; a new config adds one."""
    model, variables = _model_and_vars()
    sampler = DiffusionSampler(
        model, VPScheduler(), max_len=MAX_LEN, n_channels=CHANNELS,
        sample_batch_size=16,
    )
    sampler.sample(variables, jax.random.PRNGKey(0), 16, num_diffusion_steps=4)
    sampler.sample(variables, jax.random.PRNGKey(1), 16, num_diffusion_steps=4)
    assert len(sampler._fn_cache) == 1
    sampler.sample(variables, jax.random.PRNGKey(2), 16, num_diffusion_steps=6)
    assert len(sampler._fn_cache) == 2
