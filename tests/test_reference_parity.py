"""Golden-parity tests against the ACTUAL reference code.

The reference at ``/root/reference`` is importable for its math layers
(torch + einops are installed; ``fdiff.utils.fourier``,
``fdiff.schedulers.sde``, ``fdiff.utils.losses`` need no Lightning).
Every test here runs the same inputs through the reference torch code
and our jnp code and asserts agreement — a transcription error on either
side fails loudly, unlike reimplementation-based tests.

RNG-dependent reference paths (``prior_sampling``, ``step``, the DSM
loss) draw noise internally via ``torch.randn*``; we monkeypatch both
``torch.randn_like``/``torch.randn`` and ``jax.random.normal`` to return
one shared noise tensor so the comparison is exact.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE_SRC = Path("/root/reference/src")
if not REFERENCE_SRC.exists():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)
if str(REFERENCE_SRC) not in sys.path:
    sys.path.insert(0, str(REFERENCE_SRC))

import torch  # noqa: E402

from fdiff.schedulers.sde import (  # noqa: E402  (reference code)
    VEScheduler as RefVE,
    VPScheduler as RefVP,
)
from fdiff.utils import fourier as ref_fourier  # noqa: E402
from fdiff.utils.dataclasses import DiffusableBatch as RefBatch  # noqa: E402
from fdiff.utils.losses import get_sde_loss_fn  # noqa: E402

from fourierdiffusion_tpu.data.batch import DiffusableBatch  # noqa: E402
from fourierdiffusion_tpu.losses import sde_loss  # noqa: E402
from fourierdiffusion_tpu.ops import fourier as our_fourier  # noqa: E402
from fourierdiffusion_tpu.schedulers import VEScheduler, VPScheduler  # noqa: E402
from fourierdiffusion_tpu.schedulers.sde import g_vector  # noqa: E402

LENGTHS = [7, 8, 23, 24]


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


def _close(ours, theirs, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(
        np.asarray(ours), theirs.detach().numpy(), atol=atol, rtol=rtol
    )


# ---------------------------------------------------------------------------
# L0: fourier ops (reference fourier.py:8-209)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("max_len", LENGTHS)
@pytest.mark.parametrize("n_channels", [1, 3])
def test_dft_idft_parity(max_len, n_channels):
    x = _rand((4, max_len, n_channels))
    _close(our_fourier.dft(jnp.asarray(x)), ref_fourier.dft(torch.from_numpy(x)))
    xf = _rand((4, max_len, n_channels), seed=1)
    _close(our_fourier.idft(jnp.asarray(xf)), ref_fourier.idft(torch.from_numpy(xf)))


@pytest.mark.parametrize("max_len", LENGTHS)
@pytest.mark.parametrize("apply_dft", [True, False])
def test_spectral_density_parity(max_len, apply_dft):
    x = _rand((4, max_len, 2))
    _close(
        our_fourier.spectral_density(jnp.asarray(x), apply_dft=apply_dft),
        ref_fourier.spectral_density(torch.from_numpy(x), apply_dft=apply_dft),
    )


@pytest.mark.parametrize("max_len", LENGTHS)
def test_localization_metrics_parity(max_len):
    x = _rand((5, max_len, 2))
    ours_t, ours_f = our_fourier.localization_metrics(jnp.asarray(x))
    ref_t, ref_f = ref_fourier.localization_metrics(torch.from_numpy(x))
    _close(ours_t, ref_t, atol=1e-4)
    _close(ours_f, ref_f, atol=1e-4)


@pytest.mark.parametrize("max_len", [7, 23, 187])
def test_smooth_frequency_parity_odd(max_len):
    x = _rand((3, max_len, 1))
    _close(
        our_fourier.smooth_frequency(jnp.asarray(x), sigma=2.0),
        ref_fourier.smooth_frequency(torch.from_numpy(x), sigma=2.0),
        atol=1e-4,
    )


def test_smooth_frequency_even_reference_bug():
    """Documented deviation: the reference's frequency-index vector has
    length N-1 for even N (``fourier.py:190-197``), so it crashes; ours
    handles even lengths (the Nyquist row is its own mirror)."""
    x = _rand((2, 8, 1))
    with pytest.raises(Exception):
        ref_fourier.smooth_frequency(torch.from_numpy(x), sigma=2.0)
    out = our_fourier.smooth_frequency(jnp.asarray(x), sigma=2.0)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# L1: SDE schedulers (reference sde.py:13-246)
# ---------------------------------------------------------------------------


def _pairs(fourier_scaling):
    return [
        (VPScheduler(fourier_noise_scaling=fourier_scaling),
         RefVP(fourier_noise_scaling=fourier_scaling)),
        (VEScheduler(fourier_noise_scaling=fourier_scaling),
         RefVE(fourier_noise_scaling=fourier_scaling)),
    ]


@pytest.mark.parametrize("max_len", LENGTHS)
@pytest.mark.parametrize("fourier_scaling", [False, True])
def test_g_vector_parity(max_len, fourier_scaling):
    ref = RefVP(fourier_noise_scaling=fourier_scaling)
    ref.set_noise_scaling(max_len)
    _close(g_vector(max_len, fourier_scaling), ref.G)


@pytest.mark.parametrize("fourier_scaling", [False, True])
@pytest.mark.parametrize("max_len", [7, 24])
def test_marginal_prob_parity(fourier_scaling, max_len):
    x = _rand((6, max_len, 2))
    t = np.linspace(1e-5, 1.0, 6).astype(np.float32)
    for ours, ref in _pairs(fourier_scaling):
        mean_o, std_o = ours.marginal_prob(jnp.asarray(x), jnp.asarray(t))
        mean_r, std_r = ref.marginal_prob(torch.from_numpy(x), torch.from_numpy(t))
        _close(mean_o, mean_r)
        _close(std_o, std_r)


def test_timesteps_and_step_size_parity():
    ours = VPScheduler()
    ref = RefVP()
    ref.set_timesteps(1000)
    _close(ours.timesteps(1000), ref.timesteps)
    assert ours.step_size(1000) == pytest.approx(float(ref.step_size), rel=1e-5)


@pytest.mark.parametrize("fourier_scaling", [False, True])
@pytest.mark.parametrize("max_len", [7, 24])
def test_prior_sampling_parity(fourier_scaling, max_len, monkeypatch):
    shape = (5, max_len, 3)
    z = _rand(shape, seed=7)
    monkeypatch.setattr(torch, "randn", lambda *s, **kw: torch.from_numpy(z))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shp, dtype=jnp.float32: jnp.asarray(z).astype(dtype),
    )
    for ours, ref in _pairs(fourier_scaling):
        ref.set_noise_scaling(max_len)
        _close(ours.prior_sampling(jax.random.PRNGKey(0), shape), ref.prior_sampling(shape))


@pytest.mark.parametrize("fourier_scaling", [False, True])
@pytest.mark.parametrize("max_len", [7, 24])
def test_reverse_step_parity(fourier_scaling, max_len, monkeypatch):
    shape = (4, max_len, 2)
    sample = _rand(shape, seed=1)
    score = _rand(shape, seed=2) * 0.1
    z = _rand(shape, seed=3)
    monkeypatch.setattr(
        torch, "randn_like", lambda t_, **kw: torch.from_numpy(z)
    )
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shp, dtype=jnp.float32: jnp.asarray(z).astype(dtype),
    )
    num_steps = 100
    t = 0.37
    for ours, ref in _pairs(fourier_scaling):
        ref.set_noise_scaling(max_len)
        ref.set_timesteps(num_steps)
        out_ref = ref.step(
            torch.from_numpy(score), t, torch.from_numpy(sample)
        ).prev_sample
        out_ours = ours.step(
            jax.random.PRNGKey(0),
            jnp.asarray(score),
            jnp.asarray(t, jnp.float32),
            jnp.asarray(sample),
            ours.step_size(num_steps),
        ).prev_sample
        # The reference's step_size is computed in fp32 (timesteps[0]-[1]);
        # ours in python floats — agree to fp32 precision.
        _close(out_ours, out_ref, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# L2: DSM loss (reference losses.py:12-127)
# ---------------------------------------------------------------------------


class _RefLinearScore(torch.nn.Module):
    """Deterministic stand-in score model: score = -0.5 * X * t."""

    def forward(self, batch):
        return -0.5 * batch.X * batch.timesteps.view(-1, 1, 1)


@pytest.mark.parametrize("fourier_scaling", [False, True])
@pytest.mark.parametrize("likelihood_weighting", [False, True])
@pytest.mark.parametrize("reduce_mean", [True, False])
def test_dsm_loss_parity(
    fourier_scaling, likelihood_weighting, reduce_mean, monkeypatch
):
    max_len = 24
    x = _rand((6, max_len, 2))
    t = np.linspace(0.05, 0.95, 6).astype(np.float32)
    z = _rand(x.shape, seed=11)

    monkeypatch.setattr(
        torch, "randn_like", lambda t_, **kw: torch.from_numpy(z)
    )
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shp, dtype=jnp.float32: jnp.asarray(z).astype(dtype),
    )

    for ours, ref in _pairs(fourier_scaling):
        ref_loss_fn = get_sde_loss_fn(
            ref, train=False, reduce_mean=reduce_mean,
            likelihood_weighting=likelihood_weighting,
        )
        ref_loss = ref_loss_fn(
            _RefLinearScore(),
            RefBatch(X=torch.from_numpy(x), timesteps=torch.from_numpy(t)),
        )

        def score_fn(batch: DiffusableBatch):
            return -0.5 * batch.X * batch.timesteps[:, None, None]

        our_loss = sde_loss(
            score_fn,
            ours,
            DiffusableBatch(X=jnp.asarray(x), timesteps=jnp.asarray(t)),
            jax.random.PRNGKey(0),
            reduce_mean=reduce_mean,
            likelihood_weighting=likelihood_weighting,
        )
        np.testing.assert_allclose(
            float(our_loss), float(ref_loss), rtol=2e-5, atol=1e-6
        )
