"""Divergence guard: detect-and-resample of runaway reverse chains.

Documented deviation (off by default = reference behavior; the
reference has no such guard). Mitigation for the 200-epoch knife edge
(RESULTS.md "Fused-vs-unfused e200 seed study"): ~1 % of chains from
under-trained freq-domain models integrate to |x| 10-30 on standardized
data whose true absmax is ~2; redrawing the flagged slots from a fresh
key is an unbiased draw conditioned on non-divergence.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fourierdiffusion_tpu.sampling.sampler import DiffusionSampler
from fourierdiffusion_tpu.schedulers import VPScheduler

MAX_LEN = 6
CHANNELS = 1
BATCH = 8


def _stub_sampler(draws: list[np.ndarray], **kwargs) -> DiffusionSampler:
    """Sampler whose compiled program is replaced by a scripted sequence:
    call ``i`` of the program returns ``draws[min(i, len-1)]``."""
    sampler = DiffusionSampler(
        object(),
        VPScheduler(),
        max_len=MAX_LEN,
        n_channels=CHANNELS,
        sample_batch_size=BATCH,
        **kwargs,
    )
    calls = {"n": 0}

    def fake_fn(variables, key):
        out = draws[min(calls["n"], len(draws) - 1)]
        calls["n"] += 1
        return jnp.asarray(out)

    sampler._get_fn = lambda steps, batch: fake_fn  # type: ignore[method-assign]
    sampler._calls = calls  # type: ignore[attr-defined]
    return sampler


def _batch(absmax_rows: dict[int, float]) -> np.ndarray:
    """Unit-normal-ish batch with selected rows scaled to a given absmax."""
    rng = np.random.RandomState(0)
    x = np.clip(rng.randn(BATCH, MAX_LEN, CHANNELS), -2, 2).astype(np.float32)
    for row, mag in absmax_rows.items():
        x[row] = mag * x[row] / np.abs(x[row]).max()
    return x


def test_guard_off_by_default() -> None:
    divergent = _batch({3: 20.0})
    sampler = _stub_sampler([divergent])
    out = sampler.sample(None, jax.random.PRNGKey(0), num_samples=BATCH)
    # Reference behavior: one program call, divergent chain kept.
    assert sampler._calls["n"] == 1
    assert float(jnp.abs(out).max()) > 8.0
    assert sampler.last_resample_stats == {
        "resampled_chains": 0,
        "unresolved_chains": 0,
    }


def test_guard_replaces_flagged_chains_only() -> None:
    divergent = _batch({3: 20.0, 5: 12.0})
    clean = _batch({})
    sampler = _stub_sampler([divergent, clean], divergence_threshold=8.0)
    out = np.asarray(
        sampler.sample(None, jax.random.PRNGKey(0), num_samples=BATCH)
    )
    assert sampler._calls["n"] == 2  # one batch + one retry
    assert np.abs(out).max() <= 8.0
    # Unflagged rows kept bit-exact from the first draw; flagged rows
    # spliced from the redraw.
    for row in range(BATCH):
        src = clean if row in (3, 5) else divergent
        np.testing.assert_array_equal(out[row], src[row])
    assert sampler.last_resample_stats == {
        "resampled_chains": 2,
        "unresolved_chains": 0,
    }


def test_guard_counts_unresolved_after_retries() -> None:
    divergent = _batch({1: 30.0})
    sampler = _stub_sampler(
        [divergent], divergence_threshold=8.0, max_resample_retries=2
    )
    out = np.asarray(
        sampler.sample(None, jax.random.PRNGKey(0), num_samples=BATCH)
    )
    # 1 batch call + 2 retry calls, all returning the same divergent draw.
    assert sampler._calls["n"] == 3
    assert np.abs(out[1]).max() > 8.0  # kept, never silently dropped
    assert sampler.last_resample_stats["resampled_chains"] == 2
    assert sampler.last_resample_stats["unresolved_chains"] == 1


def test_guard_end_to_end_with_real_program() -> None:
    """Threshold far below a unit Gaussian's absmax forces the guard to
    engage against the real compiled program and keep shapes/finiteness."""
    from fourierdiffusion_tpu.models import ScoreModelConfig

    cfg = ScoreModelConfig(model_type="mlp", d_model=8, num_layers=1, d_mlp=16)
    model = cfg.build(n_channels=CHANNELS, max_len=MAX_LEN)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, MAX_LEN, CHANNELS)), jnp.zeros((2,))
    )
    sampler = DiffusionSampler(
        model,
        VPScheduler(),
        max_len=MAX_LEN,
        n_channels=CHANNELS,
        sample_batch_size=BATCH,
        divergence_threshold=0.05,
        max_resample_retries=1,
    )
    out = sampler.sample(variables, jax.random.PRNGKey(1), num_samples=BATCH, num_diffusion_steps=3)
    assert out.shape == (BATCH, MAX_LEN, CHANNELS)
    assert bool(jnp.all(jnp.isfinite(out)))
    stats = sampler.last_resample_stats
    assert stats["resampled_chains"] > 0
