"""Fused reverse-diffusion sampler.

The reference drives 1000 reverse steps per batch from Python
(``sampler.py:45-109``: 50,000 model invocations + a device->host copy
per batch for the default eval run). Here the whole reverse SDE — prior
sampling, per-step RNG, score-network forward, Euler–Maruyama update —
compiles into ONE XLA program: a ``lax.scan`` over the K timesteps with
zero host round-trips; only final samples land on the host.

Chains are batched (``sample_batch_size`` bounds the FFN activation
footprint) and, when a mesh is provided, sharded across devices over the
``data`` axis so 10k chains split over ICI.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fourierdiffusion_tpu.schedulers.sde import SDE

logger = logging.getLogger(__name__)


def _supports_fused(model) -> bool:
    from fourierdiffusion_tpu.models.score_models import ScoreTransformer

    return isinstance(model, ScoreTransformer)


def make_sample_fn(
    model: Any,
    scheduler: SDE,
    *,
    num_diffusion_steps: int,
    batch_size: int,
    max_len: int,
    n_channels: int,
    mesh: Optional[Mesh] = None,
    fused: Optional[bool] = None,
    method: str = "em",
    corrector_steps: int = 1,
    snr: float = 0.16,
    score_clip: Optional[float] = None,
) -> Callable:
    """Build the jitted fused sampling program.

    Returns ``sample(variables, key) -> (batch_size, max_len, n_channels)``.

    ``fused=None`` auto-selects the fully-fused transposed-layout forward
    (``models/fused.py``) for transformer score networks on TPU — the
    per-step glue (LayerNorms, projections, layout shuffles) collapses
    into one Pallas program per (chain, layer). ``fused=True/False``
    forces the choice (tests exercise both paths on CPU interpret mode).

    ``method`` selects the reverse integrator — capabilities beyond the
    reference (which only has Euler–Maruyama, ``sampler.py:83-104``):

    * ``"em"``: ancestral Euler–Maruyama (reference semantics);
    * ``"ode"``: probability-flow ODE (deterministic; Song et al. 2021
      eq. 13) — same marginals, no sampling noise;
    * ``"pc"``: predictor-corrector — EM predictor plus
      ``corrector_steps`` of signal-to-noise-scaled Langevin MCMC at
      each time (Song et al.'s PC sampler; ``snr`` is their r).

    ``score_clip`` (documented deviation; default off = reference
    behavior) clamps the model output elementwise to ``+-score_clip /
    std(t)`` — the magnitude a true score can reach under the
    perturbation kernel. Guards against backbone blow-ups near t=eps
    (e.g. the MLP's, RESULTS.md "MLP baseline behavior").
    """
    timesteps = scheduler.timesteps(num_diffusion_steps)
    step_size = scheduler.step_size(num_diffusion_steps)
    if method not in ("em", "ode", "pc"):
        raise ValueError(f"Unknown sampling method: {method!r}")
    if fused is None:
        fused = _supports_fused(model) and jax.default_backend() == "tpu"
    if fused and not _supports_fused(model):
        raise ValueError(f"fused sampling unsupported for {type(model).__name__}")

    def sample(variables, key: Array) -> Array:
        prior_key, scan_key = jax.random.split(key)
        x = scheduler.prior_sampling(
            prior_key, (batch_size, max_len, n_channels)
        )
        if mesh is not None:
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("data"))
            )

        if fused:
            from fourierdiffusion_tpu.models.fused import (
                fused_score_forward,
                pack_score_transformer,
            )

            packed = pack_score_transformer(model, variables)

            def score_fn(x: Array, t_vec: Array) -> Array:
                return fused_score_forward(model, packed, x, t_vec)

        else:

            def score_fn(x: Array, t_vec: Array) -> Array:
                return model.apply(variables, x, t_vec, deterministic=True)

        def langevin_correct(x: Array, t: Array, t_vec: Array, key: Array) -> Array:
            """SNR-scaled Langevin MCMC at fixed t (Song et al. PC)."""
            for i in range(corrector_steps):
                grad = clip_score(score_fn(x, t_vec), t)
                z = jax.random.normal(
                    jax.random.fold_in(key, i), x.shape, x.dtype
                )
                flat = lambda a: a.reshape(a.shape[0], -1)  # noqa: E731
                # Floor guards 0/0 -> NaN for a degenerate (e.g. fresh
                # random-init) score network; a trained score never hits it.
                grad_norm = jnp.maximum(
                    jnp.mean(jnp.linalg.norm(flat(grad), axis=-1)), 1e-12
                )
                noise_norm = jnp.mean(jnp.linalg.norm(flat(z), axis=-1))
                alpha = scheduler.corrector_alpha(t, step_size)
                eps = 2.0 * alpha * (snr * noise_norm / grad_norm) ** 2
                x = x + eps * grad + jnp.sqrt(2.0 * eps) * z
            return x

        def clip_score(score: Array, t: Array) -> Array:
            if score_clip is None:
                return score
            _, std = scheduler.marginal_prob(
                jnp.zeros((1, max_len, n_channels), score.dtype),
                jnp.full((1,), t, score.dtype),
            )
            bound = score_clip / jnp.maximum(std[0], 1e-6)  # (max_len,)
            return jnp.clip(score, -bound[:, None], bound[:, None])

        def body(x: Array, inputs):
            t, step_key = inputs
            t_vec = jnp.full((batch_size,), t, x.dtype)
            score = clip_score(score_fn(x, t_vec), t)
            if method == "ode":
                x = scheduler.ode_step(score, t, x, step_size).prev_sample
            elif method == "pc":
                pred_key, corr_key = jax.random.split(step_key)
                x = scheduler.step(pred_key, score, t, x, step_size).prev_sample
                x = langevin_correct(x, t, t_vec, corr_key)
            else:
                # Reference EM semantics, unchanged RNG stream.
                x = scheduler.step(step_key, score, t, x, step_size).prev_sample
            return x, None

        step_keys = jax.random.split(scan_key, num_diffusion_steps)
        x, _ = jax.lax.scan(body, x, (timesteps, step_keys))
        return x

    if mesh is not None:
        replicated = NamedSharding(mesh, P())
        return jax.jit(sample, in_shardings=(replicated, replicated))
    return jax.jit(sample)


class DiffusionSampler:
    """Batched ancestral sampling (reference ``DiffusionSampler``,
    ``sampler.py:11-122``).

    Conscious fix of a reference quirk: the reference *truncates*
    ``num_samples`` to a multiple of the batch size
    (``sampler.py:63``); here the number of batches rounds up and the
    output is trimmed to exactly ``num_samples``.
    """

    def __init__(
        self,
        model,
        scheduler: SDE,
        *,
        max_len: int,
        n_channels: int,
        sample_batch_size: int = 200,
        mesh: Optional[Mesh] = None,
        method: str = "em",
        corrector_steps: int = 1,
        snr: float = 0.16,
        score_clip: Optional[float] = None,
        fused: Optional[bool] = None,
        divergence_threshold: Optional[float] = None,
        max_resample_retries: int = 2,
    ) -> None:
        self.model = model
        self.scheduler = scheduler
        self.max_len = max_len
        self.n_channels = n_channels
        self.sample_batch_size = sample_batch_size
        self.mesh = mesh
        self.method = method
        self.corrector_steps = corrector_steps
        self.snr = snr
        self.score_clip = score_clip
        self.fused = fused
        self.divergence_threshold = divergence_threshold
        self.max_resample_retries = max_resample_retries
        #: Per-``sample()``-call guard accounting: ``resampled_chains``
        #: counts redraw slots used (a chain retried twice counts twice),
        #: ``unresolved_chains`` counts chains still past the threshold
        #: after all retries (kept as-is, never silently dropped).
        self.last_resample_stats: dict[str, int] = {
            "resampled_chains": 0,
            "unresolved_chains": 0,
        }
        self._fn_cache: dict[tuple[int, int], object] = {}

    def _get_fn(self, num_diffusion_steps: int, batch_size: int):
        cache_key = (num_diffusion_steps, batch_size)
        if cache_key not in self._fn_cache:
            self._fn_cache[cache_key] = make_sample_fn(
                self.model,
                self.scheduler,
                num_diffusion_steps=num_diffusion_steps,
                batch_size=batch_size,
                max_len=self.max_len,
                n_channels=self.n_channels,
                mesh=self.mesh,
                method=self.method,
                corrector_steps=self.corrector_steps,
                snr=self.snr,
                score_clip=self.score_clip,
                fused=self.fused,
            )
        return self._fn_cache[cache_key]

    def sample(
        self,
        variables: Any,
        key: Array,
        num_samples: int,
        num_diffusion_steps: int = 1000,
    ) -> Array:
        """Generate ``num_samples`` series; one fused XLA program per batch."""
        batch = min(self.sample_batch_size, num_samples)
        fn = self._get_fn(num_diffusion_steps, batch)
        num_batches = -(-num_samples // batch)
        self.last_resample_stats = {"resampled_chains": 0, "unresolved_chains": 0}

        def draw(k: Array) -> Array:
            out = fn(variables, k)
            if jax.process_count() > 1:
                # Multi-controller: batches come back sharded across
                # processes; gather so downstream host-side metrics see
                # the full batch on every process.
                from fourierdiffusion_tpu.parallel.distributed import gather_to_host

                out = jnp.asarray(gather_to_host(out))
            return out

        outs = []
        for i in range(num_batches):
            bkey = jax.random.fold_in(key, i)
            out = draw(bkey)
            if self.divergence_threshold is not None:
                out = self._resample_divergent(draw, out, bkey)
            outs.append(out)
        x = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
        return x[:num_samples]

    def _resample_divergent(self, draw: Callable, out: Array, bkey: Array) -> Array:
        """Redraw chains whose |x| exceeds ``divergence_threshold``.

        Documented deviation (guard, off by default = reference behavior):
        under-trained models near the 200-epoch knife edge send a small
        fraction of reverse chains (~1 %, RESULTS.md seed study) to
        |x| ≈ 10–30 on standardized data whose true absmax is ~2 — an
        integration failure, not a data mode. Each retry redraws the FULL
        batch program with a fresh key and splices the redraw's rows into
        the flagged slots; chains are i.i.d. across the batch, so the
        result is an unbiased draw conditioned on non-divergence. Chains
        still flagged after ``max_resample_retries`` are kept and counted
        in ``last_resample_stats['unresolved_chains']``.
        """
        import numpy as np

        thr = float(self.divergence_threshold)  # type: ignore[arg-type]
        x = np.asarray(out).copy()
        flagged = np.abs(x).reshape(x.shape[0], -1).max(axis=1) > thr
        retries = 0
        while bool(flagged.any()) and retries < self.max_resample_retries:
            retries += 1
            redraw = np.asarray(draw(jax.random.fold_in(bkey, 1_000_000 + retries)))
            x[flagged] = redraw[flagged]
            self.last_resample_stats["resampled_chains"] += int(flagged.sum())
            flagged = np.abs(x).reshape(x.shape[0], -1).max(axis=1) > thr
        if bool(flagged.any()):
            logger.warning(
                "divergence guard: %d chains still past |x|>%g after %d retries",
                int(flagged.sum()),
                thr,
                retries,
            )
            self.last_resample_stats["unresolved_chains"] += int(flagged.sum())
        return jnp.asarray(x)
