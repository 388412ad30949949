"""Divergent-chain census: one shared definition of the knife-edge
threshold and the results.yaml fields that record it.

A sampled chain is "divergent" when its final time-domain absmax
exceeds ``DIVERGENCE_CENSUS_THRESHOLD`` (data absmax is ~2; diverged
chains land at 8-100+, see RESULTS.md "Divergence rate"). The census is
recorded at sampling time by ``cli/sample.py`` and
``scripts/cross_sample_reference_weights.py`` and consumed by
``scripts/divergence_decomposition.py`` and
``scripts/divergence_rate_stats.py`` — all four sites import the
constant from here so the committed censuses can never silently
desynchronize from the tooling (ADVICE r04).

``census_fields`` also records *provenance* (protocol + guard state +
seeds) so the rate-statistics scanner can pool runs by what they ARE
instead of by directory-name convention: a guard-on run must never be
pooled as a raw knife-edge census, and a bit-identical recreate of a
registry seed must not be double-counted (ADVICE r04, medium).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

DIVERGENCE_CENSUS_THRESHOLD = 8.0


def census_fields(
    x: np.ndarray,
    *,
    guard_active: bool,
    num_samples: int,
    num_diffusion_steps: int,
    method: str,
    sampling_seed: int,
    train_seed: Optional[int] = None,
    checkpoint: Optional[str] = None,
    arm: Optional[str] = None,
) -> dict:
    """Census + provenance fields for results.yaml.

    ``x`` is the final (un-standardized, time-domain) sample array,
    shape (n, ...). ``arm`` tags the training configuration the
    weights came from (e.g. "fused"/"unfused"/"reference") when the
    caller knows it.
    """
    absmax = np.max(np.abs(np.asarray(x)), axis=tuple(range(1, x.ndim)))
    fields = {
        "divergence_census_threshold": DIVERGENCE_CENSUS_THRESHOLD,
        "divergence_census_count": int(
            (absmax > DIVERGENCE_CENSUS_THRESHOLD).sum()
        ),
        "divergence_census_max_absmax": float(absmax.max()),
        "divergence_census_guard_active": bool(guard_active),
        "divergence_census_protocol": {
            "num_samples": int(num_samples),
            "num_diffusion_steps": int(num_diffusion_steps),
            "method": str(method),
            "sampling_seed": int(sampling_seed),
        },
    }
    proto = fields["divergence_census_protocol"]
    if train_seed is not None:
        proto["train_seed"] = int(train_seed)
    if checkpoint is not None:
        proto["checkpoint"] = str(checkpoint)
    if arm is not None:
        proto["arm"] = str(arm)
    return fields
