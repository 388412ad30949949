"""Statistical quality probe for the fused-training dropout mask stream.

The fused kernels derive masks as ``pltpu.prng_seed(tag);
prng_random_bits(shape)`` with tags that are ARITHMETICALLY RELATED
(``tag = seed + program*131071 + site*7919 + extra*104729``,
``ops/fused_encoder_train.py:58-68``). If the hardware PRNG's seed
diffusion is weak, masks across programs/sites could be correlated —
dropout would stop averaging out across the batch, which is exactly the
kind of defect that produces rare compounding training events.

Dumps the keep masks for a grid of related tags on the REAL TPU via a
minimal Pallas kernel and reports: keep-rate per tag, pairwise mask
agreement vs the 0.82 expectation for independent rate-0.1 masks
(P(both keep)+P(both drop) = 0.9^2+0.1^2), and lane/sublane structure.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from fourierdiffusion_tpu.ops.fused_encoder_train import _keep  # noqa: E402

RATE = 0.1
SHAPE = (72, 256)  # the SITE_OUT mask shape at the flagship config


def dump_masks(seed: int, n_programs: int, site: int) -> np.ndarray:
    """Masks for programs 0..n-1 at one (seed, site): (n, *SHAPE)."""

    def kernel(seed_ref, out_ref):
        out_ref[0] = _keep(SHAPE, RATE, seed_ref[0], site)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_programs,),
        in_specs=[],
        out_specs=pl.BlockSpec(
            (1,) + SHAPE, lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_programs,) + SHAPE, jnp.float32),
    )(jnp.asarray([seed], jnp.int32))
    return np.asarray(out) > 0.0  # keep=True


def agreement(a: np.ndarray, b: np.ndarray) -> float:
    return float((a == b).mean())


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    indep = (1 - RATE) ** 2 + RATE**2  # expected agreement if independent

    rng = np.random.default_rng(0)
    seeds = [int(s) for s in rng.integers(0, 2**31 - 1, size=4)]
    for seed in seeds:
        masks = dump_masks(seed, n_programs=16, site=0)
        rates = masks.mean(axis=(1, 2))
        pair = [agreement(masks[i], masks[i + 1]) for i in range(15)]
        far = [agreement(masks[0], masks[i]) for i in range(1, 16)]
        print(
            f"seed {seed}: keep-rate mean={rates.mean():.4f} "
            f"min={rates.min():.4f} max={rates.max():.4f} | "
            f"adjacent-program agreement mean={np.mean(pair):.4f} "
            f"max={np.max(pair):.4f} | vs-prog0 max={np.max(far):.4f} "
            f"(independent => ~{indep:.3f})",
            flush=True,
        )
        # Within-mask structure: row/column keep rates should be ~0.9.
        row = masks[0].mean(axis=1)
        col = masks[0].mean(axis=0)
        print(
            f"  row keep-rate spread: [{row.min():.3f}, {row.max():.3f}] "
            f"col: [{col.min():.3f}, {col.max():.3f}]",
            flush=True,
        )
        # Across sites within one program (the four dropout sites).
        per_site = [dump_masks(seed, 2, site)[0] for site in range(4)]
        cross = [
            agreement(per_site[i], per_site[j])
            for i in range(4)
            for j in range(i + 1, 4)
        ]
        print(
            f"  cross-site agreement mean={np.mean(cross):.4f} "
            f"max={np.max(cross):.4f}",
            flush=True,
        )
        # Sequential steps: seeds differ by fold_in randomness in the real
        # trainer, but also probe seed vs seed+1 (adjacent raw seeds).
        m0 = dump_masks(seed, 1, 0)[0]
        m1 = dump_masks(seed + 1, 1, 0)[0]
        print(f"  seed vs seed+1 agreement: {agreement(m0, m1):.4f}", flush=True)


if __name__ == "__main__":
    main()
