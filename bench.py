"""Headline benchmark: 1000-step fused diffusion sampling throughput.

Workload = the reference's eval run (``cmd/conf/sample.yaml``): generate
samples with K=1000 reverse steps on the flagship ECG frequency-domain
transformer (d_model 72, 10 layers, 12 heads, L=187). The reference
drives every step from Python (50k kernel launches per 10k samples);
here the whole loop is one XLA program per batch.

Baseline: the north-star target is 10k samples in <60s on a v5e-8
(BASELINE.json) => 166.7 samples/s on 8 chips => 20.83 samples/s/chip.
``vs_baseline`` is measured samples/s on this single chip divided by
that per-chip target (>1 beats the target).

Prints ONE JSON line. ``BENCH_MODE=train`` instead measures training
steps/sec (ECG-shaped workload, batch 64, the second BASELINE metric).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


# Shape kwargs shared by sampling and train modes (BENCH_MODEL=...).
# fast benches the opt-in MXU-aligned shape (d_model 128, 8 heads =>
# head_dim 16 fills the 16-sublane tile; configs/score_model/fast.yaml).
# fast512 additionally narrows the FFN to 512: at d_model 128 the
# d_ff=2048 FFN costs the same MXU time as at d72 (utilization gain
# exactly cancels the extra FLOPs), so the FFN width is the remaining
# throughput lever. Default stays the reference shape. heads6 keeps the
# flagship d_model 72 but partitions it into 6 heads (head_dim 12 ->
# 75% of the 16-sublane tile vs the reference 12-head head_dim 6 ->
# 37.5%): same parameter count as the flagship up to the attention
# partitioning, targeting the S/PV-dot padding floor. "lstm" benches
# the LSTM backbone (reference results_lstm.ipynb ships LSTM results,
# so the backbone matrix needs an honest perf row; the fused Pallas
# program covers only the transformer — LSTM runs the plain scan path).
SHAPE_KWARGS: dict = {
    "default": {},
    "fast": {"d_model": 128, "n_head": 8},
    "fast512": {"d_model": 128, "n_head": 8, "dim_feedforward": 512},
    "heads6": {"n_head": 6},
    "heads6_512": {"n_head": 6, "dim_feedforward": 512},
    "lstm": {},
}


def bench_train() -> None:
    """Train-step throughput (batch 64, fp32) on BENCH_MODEL's shape
    (default: the flagship/reference shape).

    Methodology: epoch 0 is warmup (includes compile); the remaining
    epochs are timed individually and the MEDIAN steps/s is reported,
    with min/max on stderr. The reference publishes no training
    throughput; ``vs_baseline`` compares against our recorded round-1
    number (BENCH_r01 follow-up: 24.2 steps/s, flagship shape) so
    regressions are visible across rounds.
    """
    import statistics
    import sys

    from fourierdiffusion_tpu.data.datamodules import DummyDatamodule
    from fourierdiffusion_tpu.models import ScoreModelConfig
    from fourierdiffusion_tpu.schedulers import VPScheduler
    from fourierdiffusion_tpu.training.trainer import Trainer

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    epochs = int(os.environ.get("BENCH_EPOCHS", "6"))
    shape = os.environ.get("BENCH_MODEL", "default")
    # BENCH_DTYPE=bfloat16 measures the bf16 fused-train variant (the
    # Pallas fwd+bwd kernels follow the model compute dtype; fp32 is the
    # quality-validated default — RESULTS.md "bf16 fused training").
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    dm = DummyDatamodule(batch_size=batch, n_channels=1, max_len=187, standardize=True)
    dm.prepare_data()
    dm.setup()
    model = ScoreModelConfig(
        model_type="lstm" if shape == "lstm" else "transformer",
        dtype=dtype,
        **SHAPE_KWARGS[shape],
    ).build(1, 187)
    trainer = Trainer(model, VPScheduler(fourier_noise_scaling=True), max_epochs=epochs)
    trainer.fit(dm)
    steady = [h["steps_per_sec"] for h in trainer.history[1:]]
    steps_per_sec = statistics.median(steady)
    print(
        f"# [{shape}] steady-state epochs: median={steps_per_sec:.2f} "
        f"min={min(steady):.2f} max={max(steady):.2f} (n={len(steady)})",
        file=sys.stderr,
    )
    round1_steps_per_sec = 24.2  # RESULTS.md round-1 measurement
    print(
        json.dumps(
            {
                "metric": "train_steps_per_sec"
                + ("" if shape == "default" else f"_{shape}"),
                "value": round(steps_per_sec, 2),
                "unit": "steps/s/chip",
                "vs_baseline": round(steps_per_sec / round1_steps_per_sec, 3),
                # NOTE: unlike sampling mode (north-star target), train
                # mode has no external baseline — the reference publishes
                # none — so vs_baseline is vs OUR round-1 number
                # (flagship shape, so fast-shape rows read >1).
                "baseline": "self_round1_24.2_steps_per_sec",
            }
        )
    )


def _measure_sampling(
    shape: str, batch: int, steps: int, method: str = "em"
) -> tuple[float, float, int]:
    """(samples/s, warmup_s, stall_reps) for one shape at (batch, steps, method)."""
    import statistics
    import sys

    import numpy as np

    from fourierdiffusion_tpu.models import ScoreModelConfig
    from fourierdiffusion_tpu.sampling.sampler import make_sample_fn
    from fourierdiffusion_tpu.schedulers import VPScheduler

    max_len, n_channels = 187, 1
    model = ScoreModelConfig(
        model_type="lstm" if shape == "lstm" else "transformer",
        dtype="bfloat16",
        **SHAPE_KWARGS[shape],
    ).build(n_channels=n_channels, max_len=max_len)
    scheduler = VPScheduler(fourier_noise_scaling=True)

    x0 = jnp.zeros((1, max_len, n_channels), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,)))

    fn = make_sample_fn(
        model,
        scheduler,
        num_diffusion_steps=steps,
        batch_size=batch,
        max_len=max_len,
        n_channels=n_channels,
        method=method,
    )

    t_c = time.perf_counter()
    np_out = np.asarray(fn(variables, jax.random.PRNGKey(1)))
    warmup_s = time.perf_counter() - t_c
    label = shape if method == "em" else f"{shape}/{method}{steps}"
    print(
        f"# [{label}] warmup (compile+run): {warmup_s:.1f}s, "
        f"finite={bool(np.isfinite(np_out).all())}",
        file=sys.stderr,
    )

    n_batches = int(os.environ.get("BENCH_REPS", "3"))
    rep_times = []
    for i in range(n_batches):
        t0 = time.perf_counter()
        out = fn(variables, jax.random.PRNGKey(2 + i))
        out.block_until_ready()
        rep_times.append(time.perf_counter() - t0)
    median_t = statistics.median(rep_times)
    # Tunnel-stall marker (VERDICT r04 weak #4): a rep >2x the median is
    # a dispatch stall in the axon tunnel (observed: 183 s then 15.3 s
    # for identical programs), not real throughput variance. Flag it so
    # the artifact is self-explaining.
    stalls = sum(t > 2.0 * median_t for t in rep_times)
    print(
        f"# [{label}] reps: "
        + " ".join(f"{batch / t:.1f}" for t in rep_times)
        + " samples/s"
        + (f"  [STALL: {stalls} rep(s) >2x median]" if stalls else ""),
        file=sys.stderr,
    )
    # Median rep, matching train mode: a sum-over-reps would misreport
    # stalled dispatches as throughput.
    return batch / median_t, warmup_s, stalls


def main() -> None:
    from fourierdiffusion_tpu.utils.profiling import setup_compilation_cache

    setup_compilation_cache()
    if os.environ.get("BENCH_MODE") == "train":
        bench_train()
        return

    batch = int(os.environ.get("BENCH_BATCH", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "1000"))

    shape = os.environ.get("BENCH_MODEL", "default")
    samples_per_sec, warmup_s, stalls = _measure_sampling(shape, batch, steps)
    per_chip_target = 10000.0 / 60.0 / 8.0  # v5e-8 north star, per chip
    record = {
        "metric": f"diffusion_samples_per_sec_{steps}step"
        + ("" if shape == "default" else f"_{shape}"),
        "value": round(samples_per_sec, 2),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / per_chip_target, 3),
        "warmup_s": round(warmup_s, 1),
    }
    if stalls:
        record["stall_reps"] = stalls  # see stderr STALL marker
    # The default invocation ALSO measures the recommended fast shape
    # (fast512: d128/8h/dff512 — beats the flagship on all four quality
    # metrics at 600 epochs, RESULTS.md Pareto) and reports it as extra
    # fields in the SAME JSON line, so both the parity-shape headline and
    # the recommended operating point are on record every round.
    # BENCH_RECOMMENDED=0 skips it; BENCH_MODEL=<shape> benches one shape.
    if shape == "default" and os.environ.get("BENCH_RECOMMENDED", "1") == "1":
        rec_sps, _, _ = _measure_sampling("fast512", batch, steps)
        record["recommended_shape"] = "fast512"
        record["recommended_samples_per_sec"] = round(rec_sps, 2)
        record["recommended_vs_baseline"] = round(rec_sps / per_chip_target, 3)
    # Quality-matched fast sampler: pc (predictor–corrector) at K=250
    # beats em at K=1000 on every metric at the published 10k × 1000
    # protocol (RESULTS.md "Sampler-step ladder") with half the model
    # evaluations — so its samples/s is a headline-quality throughput
    # number, not a reduced-quality shortcut. BENCH_PC=0 skips it.
    if (
        shape == "default"
        and steps == 1000
        and os.environ.get("BENCH_PC", "1") == "1"
    ):
        pc_sps, _, _ = _measure_sampling("default", batch, 250, method="pc")
        record["pc250_samples_per_sec"] = round(pc_sps, 2)
        record["pc250_vs_baseline"] = round(pc_sps / per_chip_target, 3)
        if os.environ.get("BENCH_RECOMMENDED", "1") == "1":
            # Composite operating point: recommended shape × quality-
            # matched sampler (fast512 + pc-250).
            cps, _, _ = _measure_sampling("fast512", batch, 250, method="pc")
            record["fast512_pc250_samples_per_sec"] = round(cps, 2)
            record["fast512_pc250_vs_baseline"] = round(cps / per_chip_target, 3)
            # Fastest all-metrics-beat-reference point measured (110.4/s,
            # RESULTS.md "Composite operating points"): heads6_512 trades
            # only the time-marginal metric vs fast512.
            hps, _, _ = _measure_sampling("heads6_512", batch, 250, method="pc")
            record["heads6_512_pc250_samples_per_sec"] = round(hps, 2)
            record["heads6_512_pc250_vs_baseline"] = round(
                hps / per_chip_target, 3
            )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
