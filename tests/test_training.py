"""Training-loop tests: smoke fit on the dummy datamodule with parameter
changes (mirrors the reference's per-backbone 1-epoch training check,
``tests/test_score_models.py:63-89``), loss decrease, checkpointing,
and data-parallel training on the virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourierdiffusion_tpu.data.datamodules import DummyDatamodule
from fourierdiffusion_tpu.models import ScoreModelConfig
from fourierdiffusion_tpu.schedulers import VEScheduler, VPScheduler
from fourierdiffusion_tpu.training.trainer import Trainer
from fourierdiffusion_tpu.utils.checkpoint import (
    BestCheckpointCallback,
    get_best_checkpoint,
    load_checkpoint,
)

CHANNELS = 2
MAX_LEN = 16
BATCH = 32


def _datamodule(**kw) -> DummyDatamodule:
    dm = DummyDatamodule(
        batch_size=BATCH, n_channels=CHANNELS, max_len=MAX_LEN, **kw
    )
    dm.prepare_data()
    dm.setup()
    return dm


def _tiny_model(model_type: str = "mlp"):
    return ScoreModelConfig(
        model_type=model_type, d_model=16, num_layers=1, n_head=2, d_mlp=32
    ).build(n_channels=CHANNELS, max_len=MAX_LEN)


@pytest.mark.parametrize("model_type", ["transformer", "mlp", "lstm"])
def test_fit_changes_every_param(model_type: str) -> None:
    dm = _datamodule(standardize=True)
    model = _tiny_model(model_type)
    trainer = Trainer(model, VPScheduler(), max_epochs=1, lr_max=1e-3)

    x = dm.train_arrays().standardized()
    init_vars = model.init(jax.random.PRNGKey(0), x[:1], jnp.zeros((1,)))
    before = jax.tree_util.tree_map(np.asarray, init_vars["params"])

    state = trainer.fit(dm, init_variables=init_vars)
    after = state.params

    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, np.asarray(b)), before, after
    )
    for path, did_change in jax.tree_util.tree_leaves_with_path(changed):
        assert did_change, f"param {jax.tree_util.keystr(path)} did not change"
    # The frozen GFP W must NOT change.
    np.testing.assert_array_equal(
        np.asarray(init_vars["constants"]["time_encoder"]["W"]),
        np.asarray(state.constants["time_encoder"]["W"]),
    )


@pytest.mark.parametrize("scheduler", [VPScheduler(), VEScheduler()])
def test_loss_decreases(scheduler) -> None:
    dm = _datamodule(standardize=True)
    trainer = Trainer(_tiny_model(), scheduler, max_epochs=10, lr_max=1e-3, seed=1)
    trainer.fit(dm)
    losses = [h["train/loss"] for h in trainer.history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"no improvement: {losses[0]} -> {losses[-1]}"


def test_checkpoint_roundtrip(tmp_path) -> None:
    dm = _datamodule(standardize=True)
    model = _tiny_model()
    cb = BestCheckpointCallback(tmp_path / "checkpoints")
    trainer = Trainer(model, VPScheduler(), max_epochs=3, lr_max=1e-3, callbacks=(cb,))
    state = trainer.fit(dm)

    best = get_best_checkpoint(tmp_path / "checkpoints")
    restored = load_checkpoint(best)
    # Restored params produce identical scores to (some epoch's) params;
    # at minimum the structure matches and values are finite.
    x = dm.train_arrays().standardized()[:4]
    t = jnp.full((4,), 0.5)
    out = model.apply(
        {"params": restored["params"], "constants": restored["constants"]}, x, t
    )
    assert out.shape == (4, MAX_LEN, CHANNELS)
    assert bool(jnp.all(jnp.isfinite(out)))
    # Best-checkpoint selection: only one kept, named epoch=...-val_loss=...
    assert best.name.startswith("epoch=")


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_data_parallel_training_matches_shapes() -> None:
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    dm = _datamodule(standardize=True)
    trainer = Trainer(_tiny_model(), VPScheduler(), max_epochs=2, lr_max=1e-3, mesh=mesh)
    state = trainer.fit(dm)
    assert all(np.isfinite(h["train/loss"]) for h in trainer.history)
    # Replicated state: every leaf is fully addressable on all devices.
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_save_last_and_resume(tmp_path) -> None:
    """Full-state resume (new capability vs the reference, SURVEY §5.3):
    train 2 epochs with save-last, resume for 2 more, and check the
    resumed run continues from the recorded epoch and step."""
    from fourierdiffusion_tpu.utils.checkpoint import restore_train_state

    dm = _datamodule(standardize=True)
    model = _tiny_model()
    t1 = Trainer(
        model, VPScheduler(), max_epochs=2, lr_max=1e-3,
        save_last_dir=tmp_path / "ckpts",
    )
    state1 = t1.fit(dm)
    assert (tmp_path / "ckpts" / "last").exists()

    t2 = Trainer(
        model, VPScheduler(), max_epochs=4, lr_max=1e-3,
        save_last_dir=tmp_path / "ckpts",
    )
    state2 = t2.fit(dm, resume_from=tmp_path / "ckpts" / "last")
    # 2 fresh epochs of 10 steps each on top of the restored 20.
    assert int(state2.step) == 40
    assert len(t2.history) == 2
    assert t2.history[0]["epoch"] == 2
    # And the persisted state reflects the final epoch.
    restored, next_epoch = restore_train_state(tmp_path / "ckpts" / "last", state2)
    assert next_epoch == 4
    assert int(restored.step) == 40


def test_cosine_warmup_schedule_matches_reference_formula() -> None:
    """The LR schedule must match diffusers get_cosine_schedule_with_warmup
    (reference score_models.py:122-130): linear warmup then
    0.5*(1+cos(pi*progress)) decay, stepped per optimizer step."""
    import math

    from fourierdiffusion_tpu.training.optim import cosine_warmup_schedule

    lr_max, total = 1e-3, 1000
    warmup = total // 10
    sched = cosine_warmup_schedule(lr_max, total)

    def reference(step: int) -> float:
        if step < warmup:
            return lr_max * step / max(1, warmup)
        progress = (step - warmup) / max(1, total - warmup)
        return lr_max * max(0.0, 0.5 * (1.0 + math.cos(math.pi * progress)))

    for step in [0, 1, 50, 100, 101, 500, 900, 999]:
        np.testing.assert_allclose(
            float(sched(step)), reference(step), rtol=2e-2, atol=1e-6,
            err_msg=f"step {step}",
        )


def test_gradient_accumulation() -> None:
    """accumulate_grad_batches wraps the optimizer in optax.MultiSteps:
    params change only every k micro-steps; the LR schedule length
    shrinks by k (reference extraction.py:12-17)."""
    dm = _datamodule(standardize=True)
    trainer = Trainer(
        _tiny_model(), VPScheduler(), max_epochs=2, lr_max=1e-3,
        accumulate_grad_batches=2,
    )
    trainer.fit(dm)
    # 10 micro-steps/epoch, k=2 -> 10 optimizer steps over 2 epochs.
    assert trainer.num_training_steps == 10
    assert all(np.isfinite(h["train/loss"]) for h in trainer.history)


def test_ema_weights(tmp_path) -> None:
    """EMA (deviation from the reference, documented in README): the
    averaged weights lag the raw weights, drive eval/callbacks, and
    round-trip through the full-state resume checkpoint."""
    dm = _datamodule(standardize=True)
    model = _tiny_model()
    seen = {}

    def spy(trainer, epoch, params, constants, metrics):
        seen["params"] = params

    t = Trainer(
        model, VPScheduler(), max_epochs=2, lr_max=1e-3,
        ema_decay=0.9, callbacks=(spy,), save_last_dir=tmp_path / "ckpts",
    )
    state = t.fit(dm)
    assert state.ema_params, "EMA tree missing"
    raw = jax.tree_util.tree_leaves(state.params)
    ema = jax.tree_util.tree_leaves(state.ema_params)
    assert any(not np.allclose(a, b) for a, b in zip(raw, ema))
    # Callbacks receive the EMA weights.
    cb_leaf = jax.tree_util.tree_leaves(seen["params"])[0]
    np.testing.assert_array_equal(np.asarray(cb_leaf), np.asarray(ema[0]))

    from fourierdiffusion_tpu.utils.checkpoint import restore_train_state

    restored, next_epoch = restore_train_state(tmp_path / "ckpts" / "last", state)
    assert next_epoch == 2
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.ema_params)[0]),
        np.asarray(ema[0]),
    )


def test_ema_warmup_tracks_params_on_short_runs() -> None:
    """The warmed-up decay min(decay, (1+t)/(10+t)) must keep a
    short-horizon EMA near the *current* weights instead of pinned at
    init: with a fixed 0.999 decay over ~20 steps the EMA would retain
    ~98% init weight, which made 60-epoch (960-step) EMA checkpoints
    systematically stale (round-3 LSTM head-to-head finding)."""
    dm = _datamodule(standardize=True)
    model = _tiny_model()
    t = Trainer(model, VPScheduler(), max_epochs=2, lr_max=1e-2, ema_decay=0.999)
    # Reproduce the trainer's own init draw (trainer.py: split(PRNGKey(seed))).
    dm.prepare_data()
    dm.setup()
    x_train = dm.train_arrays().standardized()
    init_key, _ = jax.random.split(jax.random.PRNGKey(t.seed))
    init_params = model.init(
        init_key, jnp.asarray(x_train[:1]), jnp.zeros((1,), x_train.dtype)
    )["params"]
    state = t.fit(dm)
    d_init = sum(
        float(jnp.abs(e - i).sum())
        for e, i in zip(
            jax.tree_util.tree_leaves(state.ema_params),
            jax.tree_util.tree_leaves(init_params),
        )
    )
    d_final = sum(
        float(jnp.abs(e - p).sum())
        for e, p in zip(
            jax.tree_util.tree_leaves(state.ema_params),
            jax.tree_util.tree_leaves(state.params),
        )
    )
    assert d_final < d_init, (
        f"EMA stuck near init: |ema-final|={d_final:.4g} vs |ema-init|={d_init:.4g}"
    )


def test_ema_disabled_keeps_reference_behavior() -> None:
    dm = _datamodule(standardize=True)
    t = Trainer(_tiny_model(), VPScheduler(), max_epochs=1, lr_max=1e-3)
    state = t.fit(dm)
    assert state.ema_params == {}


def test_spike_rollback_guard(monkeypatch) -> None:
    """Inject a loss spike and assert the trainer rewinds two epochs,
    perturbs the stream, and completes every epoch exactly once in
    history (the guard converts a rare knife-edge collapse into a logged
    recovery, RESULTS.md "fused-training collapse")."""
    dm = _datamodule(standardize=True)
    model = _tiny_model("mlp")
    trainer = Trainer(
        model,
        VPScheduler(),
        max_epochs=10,
        lr_max=1e-3,
        spike_rollback_factor=2.0,
        spike_rollback_retries=2,
    )

    real_make = trainer._make_epoch_fns
    executed = {"n": 0}

    def fake_make(optimizer):
        train_epoch, eval_epoch = real_make(optimizer)

        def wrapped(state, x_all, perm, key):
            state, loss = train_epoch(state, x_all, perm, key)
            executed["n"] += 1
            if executed["n"] == 8:  # one-off spike on the 8th executed epoch
                loss = loss * 100.0
            return state, loss

        return wrapped, eval_epoch

    monkeypatch.setattr(trainer, "_make_epoch_fns", fake_make)
    trainer.fit(dm)

    epochs = [h["epoch"] for h in trainer.history]
    assert epochs == list(range(10)), epochs
    # The spiked epoch re-ran: 10 recorded + 1 spiked-and-discarded + 1
    # rewound predecessor re-executed.
    assert executed["n"] == 12, executed["n"]
    assert all(abs(h["train/loss"]) < 1.0 for h in trainer.history)
    # Post-rollback epochs carry the stream-salt marker.
    assert trainer.history[-1].get("stream_salt") == 1


def test_val_noise_is_fixed_across_epochs() -> None:
    """VERDICT r04 weak #1 regression: validation must reuse the SAME
    (t, z) noise draws at every epoch so ``argmin val_loss`` compares
    weights, not per-epoch noise luck (the old estimator redrew noise
    from ``fold_in(fit_key, epoch)`` and all three committed 600-epoch
    runs — three architectures — picked the same "best" epoch 488).

    Black-box check: with lr_max=0 the weights never change, so the
    recorded val loss must be bit-constant across epochs. Under the old
    estimator it varied epoch to epoch."""
    dm = _datamodule(standardize=True)
    trainer = Trainer(_tiny_model("mlp"), VPScheduler(), max_epochs=4, lr_max=0.0)
    trainer.fit(dm)
    vals = [h["val/loss"] for h in trainer.history]
    assert len(set(vals)) == 1, f"val noise varies across epochs: {vals}"


def test_val_noise_keys_epoch_independent(monkeypatch) -> None:
    """White-box companion: eval_epoch receives exactly
    ``val_noise_draws`` keys per epoch and the key set is identical at
    every epoch (and disjoint from the per-epoch train keys)."""
    dm = _datamodule(standardize=True)
    trainer = Trainer(
        _tiny_model("mlp"), VPScheduler(), max_epochs=3, lr_max=1e-3,
        val_noise_draws=2,
    )
    seen: list[tuple] = []
    real_make = trainer._make_epoch_fns

    def fake_make(optimizer):
        train_epoch, eval_epoch = real_make(optimizer)

        def wrapped_eval(state, x_all, perm, key):
            seen.append(tuple(np.asarray(key).tolist()))
            return eval_epoch(state, x_all, perm, key)

        return train_epoch, wrapped_eval

    monkeypatch.setattr(trainer, "_make_epoch_fns", fake_make)
    trainer.fit(dm)
    assert len(seen) == 3 * 2
    per_epoch = [seen[i : i + 2] for i in range(0, len(seen), 2)]
    assert per_epoch[0] == per_epoch[1] == per_epoch[2], per_epoch
    assert per_epoch[0][0] != per_epoch[0][1]  # K independent draws


def test_probe_knobs_isolate_init_and_data_order() -> None:
    """Knife-edge mechanism probes: ``init_seed`` must swap ONLY the
    parameter init, ``perm_salt`` ONLY the epoch data order. With
    lr_max=0 the final params equal the init, making both effects
    directly observable."""

    def fit(**kw):
        tr = Trainer(
            _tiny_model("mlp"), VPScheduler(), max_epochs=1, lr_max=0.0, **kw
        )
        state = tr.fit(_datamodule(standardize=True))
        params = np.concatenate(
            [np.asarray(p).ravel() for p in jax.tree_util.tree_leaves(state.params)]
        )
        return params, tr.history[0]["train/loss"]

    base_p, base_l = fit()
    again_p, again_l = fit()
    np.testing.assert_array_equal(base_p, again_p)  # determinism
    assert base_l == again_l

    init_p, _ = fit(init_seed=7)
    assert not np.array_equal(base_p, init_p)  # init swapped

    perm_p, perm_l = fit(perm_salt=1)
    np.testing.assert_array_equal(base_p, perm_p)  # init untouched
    assert perm_l != base_l  # (batch, noise) pairing reshuffled


def test_no_rollback_on_normal_run() -> None:
    dm = _datamodule(standardize=True)
    model = _tiny_model("mlp")
    trainer = Trainer(
        model, VPScheduler(), max_epochs=8, lr_max=1e-3,
        spike_rollback_factor=2.5,
    )
    trainer.fit(dm)
    assert [h["epoch"] for h in trainer.history] == list(range(8))
    assert not any("stream_salt" in h for h in trainer.history)
