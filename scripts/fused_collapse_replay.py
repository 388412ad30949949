"""Replay + bisect harness for the fused-training collapse (round-3 item 1).

Run 2637848b (time-domain, seed 44, FDIFF_FUSED_TRAIN=1) collapsed at
epoch 118->119: train loss 0.0025 -> 0.0030 -> 0.0105, pinned thereafter
(RESULTS.md "fused-training collapse"). The trainer's RNG is a pure
function of the config seed, and TPU execution is deterministic, so
re-running the identical program must reproduce the event; this script
replays the run with the PRODUCTION epoch program (identical jit, so the
trajectory is bit-identical), snapshots the full train state around the
event, and compares the replayed loss curve against the recorded
``metrics.jsonl`` epoch by epoch.

Phase 2 (``--bisect``) restarts from a saved snapshot and steps through
one epoch WITHOUT the scan, computing fused AND unfused losses/grads at
every step to find the first divergent update.

Usage:
    python scripts/fused_collapse_replay.py --run 2637848b --to-epoch 122 \
        --snapshot-from 112 --out runs_debug/collapse
    python scripts/fused_collapse_replay.py --run 2637848b --bisect \
        --state runs_debug/collapse/state_ep117.npz --epoch 118
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

os.environ.setdefault("FDIFF_FUSED_TRAIN", "1")

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def build(cfg):
    from fourierdiffusion_tpu.training.trainer import Trainer
    from fourierdiffusion_tpu.utils.instantiate import (
        build_datamodule,
        build_model_config,
        build_scheduler,
    )

    dm = build_datamodule(cfg["datamodule"])
    dm.prepare_data()
    dm.setup("fit")
    scheduler = build_scheduler(cfg["score_model"]["noise_scheduler"])
    model_cfg = build_model_config(cfg["score_model"])
    p = dm.dataset_parameters
    model = model_cfg.build(n_channels=p["n_channels"], max_len=p["max_len"])
    tcfg = cfg["trainer"]
    trainer = Trainer(
        model,
        scheduler,
        max_epochs=int(tcfg["max_epochs"]),
        lr_max=float(cfg["score_model"]["lr_max"]),
        gradient_clip_val=float(tcfg.get("gradient_clip_val", 1.0)),
        seed=int(cfg.get("random_seed", 42)),
        mesh=None,
        ema_decay=float(tcfg.get("ema_decay", 0.0)),
    )
    return dm, trainer


def state_to_host(state):
    return jax.tree_util.tree_map(lambda a: np.asarray(jax.device_get(a)), state)


def save_state_npz(path: Path, state, epoch: int) -> None:
    leaves, _ = jax.tree_util.tree_flatten(state_to_host(state))
    np.savez(path, epoch=epoch, **{f"leaf_{i}": a for i, a in enumerate(leaves)})


def load_state_npz(path: Path, template):
    z = np.load(path)
    _, treedef = jax.tree_util.tree_flatten(template)
    n = len([k for k in z.files if k.startswith("leaf_")])
    leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves), int(z["epoch"])


def make_initial_state(trainer, dm):
    """Mirror Trainer.fit's state construction exactly (same key splits)."""
    import optax

    from fourierdiffusion_tpu.training.optim import make_optimizer
    from fourierdiffusion_tpu.training.trainer import TrainStateBundle

    train_split = dm.train_arrays()
    val_split = dm.val_arrays()
    x_train = train_split.standardized()
    x_val = val_split.standardized()
    trainer.num_training_steps = dm.steps_per_epoch * trainer.max_epochs

    key = jax.random.PRNGKey(trainer.seed)
    init_key, fit_key = jax.random.split(key)
    dummy_t = jnp.zeros((1,), x_train.dtype)
    init_variables = trainer.model.init(init_key, x_train[:1], dummy_t)
    params = jax.tree_util.tree_map(jnp.copy, init_variables["params"])
    constants = jax.tree_util.tree_map(
        jnp.copy, init_variables.get("constants", {})
    )
    optimizer = make_optimizer(
        trainer.lr_max,
        trainer.num_training_steps,
        gradient_clip_val=trainer.gradient_clip_val,
    )
    ema0 = (
        jax.tree_util.tree_map(jnp.copy, params)
        if trainer.ema_decay > 0.0
        else {}
    )
    state = TrainStateBundle(
        params, constants, optimizer.init(params), jnp.zeros((), jnp.int32), ema0
    )
    del optax
    return state, optimizer, fit_key, x_train, x_val


def epoch_keys(trainer, fit_key, epoch, n, batch_size):
    ekey = jax.random.fold_in(fit_key, epoch)
    perm_key, scan_key, val_key = jax.random.split(ekey, 3)
    perm = trainer._epoch_permutation(perm_key, n, batch_size)
    return perm, scan_key, val_key


def multistream(args, cfg):
    """From a snapshot, continue training under SALTED stochastic streams
    (scan_key perturbed at runtime — identical data order via perm, same
    compiled program across salts) for BOTH the fused and unfused paths.
    Counts collapse events: if only the original fused stream (salt 0)
    collapses while other fused streams and unfused streams sail, the
    event is knife-edge stream luck, not a systematic fused-path defect."""
    dm, trainer = build(cfg)
    state0, optimizer, fit_key, x_train, x_val = make_initial_state(trainer, dm)
    state0, at_epoch = load_state_npz(Path(args.state), state0)
    host0 = state_to_host(state0)
    n = x_train.shape[0]
    bs = dm.batch_size
    salts = [int(s) for s in args.salts.split(",")]

    for fused in (True, False):
        os.environ["FDIFF_FUSED_TRAIN"] = "1" if fused else "0"
        train_epoch, _ = trainer._make_epoch_fns(optimizer)
        for salt in salts:
            state = jax.tree_util.tree_map(jnp.asarray, host0)
            losses = []
            for epoch in range(at_epoch, args.to_epoch):
                perm, scan_key, _ = epoch_keys(trainer, fit_key, epoch, n, bs)
                if salt:
                    scan_key = jax.random.fold_in(scan_key, salt)
                state, tl = train_epoch(state, x_train, perm, scan_key)
                losses.append(float(tl))
            collapsed = losses[-1] > 0.006 or max(losses[-5:]) > 0.006
            tail = " ".join(f"{v:.4f}" for v in losses[-8:])
            print(
                f"{'fused' if fused else 'unfused'} salt={salt}: "
                f"{'COLLAPSED' if collapsed else 'clean'} "
                f"(epochs {at_epoch}-{args.to_epoch - 1}, last8: {tail})",
                flush=True,
            )


def replay(args, cfg):
    dm, trainer = build(cfg)
    state, optimizer, fit_key, x_train, x_val = make_initial_state(trainer, dm)
    train_epoch, eval_epoch = trainer._make_epoch_fns(optimizer)
    n = x_train.shape[0]
    bs = dm.batch_size
    n_val = x_val.shape[0]
    val_perm = jnp.arange(-(-n_val // bs) * bs) % n_val
    val_perm = val_perm.reshape(-1, bs)

    orig = {}
    mpath = REPO / "runs" / args.run / "metrics.jsonl"
    if mpath.exists():
        for line in open(mpath):
            r = json.loads(line)
            if "train/loss" in r:
                orig[r["epoch"]] = r["train/loss"]

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    import time

    for epoch in range(args.to_epoch):
        if epoch >= args.snapshot_from:
            save_state_npz(out / f"state_ep{epoch:03d}.npz", state, epoch)
        perm, scan_key, val_key = epoch_keys(trainer, fit_key, epoch, n, bs)
        t0 = time.perf_counter()
        state, train_loss = train_epoch(state, x_train, perm, scan_key)
        train_loss = float(train_loss)
        ref = orig.get(epoch)
        drift = "" if ref is None else f" orig={ref:.6f} d={train_loss - ref:+.2e}"
        print(
            f"epoch {epoch}: train/loss={train_loss:.6f}{drift} "
            f"({time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
        if ref is not None and train_loss > max(3 * ref, 0.006):
            print(f"collapse-like divergence beyond original at epoch {epoch}")
        if train_loss > 0.006 and epoch > args.snapshot_from:
            print("loss blew past 0.006 — stopping replay", flush=True)
            break
    print("replay done", flush=True)


def grad_stats(tree):
    flat = jax.tree_util.tree_leaves_with_path(tree)
    g2 = 0.0
    worst = (0.0, "")
    for path, leaf in flat:
        a = np.asarray(leaf)
        g2 += float((a.astype(np.float64) ** 2).sum())
        m = float(np.abs(a).max()) if a.size else 0.0
        if m > worst[0]:
            worst = (m, jax.tree_util.keystr(path))
    return np.sqrt(g2), worst


def bisect(args, cfg):
    """Step through one epoch un-scanned; at each state compute the fused
    loss/grads (the path the run trained under) plus diagnostics:
    unfused loss/grads at the same state, and the deterministic
    (dropout-off) fused-vs-unfused agreement — a state-dependent kernel
    bug shows up there regardless of dropout-mask stream differences."""
    import optax

    from fourierdiffusion_tpu.data.batch import DiffusableBatch

    dm, trainer = build(cfg)
    state, optimizer, fit_key, x_train, x_val = make_initial_state(trainer, dm)
    state, at_epoch = load_state_npz(Path(args.state), state)
    print(f"loaded state at epoch {at_epoch}; stepping epoch {args.epoch}")
    n = x_train.shape[0]
    bs = dm.batch_size
    perm, scan_key, _ = epoch_keys(trainer, fit_key, args.epoch, n, bs)
    keys = jax.random.split(scan_key, perm.shape[0])

    def _lg(params, constants, bx, key):
        return jax.value_and_grad(trainer._loss)(
            params, constants, DiffusableBatch(X=bx), key, True
        )

    def _advance(state, grads):
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if trainer.ema_decay > 0.0:
            ema = jax.tree_util.tree_map(
                lambda e, p: trainer.ema_decay * e + (1.0 - trainer.ema_decay) * p,
                state.ema_params,
                params,
            )
        else:
            ema = state.ema_params
        return type(state)(
            params, state.constants, opt_state, state.step + 1, ema
        )

    # Two PHYSICALLY distinct functions: jax.jit keyed on the same
    # function object shares one trace cache, so two jit(_lg) wrappers
    # would both replay whichever path traced first (observed: identical
    # losses). _use_fused_train reads the env var at TRACE time.
    def _lg_fused(params, constants, bx, key):
        return _lg(params, constants, bx, key)

    def _lg_unfused(params, constants, bx, key):
        return _lg(params, constants, bx, key)

    fused_lg = jax.jit(_lg_fused)
    unfused_lg = jax.jit(_lg_unfused)
    advance = jax.jit(_advance)

    for step in range(perm.shape[0]):
        bx = x_train[perm[step]]
        key = keys[step]
        os.environ["FDIFF_FUSED_TRAIN"] = "1"
        lf, gf = fused_lg(state.params, state.constants, bx, key)
        os.environ["FDIFF_FUSED_TRAIN"] = "0"
        lu, gu = unfused_lg(state.params, state.constants, bx, key)
        lf, lu = float(lf), float(lu)
        nf, wf = grad_stats(gf)
        nu, wu = grad_stats(gu)
        flag = " <-- FUSED OUTLIER" if lf > 2 * lu + 1e-3 or nf > 3 * nu else ""
        print(
            f"step {step}: loss fused={lf:.6f} unfused={lu:.6f} "
            f"|g| fused={nf:.3f} unfused={nu:.3f} "
            f"max|g| fused={wf[0]:.3f}@{wf[1]} unfused={wu[0]:.3f}@{wu[1]}{flag}",
            flush=True,
        )
        if flag and args.dump:
            outp = Path(args.dump)
            outp.mkdir(parents=True, exist_ok=True)
            save_state_npz(outp / f"trigger_state_step{step}.npz", state, args.epoch)
            np.savez(
                outp / f"trigger_batch_step{step}.npz",
                bx=np.asarray(bx),
                key=np.asarray(key),
            )
            print(f"dumped trigger state to {outp}", flush=True)

        # Advance the trajectory with the FUSED update (what the run did).
        state = advance(state, gf)
    print("bisect done", flush=True)


def scan_states(args, cfg):
    """For each epoch snapshot: (a) DETERMINISTIC (dropout-off) loss and
    grads under fused vs autodiff — an exact comparison independent of
    the two paths' different dropout-mask streams, so a state-dependent
    kernel bug shows as divergence here; (b) per-layer activation stats
    from the canonical forward (capture_intermediates) to test the
    activation-explosion -> LN-gradient-vanishing hypothesis from the
    post-mortem (dead-backbone mu~1e-13 signature)."""
    import dataclasses as _dc

    from fourierdiffusion_tpu.data.batch import DiffusableBatch
    from fourierdiffusion_tpu.losses import sde_loss

    dm, trainer = build(cfg)
    state, optimizer, fit_key, x_train, x_val = make_initial_state(trainer, dm)
    bx = x_train[:64]
    probe_key = jax.random.PRNGKey(123)
    model = trainer.model
    det_model = _dc.replace(model, dropout_rate=0.0)
    sde = trainer.scheduler

    def det_loss_fused(params, constants):
        from fourierdiffusion_tpu.models.fused import (
            fused_score_training_forward,
        )

        def score_fn(b):
            return fused_score_training_forward(
                det_model, params, constants, b.X, b.timesteps,
                jax.random.PRNGKey(0),
            )

        return sde_loss(score_fn, sde, DiffusableBatch(X=bx), probe_key)

    def det_loss_unfused(params, constants):
        def score_fn(b):
            return model.apply(
                {"params": params, "constants": constants},
                b.X, b.timesteps, deterministic=True,
            )

        return sde_loss(score_fn, sde, DiffusableBatch(X=bx), probe_key)

    fused_vg = jax.jit(jax.value_and_grad(det_loss_fused))
    unfused_vg = jax.jit(jax.value_and_grad(det_loss_unfused))

    t_half = jnp.full((bx.shape[0],), 0.5, bx.dtype)

    @jax.jit
    def capture(params, constants):
        _, inter = model.apply(
            {"params": params, "constants": constants},
            bx, t_half, deterministic=True,
            capture_intermediates=True,
        )
        return inter["intermediates"]

    for path in sorted(Path(args.out).glob("state_ep*.npz")):
        st, epoch = load_state_npz(path, state)
        lf, gf = fused_vg(st.params, st.constants)
        lu, gu = unfused_vg(st.params, st.constants)
        lf, lu = float(lf), float(lu)
        fl = {jax.tree_util.keystr(p): np.asarray(v)
              for p, v in jax.tree_util.tree_leaves_with_path(gf)}
        ul = {jax.tree_util.keystr(p): np.asarray(v)
              for p, v in jax.tree_util.tree_leaves_with_path(gu)}
        rel = []
        for k in fl:
            denom = np.abs(ul[k]).max() + 1e-12
            rel.append((float(np.abs(fl[k] - ul[k]).max() / denom), k))
        rel.sort(reverse=True)
        nf, _ = grad_stats(gf)
        nu, _ = grad_stats(gu)
        inter = jax.device_get(capture(st.params, st.constants))
        # Residual-stream scale per layer: std of each encoder layer's
        # output (post-LN => ~|scale|) and of the attention branch.
        stats = []
        backbone = inter["backbone"]
        for i in range(model.num_layers):
            layer = backbone[f"layers_{i}"]
            out = np.asarray(layer["__call__"][0])
            attn = np.asarray(layer["self_attn"]["__call__"][0])
            stats.append(f"L{i}:out={out.std():.2f}/attn={np.abs(attn).max():.1f}")
        print(
            f"epoch {epoch}: det loss fused={lf:.8f} unfused={lu:.8f} "
            f"rel_dloss={abs(lf - lu) / max(abs(lu), 1e-12):.2e} "
            f"|g|f={nf:.4f} |g|u={nu:.4f} "
            f"worst_grad_rel={rel[0][0]:.2e}@{rel[0][1]} "
            f"second={rel[1][0]:.2e}@{rel[1][1]}",
            flush=True,
        )
        print("   " + " ".join(stats), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="2637848b")
    ap.add_argument("--to-epoch", type=int, default=122)
    ap.add_argument("--snapshot-from", type=int, default=112)
    ap.add_argument("--out", default=str(REPO / "runs_debug" / "collapse"))
    ap.add_argument("--bisect", action="store_true")
    ap.add_argument("--scan-states", action="store_true")
    ap.add_argument("--multistream", action="store_true")
    ap.add_argument("--salts", default="0,1,2,3")
    ap.add_argument("--state", type=str, default=None)
    ap.add_argument("--epoch", type=int, default=118)
    ap.add_argument("--dump", type=str, default=str(REPO / "runs_debug" / "collapse"))
    args = ap.parse_args()

    from fourierdiffusion_tpu.utils.config import load_config

    cfg = load_config(REPO / "runs" / args.run / "train_config.yaml")
    if args.bisect:
        assert args.state, "--bisect needs --state"
        bisect(args, cfg)
    elif args.scan_states:
        scan_states(args, cfg)
    elif args.multistream:
        assert args.state, "--multistream needs --state"
        multistream(args, cfg)
    else:
        replay(args, cfg)


if __name__ == "__main__":
    main()
