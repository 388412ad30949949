"""Training loop: jitted train/eval steps, epoch-level ``lax.scan``.

Replaces the reference's Lightning fit loop (``cmd/train.py:59-63`` +
``ScoreModule.training_step``, ``score_models.py:96-130``) with a
TPU-native design:

* the whole training split is device-resident; a batch is an index
  gather over a per-epoch ``jax.random.permutation`` (wrapping so every
  step has a static shape);
* one XLA program executes a full epoch (``lax.scan`` over steps) —
  zero host round-trips inside an epoch;
* optimizer = AdamW + warmup-cosine + grad-clip 1.0 exactly as the
  reference configures them;
* data parallelism: when a mesh is provided, the train state is
  replicated and batches are sharded over the ``data`` axis; XLA inserts
  the gradient all-reduce over ICI (SURVEY.md §5 item 8).
"""

from __future__ import annotations

import dataclasses
import logging
import math
import statistics
import time
from collections import deque
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fourierdiffusion_tpu.data.batch import DiffusableBatch
from fourierdiffusion_tpu.data.datamodules import Datamodule
from fourierdiffusion_tpu.losses import sde_loss
from fourierdiffusion_tpu.schedulers.sde import SDE
from fourierdiffusion_tpu.training.optim import cosine_warmup_schedule, make_optimizer

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainStateBundle:
    """Model variables + optimizer state (a pytree of arrays).

    ``ema_params`` is ``{}`` unless EMA is enabled (keeps the pytree —
    and therefore the resume-checkpoint layout — unchanged by default).
    """

    params: Any
    constants: Any
    opt_state: Any
    step: Array
    ema_params: Any = dataclasses.field(default_factory=dict)

    def tree_flatten(self) -> tuple:
        return (
            self.params,
            self.constants,
            self.opt_state,
            self.step,
            self.ema_params,
        ), None

    @classmethod
    def tree_unflatten(cls, aux: None, children: tuple) -> "TrainStateBundle":
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainStateBundle,
    lambda s: s.tree_flatten(),
    TrainStateBundle.tree_unflatten,
)


class Trainer:
    """Fits a score network on a datamodule.

    Callbacks receive ``(trainer, epoch, params, constants, metrics)``
    after each epoch (the hook used by the sampling callback,
    reference ``callbacks.py:48-65``).
    """

    def __init__(
        self,
        model,
        scheduler: SDE,
        *,
        max_epochs: int = 200,
        lr_max: float = 1e-3,
        gradient_clip_val: float = 1.0,
        likelihood_weighting: bool = False,
        seed: int = 42,
        mesh: Optional[Mesh] = None,
        callbacks: tuple = (),
        metrics_writer=None,
        save_last_dir=None,
        accumulate_grad_batches: int = 1,
        ema_decay: float = 0.0,
        spike_rollback_factor: float = 2.5,
        spike_rollback_retries: int = 2,
        save_last_every_n: int = 1,
        val_noise_draws: int = 4,
        init_seed: Optional[int] = None,
        perm_salt: int = 0,
    ) -> None:
        self.model = model
        self.scheduler = scheduler
        self.max_epochs = max_epochs
        self.lr_max = lr_max
        self.gradient_clip_val = gradient_clip_val
        self.likelihood_weighting = likelihood_weighting
        self.seed = seed
        self.mesh = mesh
        self.callbacks = callbacks
        self.metrics_writer = metrics_writer
        self.save_last_dir = save_last_dir
        # Write the preemption-safe full `last` state every n-th epoch
        # (VERDICT r03 weak #7: every-epoch was the hardcoded default).
        # The final epoch is always saved so `checkpoint=last` and
        # `resume=` see the finished run regardless of n.
        self.save_last_every_n = max(1, int(save_last_every_n))
        self.accumulate_grad_batches = accumulate_grad_batches
        # EMA of the weights (a deviation from the reference, which has
        # no EMA; standard practice for score-based diffusion). When
        # enabled, validation, sampling callbacks and checkpoints all
        # use the averaged weights; raw weights keep training.
        self.ema_decay = float(ema_decay)
        # Loss-spike rollback guard (deviation from the reference, which
        # has no failure handling at all — SURVEY.md §5 item 3): a rare
        # knife-edge optimizer event can permanently derail a run (the
        # seed-44 fused collapse, RESULTS.md: one poisoned epoch pinned
        # the loss 4x high for 480 epochs; fused==autodiff grads and a
        # clean mask stream — pure stochastic-stream luck). When a
        # trained epoch's loss exceeds ``spike_rollback_factor`` x the
        # recent median, rewind to a pre-spike snapshot and continue
        # under a perturbed per-epoch RNG stream (same distribution).
        # 0 disables.
        self.spike_rollback_factor = float(spike_rollback_factor)
        self.spike_rollback_retries = int(spike_rollback_retries)
        # Validation (t, z) noise is a FIXED set of draws reused at every
        # epoch (averaged over this many independent draws), so the
        # per-epoch val loss is comparable across epochs and
        # ``argmin val_loss`` selects weights, not a lucky noise draw.
        # The old estimator redrew noise per epoch from a key shared by
        # every run with the same seed — late-training noise (sigma ~7%
        # of the tail mean on the flagship) exceeded real epoch-to-epoch
        # differences, and all three committed 600-epoch runs "selected"
        # the same epoch 488 because the shared draw was easiest there.
        self.val_noise_draws = max(1, int(val_noise_draws))
        # Knife-edge mechanism probes (RESULTS.md "Divergence rate"):
        # ``init_seed`` swaps ONLY the parameter init (data, data order,
        # dropout/noise streams stay on ``seed``); ``perm_salt`` shuffles
        # ONLY the epoch data order (init, dropout/noise unchanged).
        # Defaults leave every committed run's trajectory bit-identical.
        self.init_seed = init_seed
        self.perm_salt = int(perm_salt)
        self.num_training_steps: int = 0
        self.state: Optional[TrainStateBundle] = None

    # -- functional core ---------------------------------------------------
    def _use_fused_train(self) -> bool:
        """Fused training forward (one Pallas program per layer, custom
        VJP — ``ops/fused_encoder_train.py``) for transformer score
        networks: measured 44.2 vs 25.4 steps/s at R=1 on the flagship
        config. DEFAULT ON on TPU since round 3: the one long-run
        collapse (seed 44, epoch 119) was root-caused to a rare
        knife-edge in the training dynamics triggered by one specific
        valid stochastic stream — NOT a kernel defect (fused==autodiff
        grads at the event states; only the exact original stream
        collapses, all perturbed fused and unfused streams train clean;
        RESULTS.md "fused-training collapse: root cause"). The
        loss-spike rollback guard recovers such events automatically.
        FDIFF_FUSED_TRAIN=0 forces off, =1 forces on (any backend)."""
        import os

        from fourierdiffusion_tpu.models.score_models import ScoreTransformer

        env = os.environ.get("FDIFF_FUSED_TRAIN")
        if env == "0":
            return False
        want = env == "1" or jax.default_backend() == "tpu"
        return want and isinstance(self.model, ScoreTransformer)

    def _loss(self, params, constants, batch: DiffusableBatch, key, train: bool):
        if train:
            drop_key, loss_key = jax.random.split(key)
            rngs = {"dropout": drop_key}
        else:
            loss_key = key
            rngs = None

        if train and self._use_fused_train():
            from fourierdiffusion_tpu.models.fused import (
                fused_score_training_forward,
            )

            def score_fn(b: DiffusableBatch) -> Array:
                return fused_score_training_forward(
                    self.model, params, constants, b.X, b.timesteps, drop_key
                )

        else:

            def score_fn(b: DiffusableBatch) -> Array:
                return self.model.apply(
                    {"params": params, "constants": constants},
                    b.X,
                    b.timesteps,
                    deterministic=not train,
                    rngs=rngs,
                )

        return sde_loss(
            score_fn,
            self.scheduler,
            batch,
            loss_key,
            likelihood_weighting=self.likelihood_weighting,
        )

    def _make_epoch_fns(self, optimizer: optax.GradientTransformation):
        ema_decay = self.ema_decay

        def train_step(state: TrainStateBundle, batch_x: Array, key: Array):
            batch = DiffusableBatch(X=batch_x)
            loss, grads = jax.value_and_grad(self._loss)(
                state.params, state.constants, batch, key, True
            )
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            if ema_decay > 0.0:
                # Warmed-up decay min(decay, (1+t)/(10+t)): the EMA is
                # initialized at the init weights, so a fixed 0.999 decay
                # would keep it biased toward init for ~1/(1-decay) steps
                # — longer than a short run (the 60-epoch head-to-head is
                # 960 steps). The warmup tracks params early (~t/10-step
                # horizon) and reaches the configured decay by t≈1e4,
                # leaving long runs unchanged. Classic zero-debias
                # alternative to storing a step-corrected average.
                t = state.step.astype(jnp.float32) + 1.0
                d = jnp.minimum(ema_decay, (1.0 + t) / (10.0 + t))
                ema = jax.tree_util.tree_map(
                    lambda e, p: d * e + (1.0 - d) * p,
                    state.ema_params,
                    params,
                )
            else:
                ema = state.ema_params
            return (
                TrainStateBundle(
                    params, state.constants, opt_state, state.step + 1, ema
                ),
                loss,
            )

        data_spec = P("data") if self.mesh is not None else None

        def train_epoch(state: TrainStateBundle, x_all: Array, perm: Array, key: Array):
            """One epoch as a single scan: perm is (steps, B) indices."""

            def body(state, inputs):
                idx, step_key = inputs
                batch_x = x_all[idx]
                if self.mesh is not None:
                    batch_x = jax.lax.with_sharding_constraint(
                        batch_x, NamedSharding(self.mesh, data_spec)
                    )
                state, loss = train_step(state, batch_x, step_key)
                return state, loss

            keys = jax.random.split(key, perm.shape[0])
            state, losses = jax.lax.scan(body, state, (perm, keys))
            return state, jnp.mean(losses)

        def eval_epoch(state: TrainStateBundle, x_all: Array, perm: Array, key: Array):
            eval_params = state.ema_params if ema_decay > 0.0 else state.params

            def body(_, inputs):
                idx, step_key = inputs
                loss = self._loss(
                    eval_params, state.constants, DiffusableBatch(X=x_all[idx]),
                    step_key, False,
                )
                return None, loss

            keys = jax.random.split(key, perm.shape[0])
            _, losses = jax.lax.scan(body, None, (perm, keys))
            return jnp.mean(losses)

        donate = {"donate_argnums": (0,)}
        if self.mesh is not None:
            replicated = NamedSharding(self.mesh, P())
            train_epoch = jax.jit(
                train_epoch,
                in_shardings=(replicated, replicated, replicated, replicated),
                out_shardings=(replicated, replicated),
                **donate,
            )
            eval_epoch = jax.jit(eval_epoch, out_shardings=replicated)
        else:
            train_epoch = jax.jit(train_epoch, **donate)
            eval_epoch = jax.jit(eval_epoch)
        return train_epoch, eval_epoch

    @staticmethod
    def _epoch_permutation(key: Array, n: int, batch_size: int) -> Array:
        """(steps, B) wrap-around permutation covering every sample."""
        steps = -(-n // batch_size)
        perm = jax.random.permutation(key, n)
        pad = steps * batch_size - n
        if pad:
            perm = jnp.concatenate([perm, perm[:pad]])
        return perm.reshape(steps, batch_size)

    # -- fit ---------------------------------------------------------------
    def fit(
        self,
        datamodule: Datamodule,
        *,
        init_variables: Optional[FrozenDict] = None,
        resume_from: Any = None,
    ) -> TrainStateBundle:
        train_split = datamodule.train_arrays()
        val_split = datamodule.val_arrays()
        x_train = train_split.standardized()
        x_val = val_split.standardized()
        n = x_train.shape[0]
        steps_per_epoch = datamodule.steps_per_epoch
        # Optimizer steps (reference extraction.py:12-17): micro-steps /
        # accumulation factor scales the LR schedule length.
        self.num_training_steps = (
            steps_per_epoch * self.max_epochs // self.accumulate_grad_batches
        )

        key = jax.random.PRNGKey(self.seed)
        init_key, fit_key = jax.random.split(key)
        if self.init_seed is not None:
            init_key, _ = jax.random.split(jax.random.PRNGKey(self.init_seed))

        if init_variables is None:
            dummy_t = jnp.zeros((1,), x_train.dtype)
            init_variables = self.model.init(init_key, x_train[:1], dummy_t)
        # Copy: the epoch program donates the state buffers, which must
        # not invalidate the caller's arrays.
        params = jax.tree_util.tree_map(jnp.copy, init_variables["params"])
        constants = jax.tree_util.tree_map(
            jnp.copy, init_variables.get("constants", {})
        )

        optimizer = make_optimizer(
            self.lr_max,
            self.num_training_steps,
            gradient_clip_val=self.gradient_clip_val,
        )
        if self.accumulate_grad_batches > 1:
            optimizer = optax.MultiSteps(
                optimizer, every_k_schedule=self.accumulate_grad_batches
            )
        schedule = cosine_warmup_schedule(self.lr_max, self.num_training_steps)
        ema0 = (
            jax.tree_util.tree_map(jnp.copy, params) if self.ema_decay > 0.0 else {}
        )
        state = TrainStateBundle(
            params, constants, optimizer.init(params), jnp.zeros((), jnp.int32), ema0
        )

        start_epoch = 0
        if resume_from is not None:
            from fourierdiffusion_tpu.utils.checkpoint import restore_train_state

            state, start_epoch = restore_train_state(resume_from, state)
            logger.info("Resumed training state from %s (epoch %d)", resume_from, start_epoch)

        train_epoch, eval_epoch = self._make_epoch_fns(optimizer)

        if self.mesh is not None:
            from fourierdiffusion_tpu.parallel.distributed import replicate_to_mesh

            replicated = NamedSharding(self.mesh, P())
            # Multi-host safe: every process contributes its full local
            # copy (identical across processes by seeding).
            state = replicate_to_mesh(state, replicated)
            x_train = replicate_to_mesh(x_train, replicated)
            x_val = replicate_to_mesh(x_val, replicated)

        n_val = x_val.shape[0]
        val_perm = jnp.arange(-(-n_val // datamodule.batch_size) * datamodule.batch_size) % n_val
        val_perm = val_perm.reshape(-1, datamodule.batch_size)
        # Fixed validation noise: one epoch-independent key, split into
        # ``val_noise_draws`` draws that every epoch reuses (see
        # ``__init__``). The salt only has to differ from the epoch
        # integers folded into ``fit_key`` below.
        val_keys = jax.random.split(
            jax.random.fold_in(fit_key, 0x76616C), self.val_noise_draws
        )

        history = []
        # Spike-rollback guard state: a 2-deep ring of on-device state
        # snapshots (damage can begin in the epoch BEFORE the visible
        # spike — the seed-44 event poisoned epoch 118 but only epoch
        # 119's mean crossed a threshold — so rewind 2 epochs), a recent-
        # loss window for the median, and a stream salt folded into every
        # subsequent epoch key after a rollback so the retried epochs see
        # fresh (identically distributed) dropout masks and noise draws.
        guard_on = self.spike_rollback_factor > 0.0
        snapshots: deque = deque(maxlen=2)
        recent: deque = deque(maxlen=10)
        stream_salt = 0
        rollbacks_used = 0
        epoch = start_epoch
        while epoch < self.max_epochs:
            ekey = jax.random.fold_in(fit_key, epoch)
            if stream_salt:
                ekey = jax.random.fold_in(ekey, stream_salt)
            # The 3-way split predates the fixed-noise val estimator; the
            # third key is unused but kept so perm/scan streams (and
            # therefore every committed run's training trajectory) stay
            # bit-identical.
            perm_key, scan_key, _legacy_val_key = jax.random.split(ekey, 3)
            if self.perm_salt:
                perm_key = jax.random.fold_in(perm_key, self.perm_salt)
            perm = self._epoch_permutation(perm_key, n, datamodule.batch_size)
            if guard_on:
                snapshots.append(
                    (epoch, jax.tree_util.tree_map(jnp.copy, state))
                )
            t0 = time.perf_counter()
            state, train_loss = train_epoch(state, x_train, perm, scan_key)
            val_loss = jnp.mean(
                jnp.stack([eval_epoch(state, x_val, val_perm, vk) for vk in val_keys])
            )
            train_loss = float(train_loss)
            val_loss = float(val_loss)
            if (
                guard_on
                and len(recent) >= 5
                and (
                    not math.isfinite(train_loss)
                    or train_loss
                    > self.spike_rollback_factor * statistics.median(recent)
                )
            ):
                if rollbacks_used < self.spike_rollback_retries:
                    rollbacks_used += 1
                    stream_salt += 1
                    rewind_epoch, snap = snapshots.popleft()
                    snapshots.clear()
                    logger.warning(
                        "loss spike at epoch %d (train/loss=%.4g vs recent "
                        "median %.4g): rolling back to epoch %d with a "
                        "perturbed RNG stream (rollback %d/%d)",
                        epoch, train_loss, statistics.median(recent),
                        rewind_epoch, rollbacks_used,
                        self.spike_rollback_retries,
                    )
                    if self.metrics_writer is not None:
                        self.metrics_writer.log(
                            {
                                "rollback_from_epoch": epoch,
                                "rollback_to_epoch": rewind_epoch,
                                "spike_train_loss": train_loss,
                            },
                            step=int(snap.step),
                        )
                    state = snap
                    # Drop records of the discarded trajectory (the
                    # rewound epochs re-run and re-record).
                    history = [h for h in history if h["epoch"] < rewind_epoch]
                    epoch = rewind_epoch
                    continue
                logger.warning(
                    "loss spike at epoch %d persists after %d rollbacks; "
                    "continuing without intervention",
                    epoch, rollbacks_used,
                )
            recent.append(train_loss)
            dt = time.perf_counter() - t0
            lr = float(schedule(int(state.step)))
            metrics = {
                "train/loss": train_loss,
                "val/loss": val_loss,
                "lr": lr,
                "epoch": epoch,
                "step": int(state.step),
                "steps_per_sec": steps_per_epoch / dt,
            }
            if stream_salt:
                metrics["stream_salt"] = stream_salt
            history.append(metrics)
            from fourierdiffusion_tpu.parallel.distributed import is_primary

            if self.metrics_writer is not None and is_primary():
                self.metrics_writer.log(metrics, step=int(state.step))
            if epoch % 10 == 0 or epoch + 1 == self.max_epochs:
                logger.info(
                    "epoch %d: train/loss=%.4f val/loss=%.4f lr=%.2e (%.2fs)",
                    epoch, train_loss, val_loss, lr, dt,
                )
            eval_params = state.ema_params if self.ema_decay > 0.0 else state.params
            for cb in self.callbacks:
                cb(self, epoch, eval_params, state.constants, metrics)
            if (
                self.save_last_dir is not None
                and is_primary()
                and (
                    epoch % self.save_last_every_n == 0
                    or epoch + 1 == self.max_epochs
                )
            ):
                from fourierdiffusion_tpu.utils.checkpoint import save_train_state

                save_train_state(self.save_last_dir, state, epoch)
            epoch += 1

        self.state = state
        self.history = history
        return state
