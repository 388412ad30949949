"""Optimizer and LR schedule.

Reference training recipe (``score_models.py:122-130`` +
``conf/trainer/default.yaml``): AdamW at ``lr_max`` with a per-step
cosine schedule, linear warmup over ``num_training_steps // 10`` steps
(diffusers ``get_cosine_schedule_with_warmup``), and global-norm
gradient clipping at 1.0 (Lightning ``gradient_clip_val``).
"""

from __future__ import annotations

import optax


def cosine_warmup_schedule(lr_max: float, num_training_steps: int) -> optax.Schedule:
    """Linear warmup (10%) then cosine decay to zero."""
    num_warmup = num_training_steps // 10
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr_max,
        warmup_steps=max(1, num_warmup),
        decay_steps=max(2, num_training_steps),
        end_value=0.0,
    )


def make_optimizer(
    lr_max: float,
    num_training_steps: int,
    *,
    gradient_clip_val: float = 1.0,
    weight_decay: float = 0.01,  # torch AdamW default
) -> optax.GradientTransformation:
    schedule = cosine_warmup_schedule(lr_max, num_training_steps)
    return optax.chain(
        optax.clip_by_global_norm(gradient_clip_val),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay),
    )
