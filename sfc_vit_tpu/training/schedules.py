"""LR schedules (optax), matching both reference variants.

* :func:`warmup_cosine` -- the HF ``get_cosine_schedule_with_warmup``
  math the reference actually trains with (``main.py:306-314``):
  linear warmup to base, cosine to exactly 0.
* :func:`warmup_cosine_min_lr` -- the hand-rolled
  ``WarmupCosineScheduler`` (``src/training/scheduler.py:32-50``):
  linear warmup, cosine to a floor ``min_lr``.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

__all__ = ["warmup_cosine", "warmup_cosine_min_lr"]


def warmup_cosine(
    base_lr: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    """lr(t) = base * t/warmup, then base * 0.5 * (1 + cos(pi * progress))."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, total_steps - warmup_steps
        )
        progress = jnp.clip(progress, 0.0, 1.0)
        decay = base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule


def warmup_cosine_min_lr(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    min_lr: float = 1e-6,
) -> optax.Schedule:
    """Reference ``WarmupCosineScheduler.step`` math, as a pure schedule."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, total_steps - warmup_steps
        )
        progress = jnp.minimum(progress, 1.0)
        decay = min_lr + 0.5 * (base_lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * progress)
        )
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule
