"""Losses (``main.py:45-51`` and standard CE)."""

from __future__ import annotations

import jax.numpy as jnp
import jax

__all__ = ["soft_target_cross_entropy", "cross_entropy", "mixup_criterion"]


def soft_target_cross_entropy(
    logits: jnp.ndarray, soft_targets: jnp.ndarray
) -> jnp.ndarray:
    """-(targets * log_softmax(logits)).sum(-1).mean() in fp32.

    Reference ``SoftTargetCrossEntropy`` (``main.py:45-51``), used with
    mixup/cutmix soft targets.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(soft_targets.astype(jnp.float32) * logp).sum(axis=-1).mean()


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean integer-label cross entropy in fp32 (eval criterion)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def mixup_criterion(criterion, pred, y_a, y_b, lam):
    """lam * L(pred, y_a) + (1 - lam) * L(pred, y_b).

    Reference ``mixup_criterion`` (``train.py:50-54``; notebook loops use
    it with hard labels).
    """
    return lam * criterion(pred, y_a) + (1.0 - lam) * criterion(pred, y_b)
