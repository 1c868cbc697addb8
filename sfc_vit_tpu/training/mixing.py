"""In-graph mixup / cutmix with JAX PRNG (TPU-resident, jit-safe).

The reference draws per-batch Beta lambda and box coordinates with host
numpy (``train.py:7-47``), forcing host sync every step.  Here both
augmentations run inside the jitted train step with threaded PRNG keys:
static shapes, mask-based cutmix boxes (no dynamic slicing), fully
deterministic and replayable.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["mixup", "cutmix", "mix_or_cutmix"]

MixOut = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]


def _beta(key, alpha: float) -> jnp.ndarray:
    if alpha <= 0:
        return jnp.float32(1.0)
    return jax.random.beta(key, alpha, alpha, dtype=jnp.float32)


def mixup(key, x: jnp.ndarray, y: jnp.ndarray, alpha: float = 0.2) -> MixOut:
    """Convex combo of the batch with a shuffled copy of itself.

    Reference ``mixup_data`` (``train.py:7-14``).  Returns
    (mixed_x, y_a, y_b, lam).
    """
    k_lam, k_perm = jax.random.split(key)
    lam = _beta(k_lam, alpha)
    idx = jax.random.permutation(k_perm, x.shape[0])
    mixed = lam * x + (1.0 - lam) * x[idx]
    return mixed.astype(x.dtype), y, y[idx], lam


def cutmix(key, x: jnp.ndarray, y: jnp.ndarray, alpha: float = 1.0) -> MixOut:
    """Paste a random box from a shuffled copy; lambda corrected by the
    actual box area (reference ``cutmix_data``/``rand_bbox``,
    ``train.py:17-47``).  x is NHWC; the box is realized as a static-shape
    boolean mask (TPU-friendly, no dynamic slice).
    """
    k_lam, k_perm, k_cx, k_cy = jax.random.split(key, 4)
    b, h, w, _ = x.shape
    lam = _beta(k_lam, alpha)
    idx = jax.random.permutation(k_perm, b)

    cut_rat = jnp.sqrt(1.0 - lam)
    cut_w = (w * cut_rat).astype(jnp.int32)
    cut_h = (h * cut_rat).astype(jnp.int32)
    cx = jax.random.randint(k_cx, (), 0, w)
    cy = jax.random.randint(k_cy, (), 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)

    cols = jnp.arange(w)[None, :]
    rows = jnp.arange(h)[:, None]
    mask = ((rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2))
    mixed = jnp.where(mask[None, :, :, None], x[idx], x)

    area = ((x2 - x1) * (y2 - y1)).astype(jnp.float32)
    lam_adj = 1.0 - area / float(h * w)
    return mixed, y, y[idx], lam_adj


def mix_or_cutmix(
    key,
    x: jnp.ndarray,
    y: jnp.ndarray,
    mixup_alpha: float = 0.2,
    cutmix_alpha: float = 1.0,
    mix_prob: float = 0.5,
) -> MixOut:
    """Coin-flip between mixup and cutmix (``train.py:148-151``)."""
    k_coin, k_aug = jax.random.split(key)
    use_mixup = jax.random.uniform(k_coin) < mix_prob
    return jax.lax.cond(
        use_mixup,
        lambda k: mixup(k, x, y, mixup_alpha),
        lambda k: cutmix(k, x, y, cutmix_alpha),
        k_aug,
    )
