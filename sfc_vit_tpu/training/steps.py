"""Jitted train / eval steps.

The reference's per-step host loop (``train.py:133-178``: H2D copy,
host-numpy mixup, autocast forward, ``loss.item()`` sync every step)
becomes a single jitted function: augmentation, forward, loss, backward,
clip, update and metrics all stay on device; the host only feeds batches
and reads metrics when it wants them.  Everything threads a PRNG key, so
runs are deterministic and replayable (the framework's answer to
SURVEY.md section 5 "race detection").
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from .losses import soft_target_cross_entropy
from .mixing import mix_or_cutmix

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_optimizer",
]


class TrainState(train_state.TrainState):
    """flax TrainState; kept as a named subclass for checkpoint clarity."""


def make_optimizer(
    schedule: optax.Schedule,
    weight_decay: float = 5e-5,
    grad_clip: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    """clip-by-global-norm 1.0 + AdamW, the reference recipe
    (``train.py:165``, ``main.py:288-289``)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay),
    )


def create_train_state(
    model,
    rng: jax.Array,
    sample_input: jnp.ndarray,
    tx: optax.GradientTransformation,
) -> TrainState:
    rngs = {"params": rng, "dropout": rng, "permute": rng}
    variables = model.init(rngs, sample_input, deterministic=True)
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )


def make_train_step(
    num_classes: int,
    mixup_alpha: float = 0.2,
    cutmix_alpha: float = 1.0,
    mix_prob: float = 0.5,
    use_mixing: bool = True,
    schedule: Optional[optax.Schedule] = None,
    dropout_key_impl: Optional[str] = "auto",
    grad_accum: int = 1,
) -> Callable:
    """Build the jitted train step.

    Returns ``step(state, batch, rng) -> (state, metrics)`` where batch
    is ``(images [B,H,W,C], labels [B])``.  Metrics: loss, the
    lambda-weighted accuracy of ``train.py:170-171``, and lr.

    ``grad_accum=A`` splits the batch into A equal microbatches and
    runs them through a ``lax.scan``, averaging gradients before the
    single optimizer update — peak activation memory drops to one
    microbatch's worth (one params-sized fp32 accumulator is added),
    so effective batch sizes beyond HBM fit on one chip.  Mixing is
    applied to the FULL batch first (one mixed-pair permutation and
    one lambda per step, exactly the A=1 semantics); with dropout
    disabled the update is bit-equivalent to the unaccumulated step
    (equal-size microbatches: mean-of-microbatch-grads == full-batch
    grad of the mean loss), with dropout each microbatch draws its own
    mask stream.  The reference has no equivalent (it fits batch 512
    on an H100, ``main.py:283``); this is standard large-batch
    framework capability.

    ``dropout_key_impl='rbg'`` re-wraps the dropout key in JAX's RBG
    PRNG: key *derivation* (flax's per-module ``fold_in``) stays
    threefry-strength, but mask *bits* come from the TPU hardware
    generator (``rng-bit-generator`` HLO) instead of the threefry
    counter network, which XLA otherwise fuses into every layer of the
    training graph (measured 25% of flagship train-step device time).
    Measured: flagship train 4,612 -> 6,244 img/s at batch 256 (+35%),
    +33% at the reference's batch 512 (one-process A/B,
    ``results/r3_flagship_dropout_ab.json``).  Dropout masks are
    different random masks — training numerics are equivalent, per-draw
    values are not.  The default ``'auto'`` resolves to ``'rbg'`` on
    TPU and threefry elsewhere (CPU reference numerics unchanged); the
    same-seed-same-run determinism guarantee holds either way on a
    fixed software stack (the RBG bitstream may change across compiler
    versions — pin ``'threefry'`` for cross-version replay).
    """
    if dropout_key_impl == "auto":
        dropout_key_impl = (
            "rbg" if jax.default_backend() == "tpu" else None
        )
    if grad_accum < 1:
        raise ValueError(f"grad_accum={grad_accum}: must be >= 1")

    def _wrap_drop(k_drop):
        if dropout_key_impl and dropout_key_impl != "threefry":
            # 4 words of the step key's output seed the cheap generator;
            # the expensive per-mask bit generation then runs on the
            # TPU's hardware RNG rather than as fused threefry
            # arithmetic.  random.bits (not key_data) so any incoming
            # key impl works -- rbg/unsafe_rbg keys carry 4-word
            # key_data and reshape(4) on a split pair would be wrong.
            kd = jax.random.bits(k_drop, (4,), jnp.uint32)
            return jax.random.wrap_key_data(kd, impl=dropout_key_impl)
        return k_drop

    def step(state: TrainState, batch: Tuple[jnp.ndarray, jnp.ndarray],
             rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        x, y = batch
        rng = jax.random.fold_in(rng, state.step)
        k_mix, k_drop, k_perm = jax.random.split(rng, 3)
        if use_mixing:
            x, y_a, y_b, lam = mix_or_cutmix(
                k_mix, x, y, mixup_alpha, cutmix_alpha, mix_prob
            )
        else:
            y_a = y_b = y
            lam = jnp.float32(1.0)

        def loss_fn(params, xm, ya, yb, kd):
            logits = state.apply_fn(
                {"params": params},
                xm,
                deterministic=False,
                # k_perm shared: one curve permutation per STEP, like A=1
                rngs={"dropout": kd, "permute": k_perm},
            )
            one_a = jax.nn.one_hot(ya, num_classes, dtype=jnp.float32)
            one_b = jax.nn.one_hot(yb, num_classes, dtype=jnp.float32)
            soft = lam * one_a + (1.0 - lam) * one_b
            return soft_target_cross_entropy(logits, soft), logits

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def _acc(preds, ya, yb):
            return (
                lam * (preds == ya).astype(jnp.float32)
                + (1.0 - lam) * (preds == yb).astype(jnp.float32)
            ).mean()

        if grad_accum == 1:
            (loss, logits), grads = grad_fn(
                state.params, x, y_a, y_b, _wrap_drop(k_drop)
            )
            acc = _acc(jnp.argmax(logits, axis=-1), y_a, y_b)
        else:
            b = x.shape[0]
            if b % grad_accum:
                raise ValueError(
                    f"batch size {b} not divisible by "
                    f"grad_accum={grad_accum}"
                )
            mb = b // grad_accum

            def _strided(a):
                # microbatch i = rows i::A (STRIDED, not contiguous):
                # under data-parallel batch sharding (contiguous
                # per-device blocks of b/D rows) each microbatch then
                # takes an equal slice from EVERY device's block, so
                # GSPMD keeps the split local — a contiguous
                # reshape(A, b/A) would put microbatch 0 entirely on
                # the first devices and force an all-to-all per step.
                # Partition choice doesn't affect the update (grads
                # are averaged over all microbatches).
                return jnp.moveaxis(
                    a.reshape(mb, grad_accum, *a.shape[1:]), 1, 0
                )

            xs = (
                _strided(x),
                _strided(y_a),
                _strided(y_b),
                jax.random.split(k_drop, grad_accum),
            )

            def body(g_sum, mbatch):
                xm, ya, yb, kd = mbatch
                (loss, logits), g = grad_fn(
                    state.params, xm, ya, yb, _wrap_drop(kd)
                )
                g_sum = jax.tree_util.tree_map(jnp.add, g_sum, g)
                return g_sum, (loss, _acc(jnp.argmax(logits, -1), ya, yb))

            g0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            g_sum, (losses, accs) = jax.lax.scan(body, g0, xs)
            grads = jax.tree_util.tree_map(
                lambda g: g / grad_accum, g_sum
            )
            loss, acc = losses.mean(), accs.mean()

        new_state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, "accuracy": acc}
        if schedule is not None:
            metrics["lr"] = schedule(state.step)
        return new_state, metrics

    return step


def make_eval_step(num_classes: int) -> Callable:
    """Build the eval step: ``step(state, batch) -> metrics`` with sum-
    reduced loss/correct counts so the host can aggregate exactly
    (reference ``evaluate``, ``train.py:80-99``).

    Rows with label ``-1`` are padding (``Trainer.evaluate`` pads the
    ragged final ``drop_last=False`` batch up to the data-axis
    multiple) and are excluded from every metric."""

    def step(state: TrainState, batch) -> Dict[str, jnp.ndarray]:
        x, y = batch
        logits = state.apply_fn(
            {"params": state.params},
            x,
            deterministic=True,
            # constant stream so random-curve ablation models also eval
            rngs={"permute": jax.random.key(0)},
        )
        valid = y >= 0
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        onehot = jax.nn.one_hot(y, num_classes)  # -1 -> all-zero row
        loss_sum = -(onehot * logp).sum()
        correct = ((jnp.argmax(logits, axis=-1) == y) & valid).sum()
        return {
            "loss_sum": loss_sum,
            "correct": correct,
            "count": valid.sum().astype(jnp.int32),
        }

    return step
