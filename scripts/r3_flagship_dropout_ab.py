"""One-process A/B: flagship train step with threefry vs RBG dropout keys.

The flagship train-step profile (profile_forward.py --preset flagship
--train, RESULTS round 3) showed 25% of device time in fusions carrying
threefry counter arithmetic (dropout mask generation for the 0.1-rate
torch-parity encoder, reference vit.py:191), GEMM fusions dragged to
~90 TF/s by fused PRNG epilogues, and loop fusions at 4.6 TF/s.  This
probe measures, in ONE process (A/B discipline, CLAUDE.md):

  * threefry dropout (status quo)
  * dropout_key_impl='rbg' (hardware rng-bit-generator for mask bits)
  * dropout disabled (deterministic=True inside the loss) — upper bound

at batch 256 and 512 (512 = the reference main.py:283 batch size).

    PYTHONPATH=/root/.axon_site:/root/repo python \
        scripts/r3_flagship_dropout_ab.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch-sizes", default="256,512")
    p.add_argument("--platform", default=None)
    p.add_argument("--out", default="results/r3_flagship_dropout_ab.json")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sfc_vit_tpu.registry import preset_config, build_model
    from sfc_vit_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
        warmup_cosine,
    )

    cfg = preset_config("flagship", dtype="bfloat16")
    model = build_model(cfg)
    sched = warmup_cosine(3e-4, 10, 1000)

    rng = np.random.default_rng(0)
    init_x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    state = create_train_state(
        model, jax.random.key(0), init_x, make_optimizer(sched)
    )

    # 'nodrop': same threefry step but deterministic forward — bounds
    # what killing ALL dropout cost (PRNG + mask multiplies) would buy.
    import sfc_vit_tpu.training.steps as steps_mod

    def make_nodrop_step():
        base = make_train_step(num_classes=cfg.num_classes, schedule=sched)

        def step(state, batch, rng):
            x, y = batch
            rng = jax.random.fold_in(rng, state.step)
            k_mix, _, _ = jax.random.split(rng, 3)
            from sfc_vit_tpu.training.mixing import mix_or_cutmix
            from sfc_vit_tpu.training.losses import (
                soft_target_cross_entropy,
            )

            x, y_a, y_b, lam = mix_or_cutmix(k_mix, x, y, 0.2, 1.0, 0.5)

            def loss_fn(params):
                logits = state.apply_fn(
                    {"params": params}, x, deterministic=True,
                )
                one_a = jax.nn.one_hot(y_a, cfg.num_classes,
                                       dtype=jnp.float32)
                one_b = jax.nn.one_hot(y_b, cfg.num_classes,
                                       dtype=jnp.float32)
                soft = lam * one_a + (1.0 - lam) * one_b
                return soft_target_cross_entropy(logits, soft)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads=grads), {"loss": loss}

        return step

    variants = {
        "threefry": make_train_step(num_classes=cfg.num_classes,
                                    schedule=sched),
        "rbg": make_train_step(num_classes=cfg.num_classes, schedule=sched,
                               dropout_key_impl="rbg"),
        "nodrop": make_nodrop_step(),
    }

    results = {}
    for bs in (int(b) for b in args.batch_sizes.split(",")):
        xf = jnp.asarray(
            rng.standard_normal((bs, 32, 32, 3)), jnp.float32
        )
        y = jnp.asarray(rng.integers(0, cfg.num_classes, (bs,)), jnp.int32)
        for name, step in variants.items():

            @jax.jit
            def run(state, xf, y, key, _step=step):
                def body(c, i):
                    st, _ = c
                    st, m = _step(st, (xf, y), jax.random.fold_in(key, i))
                    return (st, m["loss"]), None

                (st, loss), _ = lax.scan(
                    body, (state, jnp.float32(0)), jnp.arange(args.iters)
                )
                return loss

            f = lambda: np.asarray(
                jax.device_get(run(state, xf, y, jax.random.key(1)))
            )
            loss = float(f())  # compile + warm
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                f()
                ts.append(time.perf_counter() - t0)
            ips = bs * args.iters / min(ts)
            key = f"{name}_bs{bs}"
            results[key] = round(ips, 1)
            print(json.dumps({"variant": key, "images_per_sec": round(ips, 1),
                              "final_loss": round(loss, 4)}), flush=True)

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
