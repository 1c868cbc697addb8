"""One-process A/B: flagship train step, explicit-weights MHA vs the
fused torch-MHA Pallas kernel (ops/fused_torch_attention.py).

Baseline = the RBG-dropout state (results/r3_flagship_dropout_ab.json:
6,243.6 img/s @ bs256).  The fused kernel removes the BNHD layout
copies, the u32 mask relayout and the stored-probability residuals the
profile charged ~22% of the step to.  Also checks on-chip grad parity
of the kernel rule vs the XLA composition given the same mask.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/r3_mha_kernel_ab.py
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
    p.add_argument("--out", default="results/r3_mha_kernel_ab.json")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    from jax import lax

    import sfc_vit_tpu.models.layers as L
    from sfc_vit_tpu.registry import preset_config, build_model
    from sfc_vit_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
        warmup_cosine,
    )

    results = {}

    # --- on-chip kernel grad parity vs the XLA composition ---
    from sfc_vit_tpu.ops.fused_torch_attention import (
        fused_torch_mha, torch_mha_train,
    )

    rng = np.random.default_rng(0)
    b, n, d, h, keep = 8, 64, 768, 4, 0.9
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.bfloat16)
    w_in = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.05, jnp.bfloat16)
    b_in = jnp.zeros((3 * d,), jnp.bfloat16)
    w_out = jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.bfloat16)
    b_out = jnp.zeros((d,), jnp.bfloat16)
    mask = jax.random.bernoulli(
        jax.random.key(7), keep, (b, h, n, n)).astype(jnp.bfloat16)

    interp = jax.default_backend() != "tpu"  # CPU smoke: interpret mode

    def make(impl):
        @jax.jit
        def f(x, w_in, b_in, w_out, b_out):
            return (fused_torch_mha(
                x, w_in, b_in, w_out, b_out, mask, h, keep=keep,
                interpret=interp,
                train_impl=impl).astype(jnp.float32) ** 2).sum()
        return jax.grad(f, argnums=tuple(range(5)))

    g_pl = make("pallas")(x, w_in, b_in, w_out, b_out)
    g_xla = make("xla")(x, w_in, b_in, w_out, b_out)
    rels = {}
    for name, a, c in zip(("dx", "dwin", "dbin", "dwout", "dbout"),
                          g_pl, g_xla):
        a32 = np.asarray(a, np.float32)
        c32 = np.asarray(c, np.float32)
        rels[name] = float(
            np.linalg.norm(a32 - c32) / (np.linalg.norm(c32) + 1e-30))
    results["grad_rel_l2"] = rels
    print(json.dumps({"grad_rel_l2": rels}), flush=True)

    # --- throughput A/B ---
    cfg = preset_config("flagship", dtype="bfloat16")
    model = build_model(cfg)
    sched = warmup_cosine(3e-4, 10, 1000)
    init_x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    state = create_train_state(
        model, jax.random.key(0), init_x, make_optimizer(sched)
    )

    for bs in (int(s) for s in args.batch_sizes.split(",")):
        xf = jnp.asarray(rng.standard_normal((bs, 32, 32, 3)), jnp.float32)
        y = jnp.asarray(rng.integers(0, cfg.num_classes, (bs,)), jnp.int32)
        for fused in (False, True):
            L._FUSED_TRAIN_MHA = fused
            # distinct fn identity per variant: jit caches by identity
            # and _FUSED_TRAIN_MHA is a tracing-time switch
            step = make_train_step(num_classes=cfg.num_classes,
                                   schedule=sched)

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
                jax.device_get(run(state, xf, y, jax.random.key(1))))
            loss = float(f())
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                f()
                ts.append(time.perf_counter() - t0)
            ips = bs * args.iters / min(ts)
            key = f"{'fused' if fused else 'explicit'}_bs{bs}"
            results[key] = round(ips, 1)
            print(json.dumps({"variant": key,
                              "images_per_sec": round(ips, 1),
                              "final_loss": round(loss, 4)}), flush=True)
    L._FUSED_TRAIN_MHA = True

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
