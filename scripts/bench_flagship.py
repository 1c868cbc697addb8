"""Flagship (VisionTransformer1D + HierarchicalMorton, main.py:269-314
equivalent) on-chip throughput: inference and train step.

Family A is the post-norm torch-parity stack; this grounds the
post-norm fused-block work the way bench.py grounds family B.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_flagship.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--batch-sweep", type=str, default=None,
                   help="comma-separated batch sizes measured in ONE "
                        "process (A/B discipline), e.g. 64,128,256")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--train", action="store_true")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.batch_sweep:
        for bs in args.batch_sweep.split(","):
            sub = ["--batch-size", bs, "--iters", str(args.iters)]
            if args.train:
                sub.append("--train")
            if args.platform:
                sub += ["--platform", args.platform]
            main(sub)
        return

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sfc_vit_tpu.registry import preset_config, build_model

    cfg = preset_config("flagship", dtype="bfloat16")
    model = build_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch_size, cfg.img_size, cfg.img_size, 3)
        ),
        jnp.bfloat16,
    )
    params = model.init({"params": jax.random.key(0)}, x[:1])["params"]
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params,
    )

    if args.train:
        from sfc_vit_tpu.training import (
            create_train_state,
            make_optimizer,
            make_train_step,
            warmup_cosine,
        )

        sched = warmup_cosine(3e-4, 10, 1000)
        state = create_train_state(
            model, jax.random.key(0), x[:2].astype(jnp.float32),
            make_optimizer(sched),
        )
        step = make_train_step(num_classes=cfg.num_classes, schedule=sched)
        y = jnp.zeros((args.batch_size,), jnp.int32)
        xf = x.astype(jnp.float32)

        @jax.jit
        def run(state, xf, y, key):
            def body(c, i):
                st, _ = c
                st, m = step(st, (xf, y), jax.random.fold_in(key, i))
                return (st, m["loss"]), None

            (st, loss), _ = lax.scan(
                body, (state, jnp.float32(0)), jnp.arange(args.iters)
            )
            return loss

        f = lambda: np.asarray(
            jax.device_get(run(state, xf, y, jax.random.key(1)))
        )
        mode = "train"
    else:

        @jax.jit
        def run(p, v):
            def body(c, _):
                out = model.apply({"params": p}, v + c * 1e-24)
                return out.mean().astype(v.dtype), None

            c, _ = lax.scan(body, jnp.zeros((), v.dtype), None,
                            length=args.iters)
            return c

        f = lambda: np.asarray(jax.device_get(run(params, x)))
        mode = "infer"

    f()  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    ips = args.batch_size * args.iters / min(ts)
    print(json.dumps({
        "model": "flagship-vit1d-hiermorton", "mode": mode,
        "images_per_sec": round(ips, 1), "batch": args.batch_size,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
