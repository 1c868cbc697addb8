"""End-to-end long-context CurveViT benchmark (4k-token family).

The reference's 1D pixel tokenizers top out at 1,024 tokens; this
framework's streaming flash + curve-local kernels target the 1k-32k
regime.  This measures a whole CurveViT (not an attention micro) at
4,096 tokens per image for each attention implementation, inference
and training step.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_long_context.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--patch-size", type=int, default=4)  # 4096 tokens
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--dim", type=int, default=384)
    p.add_argument("--heads", type=int, default=6)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--impls", nargs="+",
                   default=["xla", "pallas", "local"])
    p.add_argument("--train", action="store_true")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sfc_vit_tpu.models import CurveViT

    n_tokens = (args.image_size // args.patch_size) ** 2
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch_size, args.image_size, args.image_size, 3)
        ),
        jnp.bfloat16,
    )

    results = {}
    for impl in args.impls:
        model = CurveViT(
            curve="hilbert", image_size=args.image_size,
            patch_size=args.patch_size, num_classes=1000, dim=args.dim,
            depth=args.depth, heads=args.heads, mlp_dim=args.dim * 4,
            dim_head=64, dtype=jnp.bfloat16, attn_impl=impl,
        )
        params = model.init({"params": jax.random.key(0)}, x[:1])["params"]
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a,
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
                model, jax.random.key(0),
                x[:2].astype(jnp.float32), make_optimizer(sched),
            )
            step = make_train_step(num_classes=1000, schedule=sched)
            y = jnp.zeros((args.batch_size,), jnp.int32)
            xf = x.astype(jnp.float32)

            @jax.jit
            def run(state, xf, y, key):
                def body(c, i):
                    st, _ = c
                    st, m = step(st, (xf, y), jax.random.fold_in(key, i))
                    return (st, m["loss"]), None

                (st, loss), _ = lax.scan(
                    body, (state, jnp.float32(0)),
                    jnp.arange(args.iters),
                )
                return loss

            f = lambda: np.asarray(
                jax.device_get(run(state, xf, y, jax.random.key(1)))
            )
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

        f()  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        ips = args.batch_size * args.iters / min(ts)
        results[impl] = ips
        print(json.dumps({
            "model": "curvevit", "tokens": n_tokens, "impl": impl,
            "mode": "train" if args.train else "infer",
            "images_per_sec": round(ips, 1),
            "batch": args.batch_size, "depth": args.depth,
        }), flush=True)
    base = results.get("xla")
    if base:
        for impl, ips in results.items():
            print(f"# {impl}: {ips:.1f} img/s ({ips / base:.2f}x xla)",
                  file=sys.stderr)
    return results


if __name__ == "__main__":
    main()
