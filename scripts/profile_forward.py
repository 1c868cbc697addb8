"""Profile the ViT-B/16 forward on-chip and print top device ops.

Captures a jax.profiler trace around the bench's device-side scan and
aggregates XLA op durations from the perfetto trace.json.gz, so the
next bottleneck is data, not guesswork.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_forward.py
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
from collections import defaultdict

import numpy as np


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--attn-impl", default="auto")
    p.add_argument("--outdir", default="/tmp/prof_fwd")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--train", action="store_true",
                   help="profile the full training step instead")
    p.add_argument("--preset", default=None,
                   help="registry preset (e.g. 'flagship') instead of "
                        "the bench ViT-B/16")
    p.add_argument("--num-classes", type=int, default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    sys.path.insert(0, "/root/repo")

    if args.preset:
        from sfc_vit_tpu.registry import preset_config, build_model

        cfg = preset_config(
            args.preset, dtype="bfloat16", attn_impl=args.attn_impl
        )
        model = build_model(cfg)
        img = cfg.img_size
        n_classes = args.num_classes or cfg.num_classes
    else:
        from bench import _build

        model = _build("hilbert", False, args.attn_impl, jnp.bfloat16)
        img = 224
        n_classes = args.num_classes or 1000
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch_size, img, img, 3)
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
        step = make_train_step(num_classes=n_classes, schedule=sched)
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
    else:

        @jax.jit
        def run(p, v):
            def body(carry, _):
                out = model.apply({"params": p}, v + carry * 1e-24)
                return out.mean().astype(v.dtype), None

            c, _ = lax.scan(body, jnp.zeros((), v.dtype), None,
                            length=args.iters)
            return c

        f = lambda: np.asarray(jax.device_get(run(params, x)))

    f()  # compile + warm
    with jax.profiler.trace(args.outdir):
        f()

    # Aggregate device-op durations from the perfetto trace.
    paths = sorted(glob.glob(
        f"{args.outdir}/**/*trace.json.gz", recursive=True
    ))
    if not paths:
        sys.exit(f"no trace.json.gz under {args.outdir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    by_name = defaultdict(float)
    total = 0.0
    # Restrict to TPU device tracks (pid names containing 'TPU'/'Chip').
    dev_pids = {
        e["pid"] for e in trace["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and any(t in str(e.get("args", {}).get("name", ""))
                for t in ("TPU", "Chip", "device"))
    }
    for e in trace["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            d = float(e.get("dur", 0))
            by_name[e.get("name", "?")] += d
            total += d
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[: args.top]
    print(json.dumps({
        "attn_impl": args.attn_impl,
        "total_device_us": total,
        "top_ops": [
            {"name": n[:100], "us": round(us, 1),
             "pct": round(100 * us / total, 2)}
            for n, us in top
        ],
    }, indent=1))


if __name__ == "__main__":
    main()
