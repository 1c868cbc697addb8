"""On-chip gradient-accumulation A/B: throughput + peak-HBM cost.

One process (CLAUDE.md rule), ViT-B/16 hilbert full train step at a
FIXED global batch of 256 with grad_accum in {1, 2, 4}: same update
math (exact when dropout is off; family B has none), peak activation
memory ~1/A, and the measured img/s delta is the price of the scan's
serialization + the extra params-sized accumulator traffic.

    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r3_grad_accum_ab.py > /tmp/r3_grad_accum.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")


def _mem_stats():
    try:
        s = jax.local_devices()[0].memory_stats() or {}
        return {k: int(v) for k, v in s.items()
                if k in ("bytes_in_use", "peak_bytes_in_use")}
    except Exception:
        return {}


def train_throughput(batch, grad_accum, iters=20):
    from sfc_vit_tpu.models import CurveViT
    from sfc_vit_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
        warmup_cosine,
    )

    kw = dict(image_size=224, patch_size=16, num_classes=1000, dim=768,
              depth=12, heads=12, mlp_dim=3072, dim_head=64)
    model = CurveViT(curve="hilbert", dtype=jnp.bfloat16, **kw)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, 224, 224, 3)),
        jnp.float32,
    )
    sched = warmup_cosine(3e-4, 10, 1000)
    state = create_train_state(
        model, jax.random.key(0), x[:2], make_optimizer(sched)
    )
    step = make_train_step(num_classes=1000, schedule=sched,
                           grad_accum=grad_accum)
    # spread labels so the 20-step loss stays informative (all-zero
    # labels memorize to 0.0 and the recorded loss can't catch an
    # accumulation-math bug, e.g. a missing /A)
    y = jnp.arange(batch, dtype=jnp.int32) % 1000

    @jax.jit
    def run(state, xf, y, key):
        def body(carry, i):
            st, _ = carry
            st, metrics = step(st, (xf, y), jax.random.fold_in(key, i))
            return (st, metrics["loss"]), None

        (st, loss), _ = lax.scan(
            body, (state, jnp.float32(0)), jnp.arange(iters)
        )
        return loss

    key = jax.random.key(1)
    loss = float(np.asarray(jax.device_get(run(state, x, y, key))))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run(state, x, y, key)))
        ts.append(time.perf_counter() - t0)
    ips = batch * iters / min(ts)
    mem = _mem_stats()
    print(f"train bs={batch} A={grad_accum}: {ips:9.1f} img/s "
          f"loss={loss:.4f} mem={mem}", flush=True)
    return {"images_per_sec": round(ips, 1), "loss": round(loss, 4),
            **mem}


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    results = {}
    for a in (1, 2, 4):
        results[f"vitb16_bs256_accum{a}"] = train_throughput(256, a)
    with open("results/r3_grad_accum_ab.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
