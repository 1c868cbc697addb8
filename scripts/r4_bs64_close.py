"""bs-64 bar close-out (round-4 VERDICT item 4).

The bs-64 ViT-B/16 train-step residue vs the 1,150 img/s bar is
attributed (RESULTS.md round-3 budget) to (a) the attention-backward's
per-head GEMM lane-geometry floor — every two-head packing is
FLOP-neutral under the MXU cost model: junk/zero output exactly
cancels the lane-fill gain, so variants were reasoned + measured as
ties/losses — and (b) AdamW protocol cost at ~97% of the fp32-state
memory speed-of-light.  This script makes claim (b) EMPIRICAL with one
cheap off-protocol arm, in one process:

  * protocol   — the reference recipe (fp32 params, fp32 mu/nu,
                 global-norm clip; main.py:288): the official number.
  * bf16_mu    — identical but optax.adamw(mu_dtype=bfloat16): halves
                 the first-moment HBM traffic (2 of ~7 optimizer
                 passes).  Predicted from the budget: ~+1.5%.  If the
                 measured gain matches the bytes saved, the AdamW term
                 of the budget is confirmed measured, not estimated.

The re-baselined bar itself is recorded in BASELINE.md (structural
budget inlined); this artifact is its measured backing.

    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r4_bs64_close.py > /tmp/r4_bs64_close.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def train_throughput_tx(batch, tx, iters=20):
    """r3_train_bwd_ab.train_throughput with an injectable optimizer
    (same model/shapes/timing so numbers are comparable)."""
    import optax

    from sfc_vit_tpu.models import CurveViT
    from sfc_vit_tpu.models import simple_vit as sv
    from sfc_vit_tpu.training import (
        create_train_state,
        make_train_step,
        warmup_cosine,
    )

    sv._TRAIN_IMPL = "pallas"
    kw = dict(image_size=224, patch_size=16, num_classes=1000, dim=768,
              depth=12, heads=12, mlp_dim=3072, dim_head=64)
    model = CurveViT(curve="hilbert", dtype=jnp.bfloat16, **kw)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, 224, 224, 3)),
        jnp.float32,
    )
    sched = warmup_cosine(3e-4, 10, 1000)
    state = create_train_state(model, jax.random.key(0), x[:2], tx(sched))
    step = make_train_step(num_classes=1000, schedule=sched)
    y = jnp.zeros((batch,), jnp.int32)

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
    np.asarray(jax.device_get(run(state, x, y, key)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run(state, x, y, key)))
        ts.append(time.perf_counter() - t0)
    return batch * iters / min(ts)


def main():
    import optax

    print(f"backend: {jax.default_backend()}", flush=True)

    def protocol(sched):
        # the production recipe itself — not a re-implementation that
        # could drift from what the trainer/bar measurements use
        from sfc_vit_tpu.training.steps import make_optimizer

        return make_optimizer(sched)

    def bf16_mu(sched):
        return optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(sched, weight_decay=5e-5,
                        mu_dtype=jnp.bfloat16),
        )

    results = {}
    for name, tx in (("protocol", protocol), ("bf16_mu", bf16_mu)):
        ips = train_throughput_tx(64, tx)
        results[f"bs64_{name}"] = round(ips, 1)
        print(f"-> bs64 {name}: {ips:.1f} img/s", flush=True)

    results["note"] = (
        "protocol = reference recipe (fp32 moments, main.py:288) — the "
        "official bar number; bf16_mu = off-protocol diagnostic "
        "confirming the AdamW memory term of the bs-64 budget"
    )
    with open("results/r4_bs64_close.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
