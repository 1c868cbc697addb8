"""Hybrid local/global attention schedules at 16,384 tokens, on-chip.

The relational control (results/local_attention_relational.json)
proved pure curve-local attention cannot route information between
distant curve sites, and results/r4_longctx_tune.json measured pure
global flash at 5.7x the local step time at this length.  Per-layer
schedules (models/simple_vit._impl_schedule) are the fix; this
measures where the hybrid operating points land between the two
extremes on full train steps (fwd+bwd+AdamW+mixing), one process:

  * flash    — attn_impl='auto' (streaming flash everywhere)
  * local    — attn_impl='local' (window block 128, halo 1)
  * hybrid   — ('local','local','local','auto'): one global layer
  * hybrid_merge — the longctx-16k-hybrid preset point (merge r=.5@L1)

Geometry matches results/r4_longctx_train.json: CurveViT hilbert
128x128/patch 1 -> 16,384 tokens, dim 384 / depth 4 / heads 6, bf16,
no remat (measured a flat 21-27% loss at these batches), bs 2.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r4_hybrid_sched.py > /tmp/r4_hyb.log 2>&1 &
"""

from __future__ import annotations

import json
import time

import numpy as np

OUT = "results/r4_hybrid_sched.json"
IMAGE = 128
ITERS = 8
UNROLL = 4


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sfc_vit_tpu.models import CurveViT
    from sfc_vit_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
        warmup_cosine,
    )

    print(f"backend: {jax.default_backend()}", flush=True)
    assert jax.default_backend() == "tpu"

    results: dict = {
        "note": "full train step, bs 2, 16,384 tokens, bf16, no remat; "
                "K=8 steps scan-unrolled x4 device-side (same harness "
                "as results/r4_longctx_tune.json)"
    }

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    rng = np.random.default_rng(0)
    n_tokens = IMAGE * IMAGE

    def arm(name, batch, **model_kw):
        t0 = time.time()
        try:
            x = jnp.asarray(
                rng.standard_normal((batch, IMAGE, IMAGE, 3)),
                jnp.float32,
            )
            y = jnp.zeros((batch,), jnp.int32)
            model = CurveViT(
                curve="hilbert", image_size=IMAGE, patch_size=1,
                num_classes=100, dim=384, depth=4, heads=6,
                mlp_dim=1536, dim_head=64, dtype=jnp.bfloat16,
                remat=False, **model_kw,
            )
            sched = warmup_cosine(3e-4, 10, 1000)
            state = create_train_state(
                model, jax.random.key(0), x, make_optimizer(sched)
            )
            step = make_train_step(num_classes=100, schedule=sched)
            length = max(1, ITERS // UNROLL)
            total = length * UNROLL

            @jax.jit
            def run(state, xf, yy, key):
                def body(carry, i):
                    st, _ = carry
                    for k in range(UNROLL):
                        st, metrics = step(
                            st, (xf, yy),
                            jax.random.fold_in(key, i * UNROLL + k),
                        )
                    return (st, metrics["loss"]), None

                c, _ = lax.scan(
                    body, (state, jnp.zeros((), jnp.float32)),
                    jnp.arange(length),
                )
                return c[1]

            key = jax.random.key(1)
            loss0 = float(np.asarray(jax.device_get(run(state, x, y, key))))
            assert np.isfinite(loss0), loss0
            ts = []
            for _ in range(3):
                t1 = time.perf_counter()
                np.asarray(jax.device_get(run(state, x, y, key)))
                ts.append(time.perf_counter() - t1)
            sec = min(ts)
            results[name] = {
                "ms_per_step": round(sec / total * 1e3, 2),
                "images_per_sec": round(batch * total / sec, 2),
                "tokens_per_sec": round(batch * n_tokens * total / sec),
            }
            print(f"-> {name}: {results[name]} "
                  f"(wall {time.time() - t0:.0f}s)", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:200] if str(e) else repr(e)
            results[name] = f"FAIL: {type(e).__name__}: {msg}"
            print(f"-> {name}: {results[name]}", flush=True)
        save()

    hybrid = ("local", "local", "local", "auto")
    arm("flash_bs2", 2, attn_impl="auto")
    arm("local_bs2", 2, attn_impl="local")
    arm("hybrid_bs2", 2, attn_impl=hybrid)
    arm("hybrid_merge_bs2", 2, attn_impl=hybrid,
        merge_layers=(1,), merge_ratio=0.5)
    for k in ("flash_bs2", "local_bs2", "hybrid_bs2", "hybrid_merge_bs2"):
        v = results.get(k)
        if isinstance(v, dict) and isinstance(results.get("flash_bs2"), dict):
            v["vs_flash"] = round(
                v["images_per_sec"]
                / results["flash_bs2"]["images_per_sec"], 3)
    save()
    print("done.", flush=True)


if __name__ == "__main__":
    main()
