"""Tune the longctx-16k operating point: remat and batch size.

Follow-up to scripts/r4_longctx_train.py (flash 246.7 / merge 198.8 /
local 42.4 ms/step at bs 2, remat on).  The measured step is at its
kernel budget, and under remat every attention forward runs TWICE
(once forward, once recomputed in backward) — roughly +4.04 ms × bh/4
per layer from the scaling table, ~20% of the flash arm.  At bs 2 the
no-remat activation footprint (~0.5 GB of saved z/qkv) fits 16 GB HBM
easily, so remat may be pure overhead at this batch.  Also probes
batch 8 on the local arm (42 ms/step at bs 2 leaves dispatch/AdamW a
visible fraction; more batch amortizes it).

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r4_longctx_tune.py > /tmp/r4_lct.log 2>&1 &
"""

from __future__ import annotations

import json
import time

import numpy as np

OUT = "results/r4_longctx_tune.json"
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

    results: dict = {}

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
                **model_kw,
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

    # remat A/B at bs 2 (the r4_longctx_train arms were remat=True)
    arm("flash_bs2_noremat", 2, attn_impl="auto", remat=False)
    arm("local_bs2_noremat", 2, attn_impl="local", remat=False)
    # batch scaling on the winning local arm, both remat settings
    arm("local_bs8_noremat", 8, attn_impl="local", remat=False)
    arm("local_bs8_remat", 8, attn_impl="local", remat=True)
    # merge arm without remat (completes the bs-2 remat A/B)
    arm("merge_bs2_noremat", 2, attn_impl="auto", remat=False,
        merge_layers=(1,), merge_ratio=0.5)
    print("done.", flush=True)


if __name__ == "__main__":
    main()
