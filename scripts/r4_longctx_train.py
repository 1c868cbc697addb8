"""Long-context END-TO-END training on-chip: 16,384-token CurveViT.

RESULTS.md demonstrates the >8k streaming-flash band at the kernel
level (fwd to 32k, streaming backward pair, this round's bk=2048
retune) and full-model training to 4,096 tokens; nothing yet shows a
complete train step (fwd + bwd + AdamW + in-graph mixing) at 16k
tokens.  This measures it: CurveViT hilbert, image 128 / patch 1 →
16,384 tokens (the reference's 1D-pixel-tokenizer thesis geometry
scaled up — `/root/reference/src/tokenizers/_1D/hilbert_embedding1D.py`
tokenizes pixels along the curve), dim 384 / depth 4 / heads 6 /
dh 64, bf16, remat=True (jax.checkpoint per block — at 16k the saved
activations would otherwise dominate HBM).

Arms (one process, shared harness — deltas are real):
  * flash    — attn_impl='auto' → streaming flash, bk=2048 backward
               (16384 % 2048 == 0, results/r4_stream_bwd_blocks.json)
  * local    — curve-local windowed attention (block 128, halo 1):
               the O(N·w) regime the SFC-locality thesis earns
  * merge    — flash + curve_pair_merge_topk r=0.5 at layer 1 (the
               measured 4k winner, results/r4_token_merge_ab.json)

No dense-XLA arm: b2·h6·16384² fp32 logits ≈ 25 GB — OOMs HBM, and an
eager HBM OOM can wedge the remote backend (CLAUDE.md).

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r4_longctx_train.py > /tmp/r4_longctx.log 2>&1 &
"""

from __future__ import annotations

import json
import time

import numpy as np

OUT = "results/r4_longctx_train.json"
BATCH = 2
IMAGE = 128  # patch 1 -> 128*128 = 16,384 tokens
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
    x = jnp.asarray(
        rng.standard_normal((BATCH, IMAGE, IMAGE, 3)), jnp.float32
    )
    y = jnp.zeros((BATCH,), jnp.int32)
    n_tokens = IMAGE * IMAGE

    def arm(name, **model_kw):
        t0 = time.time()
        try:
            model = CurveViT(
                curve="hilbert", image_size=IMAGE, patch_size=1,
                num_classes=100, dim=384, depth=4, heads=6,
                mlp_dim=1536, dim_head=64, dtype=jnp.bfloat16,
                remat=True, **model_kw,
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
                "images_per_sec": round(BATCH * total / sec, 2),
                "tokens_per_sec": round(
                    BATCH * n_tokens * total / sec
                ),
                "loss_after_warm_chain": round(loss0, 4),
            }
            print(f"-> {name}: {results[name]} "
                  f"(wall {time.time() - t0:.0f}s)", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:200] if str(e) else repr(e)
            results[name] = f"FAIL: {type(e).__name__}: {msg}"
            print(f"-> {name}: {results[name]}", flush=True)
        save()

    arm("flash_16k", attn_impl="auto")
    arm("local_16k", attn_impl="local")
    arm("merge_16k", attn_impl="auto",
        merge_layers=(1,), merge_ratio=0.5)
    print("done.", flush=True)


if __name__ == "__main__":
    main()
