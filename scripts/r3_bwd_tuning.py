"""Round-3 backward-kernel tuning sweep (one process, bf16).

The r3_train_bwd_ab.py microbench accidentally promoted its inputs to
fp32 (f32 scalar carry + bf16 x); this probe measures the real bf16
production shapes and sweeps the backward tiling knobs:

  * fused-MLP backward: block_r in {128, 256, 512}
  * attention-block backward: block_b in {2, 4, 8}
  * honest bf16 fwd / fwd+bwd per-kernel times at the winners
  * train-step slice at bs 64 and 256 for the non-kernel remainder

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r3_bwd_tuning.py > /tmp/r3_tune.log 2>&1 &
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _time(fn, iters=10, reps=3):
    @jax.jit
    def run():
        def body(c, _):
            return fn(c), None

        c, _ = lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    np.asarray(jax.device_get(run()))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run()))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1e3  # ms


def main():
    from sfc_vit_tpu.ops.fused_attention_block import (
        _fused_attn_block,
        _fused_attn_block_bwd,
    )
    from sfc_vit_tpu.ops.fused_mlp import _fused_mlp, _fused_mlp_bwd

    print(f"backend: {jax.default_backend()}", flush=True)
    b, n, d, f, heads = 256, 208, 768, 3072, 12
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    x = mk(b, n, d)
    g = mk(b, n, d)
    lns, lnb = mk(d) * 0 + 1, mk(d) * 0
    w1, b1 = mk(d, f) / 28, mk(f) * 0
    w2, b2 = mk(f, d) / 55, mk(d) * 0
    wq, wo = mk(d, 3 * d) / 28, mk(d, d) / 28
    perturb = lambda c: (x + (c * 1e-24).astype(x.dtype))

    out = {}

    ms = _time(lambda c: _fused_mlp(
        perturb(c), lns, lnb, w1, b1, w2, b2,
        eps=1e-5, activation="gelu", residual=True,
    ).astype(jnp.float32).sum() * 1e-12)
    out["mlp_fwd"] = ms
    print(f"mlp fwd                 {ms:8.2f} ms", flush=True)

    for br in (128, 256, 512):
        def step(c, _br=br):
            grads = _fused_mlp_bwd(
                perturb(c), g, lns, lnb, w1, b1, w2,
                eps=1e-5, activation="gelu", residual=True, block_r=_br,
            )
            return sum(
                a.astype(jnp.float32).sum() for a in grads
            ) * 1e-12

        try:
            ms = _time(step)
        except Exception as e:  # VMEM overflow etc
            print(f"mlp bwd block_r={br}: {type(e).__name__}", flush=True)
            continue
        out[f"mlp_bwd_br{br}"] = ms
        print(f"mlp bwd  block_r={br:4d}  {ms:8.2f} ms", flush=True)

    ms = _time(lambda c: _fused_attn_block(
        perturb(c), lns, lnb, wq, wo,
        heads=heads, scale=64 ** -0.5, eps=1e-5, n_actual=196,
    ).astype(jnp.float32).sum() * 1e-12)
    out["attn_fwd"] = ms
    print(f"attn fwd                {ms:8.2f} ms", flush=True)

    for bb in (2, 4, 8):
        def step(c, _bb=bb):
            grads = _fused_attn_block_bwd(
                perturb(c), g, lns, lnb, wq, wo,
                heads=heads, scale=64 ** -0.5, eps=1e-5, block_b=_bb,
                n_actual=196,
            )
            return sum(
                a.astype(jnp.float32).sum() for a in grads
            ) * 1e-12

        try:
            ms = _time(step)
        except Exception as e:
            print(f"attn bwd block_b={bb}: {type(e).__name__}", flush=True)
            continue
        out[f"attn_bwd_bb{bb}"] = ms
        print(f"attn bwd block_b={bb:4d}  {ms:8.2f} ms", flush=True)

    with open("results/r3_bwd_tuning.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
