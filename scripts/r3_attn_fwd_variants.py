"""Round-3 fused attention-block FORWARD squeeze A/B (VERDICT item 4).

The fwd kernel measured ~133 TF/s vs the 166 envelope in round 2
(small per-head GEMMs + fp32-softmax VPU time).  Candidates, measured
in ONE process at ViT-B bf16 shapes (pad-once: n=208, n_actual=196):

  * block_b 4 (current default) vs 8 vs 16 — more rows per grid step
    = larger projection GEMMs, more per-step scalar work amortized.
  * softmax fp32 (current) vs bf16-exp (exp on bf16, fp32 normalizer)
    — halves the VPU transcendental time if Mosaic vectorizes 2x.

Also prints output-vs-fp32 max error for the bf16exp variant so a win
can be accuracy-gated before becoming a default.

    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r3_attn_fwd_variants.py > /tmp/r3_attnfwd.log 2>&1 &
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _time(fn, iters=20, reps=3):
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
    return min(ts) / iters * 1e3


def main():
    from sfc_vit_tpu.ops.fused_attention_block import _fused_attn_block

    print(f"backend: {jax.default_backend()}", flush=True)
    b, n, d, heads = 256, 208, 768, 12
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    x = mk(b, n, d)
    lns, lnb = mk(d) * 0 + 1, mk(d) * 0
    wq, wo = mk(d, 3 * d) / 28, mk(d, d) / 28
    kw = dict(heads=heads, scale=64 ** -0.5, eps=1e-5, n_actual=196)

    ref = _fused_attn_block(x, lns, lnb, wq, wo, block_b=4, **kw)
    out = {}
    for sm in ("fp32", "bf16exp"):
        got = _fused_attn_block(
            x, lns, lnb, wq, wo, block_b=4, softmax_impl=sm, **kw
        )
        err = float(jnp.max(jnp.abs(
            got[:, :196].astype(jnp.float32)
            - ref[:, :196].astype(jnp.float32)
        )))
        for bb in (4, 8, 16):
            ms = _time(lambda c, _bb=bb, _sm=sm: _fused_attn_block(
                x + (c * 1e-24).astype(x.dtype), lns, lnb, wq, wo,
                block_b=_bb, softmax_impl=_sm, **kw
            ).astype(jnp.float32).sum() * 1e-12)
            key = f"{sm}_bb{bb}"
            out[key] = {"ms": ms, "max_err_vs_fp32": err}
            print(f"{sm:8s} block_b={bb:3d}  {ms:7.2f} ms  "
                  f"(err {err:.2e})", flush=True)

    # ---- backward: softmax-recompute fp32 vs bf16exp, bs 64 & 256 ----
    # bs64 profile: attn bwd at ~55% of the GEMM roofline with the
    # fp32-softmax recompute VPU time the prime suspect.
    from sfc_vit_tpu.ops.fused_attention_block import (
        _fused_attn_block_bwd,
    )

    for bb in (64, 256):
        xb = x[:bb]
        gb = mk(bb, n, d)
        for sm in ("fp32", "bf16exp"):
            ms = _time(lambda c, _sm=sm: sum(
                a.astype(jnp.float32).sum() for a in _fused_attn_block_bwd(
                    xb + (c * 1e-24).astype(x.dtype), gb, lns, lnb,
                    wq, wo, softmax_impl=_sm, **kw
                )
            ) * 1e-12)
            out[f"bwd_{sm}_bs{bb}"] = {"ms": ms}
            print(f"bwd {sm:8s} bs={bb:3d}  {ms:7.2f} ms", flush=True)

    with open("results/r3_attn_fwd_variants.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
