"""Scan-iteration overhead calibration for kernel microbenches.

r3_attn_fwd_clean_timing showed a chained 2-kernel layer (6.30 ms)
costing LESS than the sum of its 1-kernel chains (3.54 + 4.58 ms):
per-scan-iteration overhead (carry double-buffer copies + serialization
between iterations) pollutes K=1 timings.  This probe unrolls K kernel
applications per scan iteration; the slope of (time vs K) is the true
per-call cost, the intercept is the per-iteration overhead.

    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r3_unroll_probe.py > /tmp/r3_unroll.log 2>&1 &
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _time_chain_k(fn, x0, k, iters=10, reps=3):
    @jax.jit
    def run(x):
        def body(c, _):
            for _i in range(k):
                c = fn(c)
            return c, None

        c, _ = lax.scan(body, x, None, length=iters)
        return c[0, 0, 0].astype(jnp.float32)

    np.asarray(jax.device_get(run(x0)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run(x0)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / (iters * k) * 1e3


def main():
    from sfc_vit_tpu.ops.fused_attention_block import _fused_attn_block
    from sfc_vit_tpu.ops.fused_mlp import _fused_mlp

    print(f"backend: {jax.default_backend()}", flush=True)
    b, n, d, heads, dh, f = 256, 208, 768, 12, 64, 3072
    rows = b * n
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    x = mk(b, n, d)
    lns, lnb = mk(d) * 0 + 1, mk(d) * 0
    wq, wo = mk(d, 3 * d) / 28, mk(d, d) / 28
    w1, b1 = mk(d, f) / 28, mk(f) * 0
    w2, b2 = mk(f, d) / 55, mk(d) * 0
    kw = dict(heads=heads, scale=dh ** -0.5, eps=1e-5, n_actual=196)

    attn_fl = (2 * rows * d * 3 * d + 4 * n * n * dh * heads * b
               + 2 * rows * d * d)
    mlp_fl = 2 * 2 * rows * d * f

    afn = lambda v: _fused_attn_block(v, lns, lnb, wq, wo,
                                      block_b=4, **kw)
    mfn = lambda v: _fused_mlp(v, lns, lnb, w1, b1, w2, b2, eps=1e-5,
                               activation="gelu", residual=True)

    out = {}
    for name, fn, fl in (("attn", afn, attn_fl), ("mlp", mfn, mlp_fl)):
        for k in (1, 4, 12):
            ms = _time_chain_k(fn, x, k)
            out[f"{name}_k{k}"] = {"ms_per_call": ms,
                                   "tf_s": fl / ms / 1e9}
            print(f"{name} k={k:2d}  {ms:7.3f} ms/call  "
                  f"{fl/ms/1e9:6.1f} TF/s", flush=True)

    with open("results/r3_unroll_probe.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print("saved results/r3_unroll_probe.json", flush=True)


if __name__ == "__main__":
    main()
