"""Probe: is a TRUE int8 MXU dot worth routing holder GEMMs through?

The serving engine currently serves _DenseParams holder weights by
dequantize-on-read (int8-resident, bf16 GEMM).  v5e int8 MXU peak is
2x bf16, and the raw all-int8_dense path measured +46% end-to-end on
the flagship config vs the holder path's +15.8% — this probe times the
three candidate implementations at the EXACT serving GEMM shapes
(family-A ViT-B-width, batch 512 x 64 tokens, d=2304):

  a) bf16:   x @ w + b                       (native weights)
  b) wdeq:   x @ (w_i8*scale).bf16 + b       (current holder path)
  c) int8:   dynamic-quantize x, int8 dot    (quant.int8.int8_dense)

K-chained lax.scan timing (CLAUDE.md), one process.

    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r3_holder_int8_probe.py > /tmp/r3_holder_probe.log 2>&1 &
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


def _scan_time(fn, args, unroll, iters=8):
    """Total time of `iters` scan steps, `unroll` fn applications each."""

    @jax.jit
    def run(*a):
        def body(c, _):
            m = c
            for _ in range(unroll):
                out = fn(*a, m)
                m = (out.astype(jnp.float32).mean() * 1e-30).astype(
                    jnp.bfloat16
                )
            return m, m

        _, outs = lax.scan(body, jnp.zeros((), jnp.bfloat16), None,
                           length=iters)
        return outs.astype(jnp.float32).sum()

    float(run(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _time(fn, args, iters=8):
    """Marginal per-call time from the K=4 -> K=12 unroll slope: a K=1
    carry-chained scan carries ~2.7 ms/iteration of overhead (CLAUDE.md)
    that would drown the very int8-vs-bf16 ratio this probe measures."""
    t4 = _scan_time(fn, args, unroll=4, iters=iters)
    t12 = _scan_time(fn, args, unroll=12, iters=iters)
    return (t12 - t4) / (8 * iters)


def probe(rows, d_in, d_out, tag):
    from sfc_vit_tpu.quant.int8 import int8_dense, quantize_weight

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((rows, d_in)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((d_in, d_out)) / 30, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((d_out,)), jnp.bfloat16)
    w_i8, scale = quantize_weight(w)
    w_i8, scale = jax.device_put(w_i8), jax.device_put(scale)

    def bf16(x, w, b, c):
        return (x * (1 + c)) @ w + b

    def wdeq(x, w_i8, scale, b, c):
        wq = (w_i8.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        return (x * (1 + c)) @ wq + b

    def i8(x, w_i8, scale, b, c):
        return int8_dense(x * (1 + c), w_i8, scale, b, jnp.bfloat16)

    flop = 2 * rows * d_in * d_out
    out = {}
    for name, fn, args in (
        ("bf16", bf16, (x, w, b)),
        ("wdeq", wdeq, (x, w_i8, scale, b)),
        ("int8", i8, (x, w_i8, scale, b)),
    ):
        t = _time(fn, args)
        out[name] = {"ms": round(t * 1e3, 3),
                     "tf_s": round(flop / t / 1e12, 1)}
        print(f"{tag} {name}: {out[name]}", flush=True)
    return out


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rows = 512 * 64
    results = {
        "in_proj_32768x2304x6912": probe(rows, 2304, 6912, "in_proj"),
        "out_proj_32768x2304x2304": probe(rows, 2304, 2304, "out_proj"),
    }
    with open("results/r3_holder_int8_probe.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
