"""Pad-mask cost of the fused attention-block forward (k=12 unrolled
harness from r3_unroll_probe — the calibrated instrument).

n_actual=196 (the ViT-B pad-once config) masks 12 pad key columns in
every softmax; n_actual=None skips the mask statically.  The delta is
the price of the 197-token geometry, and the mask-free number is the
kernel's intrinsic rate at [208, 768] tiles.

    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r3_attn_mask_cost.py > /tmp/r3_mask.log 2>&1 &
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _time_chain_k(fn, x0, k=12, iters=10, reps=3):
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

    print(f"backend: {jax.default_backend()}", flush=True)
    b, n, d, heads, dh = 256, 208, 768, 12, 64
    rows = b * n
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    x = mk(b, n, d)
    lns, lnb = mk(d) * 0 + 1, mk(d) * 0
    wq, wo = mk(d, 3 * d) / 28, mk(d, d) / 28

    attn_fl = (2 * rows * d * 3 * d + 4 * n * n * dh * heads * b
               + 2 * rows * d * d)

    out = {}
    for label, na in (("masked_196", 196), ("maskfree_208", None)):
        ms = _time_chain_k(
            lambda v, _na=na: _fused_attn_block(
                v, lns, lnb, wq, wo, heads=heads, scale=dh ** -0.5,
                eps=1e-5, block_b=4, n_actual=_na,
            ),
            x,
        )
        out[label] = {"ms_per_call": ms, "tf_s": attn_fl / ms / 1e9}
        print(f"{label:14s}  {ms:7.3f} ms/call  "
              f"{attn_fl/ms/1e9:6.1f} TF/s", flush=True)

    with open("results/r3_attn_mask_cost.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print("saved results/r3_attn_mask_cost.json", flush=True)


if __name__ == "__main__":
    main()
