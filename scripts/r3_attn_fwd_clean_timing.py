"""Clean standalone timing of the fused attention-block FORWARD
(VERDICT item 4 follow-up).

Two timing harnesses, measured in ONE process:

* ``perturb``: loop-invariant x, one element bumped per iteration via
  the scalar carry (the r3_attn_fwd_variants pattern minus its fp32
  cast + full reduction).  The ``.at[].add`` forces a full 82 MB copy
  of x every iteration and the output buffer is written but never
  consumed — this OVERSTATES kernel time.
* ``chain``: the kernel's output IS the next iteration's input
  (loop-carried carry, scalar readback) — exactly how the 12-layer
  stack composes in the model, zero harness traffic.  This is the
  number comparable to the in-model per-layer profile.

Prints ms/call and effective TF/s against the exact GEMM FLOP count
(qkv proj + 2 per-head GEMMs + out proj).  Arrays are jit ARGUMENTS
(no baked HLO constants).

    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r3_attn_fwd_clean_timing.py > /tmp/r3_clean.log 2>&1 &
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _time_chain(fn, x0, iters=20, reps=3):
    """Chained device-side scan: carry = fn(carry); scalar readback."""

    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), None

        c, _ = lax.scan(body, x, None, length=iters)
        return c[0, 0, 0].astype(jnp.float32)

    np.asarray(jax.device_get(run(x0)))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run(x0)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1e3


def _time_perturb(step_fn, *args, iters=20, reps=3):
    @jax.jit
    def run(*a):
        def body(c, _):
            return step_fn(c, *a), None

        c, _ = lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    np.asarray(jax.device_get(run(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1e3


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

    attn_fl = (2 * rows * d * 3 * d          # qkv projection
               + 4 * n * n * dh * heads * b  # s + att per head
               + 2 * rows * d * d)           # out projection
    mlp_fl = 2 * 2 * rows * d * f

    out = {"flops_attn_per_call": attn_fl, "flops_mlp_per_call": mlp_fl}

    # --- chained (in-model composition) ---
    for sm in ("fp32", "bf16exp"):
        for bb in (4, 8):
            ms = _time_chain(
                lambda v, _bb=bb, _sm=sm: _fused_attn_block(
                    v, lns, lnb, wq, wo, block_b=_bb,
                    softmax_impl=_sm, **kw
                ),
                x,
            )
            tf = attn_fl / ms / 1e9
            out[f"chain_attn_{sm}_bb{bb}"] = {"ms": ms, "tf_s": tf}
            print(f"chain attn {sm:8s} bb={bb}  {ms:7.3f} ms  "
                  f"{tf:6.1f} TF/s", flush=True)

    ms = _time_chain(
        lambda v: _fused_mlp(v, lns, lnb, w1, b1, w2, b2,
                             eps=1e-5, activation="gelu",
                             residual=True),
        x,
    )
    out["chain_mlp_fwd"] = {"ms": ms, "tf_s": mlp_fl / ms / 1e9}
    print(f"chain mlp  fwd          {ms:7.3f} ms  "
          f"{mlp_fl/ms/1e9:6.1f} TF/s", flush=True)

    # full layer (attn -> mlp), the exact model composition
    ms = _time_chain(
        lambda v: _fused_mlp(
            _fused_attn_block(v, lns, lnb, wq, wo, block_b=4, **kw),
            lns, lnb, w1, b1, w2, b2,
            eps=1e-5, activation="gelu", residual=True,
        ),
        x,
    )
    out["chain_layer"] = {
        "ms": ms, "tf_s": (attn_fl + mlp_fl) / ms / 1e9
    }
    print(f"chain layer (attn+mlp)  {ms:7.3f} ms  "
          f"{(attn_fl+mlp_fl)/ms/1e9:6.1f} TF/s", flush=True)

    # --- perturb harness (for the overhead comparison) ---
    def astep(c, xx, a, o):
        xx = xx.at[0, 0, 0].add((c * 1e-24).astype(xx.dtype))
        y = _fused_attn_block(xx, lns, lnb, a, o, block_b=4, **kw)
        return c + y[0, 0, :].astype(jnp.float32).sum() * 1e-12

    ms = _time_perturb(astep, x, wq, wo)
    out["perturb_attn_fp32_bb4"] = {"ms": ms, "tf_s": attn_fl / ms / 1e9}
    print(f"perturb attn fp32 bb=4  {ms:7.3f} ms  "
          f"{attn_fl/ms/1e9:6.1f} TF/s", flush=True)

    with open("results/r3_attn_fwd_clean_timing.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print("saved results/r3_attn_fwd_clean_timing.json", flush=True)


if __name__ == "__main__":
    main()
