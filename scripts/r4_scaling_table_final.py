"""Final round-4 refresh of the RESULTS.md streaming-flash scaling
table, measured with the unrolled marginal-slope harness.

Why re-measure: the round-3 table predates this round's dispatch
changes — the fused one-pass backward now owns ≤8k (bq=512, 100 MiB
scoped VMEM) and the >8k streaming pair takes bk=2048 when it adds no
K padding — and its cells were collected with a K=1 carry-chained
scan, which carries ~2.7 ms/call of iteration overhead
(scripts/r3_unroll_probe.py calibration).  Here every cell is the
marginal slope between K=2 and K=6 unrolled applications per scan
iteration, so the overhead subtracts out and cells are comparable
across columns.  XLA dense rows are re-measured in the SAME process
and harness (4k only — a 16k² logits tensor OOMs HBM and can wedge
the remote backend; the old table's 16k/32k XLA cells were OOM
already).

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r4_scaling_table_final.py > /tmp/r4_table.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

OUT = "results/r4_scaling_table_final.json"


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import sfc_vit_tpu.ops.flash_attention as fa

    print(f"backend: {jax.default_backend()}", flush=True)
    assert jax.default_backend() == "tpu"

    results: dict = {}

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    def time_chain(fn, c0, k_unroll, iters=8, reps=3):
        @jax.jit
        def run(c):
            def body(carry, _):
                for _i in range(k_unroll):
                    carry = fn(carry)
                return carry, None

            c, _ = lax.scan(body, c, None, length=iters)
            return jnp.sum(c.astype(jnp.float32)) * 1e-30

        np.asarray(jax.device_get(run(c0)))  # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(run(c0)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def slope_ms(fn, c0, name, k_lo=2, k_hi=6, iters=8):
        try:
            t_lo = time_chain(fn, c0, k_lo, iters)
            t_hi = time_chain(fn, c0, k_hi, iters)
            ms = (t_hi - t_lo) / ((k_hi - k_lo) * iters) * 1e3
            results[name] = round(ms, 3)
            print(f"-> {name}: {ms:.3f} ms/call", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:160] if str(e) else repr(e)
            results[name] = f"FAIL: {type(e).__name__}: {msg}"
            print(f"-> {name}: {results[name]}", flush=True)
        save()

    rng = np.random.default_rng(0)

    def renorm(c):
        c32 = c.astype(jnp.float32)
        return (c32 * lax.rsqrt(jnp.mean(c32 * c32) + 1e-12)).astype(
            c.dtype
        )

    def xla_dense(q, k, v):
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k,
            preferred_element_type=jnp.float32,
        ) * (q.shape[-1] ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    for b, n, h in ((2, 4096, 8), (1, 16384, 4), (1, 32768, 2)):
        q, k, v = (
            jnp.asarray(rng.standard_normal((b, n, h, 64)) * 0.5,
                        jnp.bfloat16)
            for _ in range(3)
        )

        def fwd_chain(c, k=k, v=v):
            return renorm(fa.flash_attention(c, k, v))

        def grad_chain(c, k=k, v=v):
            def loss(q, k, v):
                return jnp.sum(
                    fa.flash_attention(q, k, v).astype(jnp.float32) ** 2
                ) * 1e-9

            dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(c, k, v)
            return renorm(dq + dk + dv)

        slope_ms(fwd_chain, q, f"flash_fwd_{n}_ms")
        slope_ms(grad_chain, q, f"flash_grad_{n}_ms")

        if n <= 4096:
            def xfwd_chain(c, k=k, v=v):
                return renorm(xla_dense(c, k, v))

            def xgrad_chain(c, k=k, v=v):
                def loss(q, k, v):
                    return jnp.sum(
                        xla_dense(q, k, v).astype(jnp.float32) ** 2
                    ) * 1e-9

                dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(c, k, v)
                return renorm(dq + dk + dv)

            slope_ms(xfwd_chain, q, f"xla_fwd_{n}_ms")
            slope_ms(xgrad_chain, q, f"xla_grad_{n}_ms")
        del q, k, v

    print("done.", flush=True)


if __name__ == "__main__":
    main()
