"""Streaming-flash block-size sweep at 8k-32k tokens (TODO item).

Device-side scan timing of the forward for block_q x block_k grids,
plus the grad step at the winning config vs the auto policy.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/sweep_flash_blocks.py
"""

from __future__ import annotations

import sys
import time
import traceback

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sfc_vit_tpu.ops.flash_attention import flash_attention

    def scan_time(fn, *arrs, iters=16):
        @jax.jit
        def run():
            def body(c, _):
                o = fn(arrs[0] + c * 1e-24, *arrs[1:])
                return o.mean().astype(arrs[0].dtype), None

            c, _ = lax.scan(body, jnp.zeros((), arrs[0].dtype), None,
                            length=iters)
            return c

        np.asarray(jax.device_get(run()))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(run()))
            ts.append(time.perf_counter() - t0)
        return min(ts) / iters * 1e3

    rng = np.random.default_rng(0)
    for n, b, h in ((8192, 1, 8), (16384, 1, 4), (32768, 1, 2)):
        q, k, v = (
            jnp.asarray(
                rng.standard_normal((b, n, h, 64)) * 0.5, jnp.bfloat16
            )
            for _ in range(3)
        )
        t_auto = scan_time(lambda qq, kk, vv: flash_attention(qq, kk, vv),
                           q, k, v)
        print(f"N={n} auto: {t_auto:.3f} ms", flush=True)
        for bq in (128, 256, 512):
            for bk in (512, 1024, 2048):
                try:
                    t = scan_time(
                        lambda qq, kk, vv, bq=bq, bk=bk: flash_attention(
                            qq, kk, vv, block_q=bq, block_k=bk
                        ),
                        q, k, v,
                    )
                    print(f"N={n} bq={bq} bk={bk}: {t:.3f} ms",
                          flush=True)
                except Exception as e:  # compile/VMEM failure
                    print(f"N={n} bq={bq} bk={bk}: FAIL "
                          f"{type(e).__name__}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    try:
        main()
    except Exception:
        traceback.print_exc()
