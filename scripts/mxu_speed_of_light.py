#!/usr/bin/env python
"""MXU speed-of-light calibration: pure bf16 GEMM throughput.

Grounds the model-bench numbers: whatever fraction of this a model hits
is its real MXU utilization on *this* stack (tunnel + libtpu + XLA).

    python scripts/mxu_speed_of_light.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    for m, k, n in [(4096, 4096, 4096), (8192, 8192, 8192)]:
        a = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, n)), dtype=jnp.bfloat16)
        iters = 32

        @jax.jit
        def run(a, b):
            def body(c, _):
                o = jnp.dot(a + c * 1e-24, b,
                            preferred_element_type=jnp.bfloat16)
                # full-output reduction: a scalar slice would let XLA
                # dead-code-eliminate most of the GEMM
                return o.mean().astype(jnp.bfloat16), None

            c, _ = lax.scan(body, jnp.zeros((), jnp.bfloat16), None,
                            length=iters)
            return c

        np.asarray(jax.device_get(run(a, b)))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(run(a, b)))
            ts.append(time.perf_counter() - t0)
        sec = min(ts) / iters
        tflops = 2 * m * k * n / sec / 1e12
        print(f"bf16 GEMM {m}x{k}x{n}: {sec*1e3:.3f} ms  {tflops:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
