"""Round-2 on-chip probes: int8 MXU feasibility/speed in XLA and
Pallas, and a fused-attention-block block_b sweep.

Timing uses the bench.py pattern: the iteration loop is ONE jitted
``lax.scan`` (single dispatch) whose per-iteration input is perturbed
by the carry (no loop hoisting), ended by a real ``device_get`` of a
scalar (on the remote axon runtime ``block_until_ready`` only means
"handle exists").

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/r2_probe_int8_and_tuning.py
"""

from __future__ import annotations

import sys
import time
import traceback

import numpy as np


def _scan_time_ms(make_body, carry0, iters=32):
    """Wall ms per iteration of a device-side scan."""
    import jax
    from jax import lax

    @jax.jit
    def run():
        c, _ = lax.scan(make_body(), carry0, None, length=iters)
        return c

    np.asarray(jax.device_get(run()))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run()))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1e3


def part_int8_probe():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k, n = 50176, 768, 3072  # 256 imgs x 196 tokens, fc1 shape
    tf = 2 * m * k * n / 1e12

    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
    xb = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)

    def bf16_body():
        def body(c, _):
            o = jax.lax.dot_general(
                xb + c * 1e-24, wb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return jnp.abs(o).mean().astype(jnp.bfloat16), None
        return body

    t = _scan_time_ms(bf16_body, jnp.zeros((), jnp.bfloat16))
    print(f"XLA bf16 GEMM: {t:.3f} ms ({tf/t*1e3:.1f} TF/s)", flush=True)

    def i8_body():
        def body(c, _):
            # data-dependent cheap select defeats hoisting without
            # perturbing int8 values
            xi = jnp.where(c < jnp.int32(2 ** 30), x8, x8 ^ 1)
            o = jax.lax.dot_general(
                xi, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return jnp.abs(o).max().astype(jnp.int32) - c * 0, None
        return body

    t = _scan_time_ms(i8_body, jnp.zeros((), jnp.int32))
    print(f"XLA int8 GEMM: {t:.3f} ms ({tf/t*1e3:.1f} TOP/s)", flush=True)

    # Pallas: quantize(bf16)->int8 GEMM -> fp32 rescale, weights
    # resident — the exact inner structure an int8 fused-MLP would use.
    block_r = 512

    def kern_q(x_ref, w_ref, s_ref, o_ref):
        xf = x_ref[...].astype(jnp.float32)
        xi = jnp.clip(jnp.round(xf / s_ref[0]), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xi, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o_ref[...] = (acc.astype(jnp.float32) * s_ref[0]).astype(
            jnp.bfloat16
        )

    @jax.jit
    def pallas_qi8(a, b, s):
        return pl.pallas_call(
            kern_q,
            grid=(m // block_r,),
            in_specs=[
                pl.BlockSpec((block_r, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((block_r, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20,
            ),
        )(a, b, s)

    s = jnp.full((1,), 0.05, jnp.float32)

    def pq_body():
        def body(c, _):
            o = pallas_qi8(xb + c * 1e-24, w8, s)
            return jnp.abs(o.astype(jnp.float32)).mean().astype(
                jnp.bfloat16
            ), None
        return body

    t = _scan_time_ms(pq_body, jnp.zeros((), jnp.bfloat16))
    print(f"Pallas quantize+int8 GEMM+rescale (bf16 in/out): {t:.3f} ms "
          f"({tf/t*1e3:.1f} TOP/s)", flush=True)

    # bf16 Pallas same-structure control
    def kern_b(x_ref, w_ref, o_ref):
        acc = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = acc.astype(jnp.bfloat16)

    @jax.jit
    def pallas_bf16(a, b):
        return pl.pallas_call(
            kern_b,
            grid=(m // block_r,),
            in_specs=[
                pl.BlockSpec((block_r, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_r, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20,
            ),
        )(a, b)

    def pb_body():
        def body(c, _):
            o = pallas_bf16(xb + c * 1e-24, wb)
            return jnp.abs(o.astype(jnp.float32)).mean().astype(
                jnp.bfloat16
            ), None
        return body

    t = _scan_time_ms(pb_body, jnp.zeros((), jnp.bfloat16))
    print(f"Pallas bf16 GEMM (control): {t:.3f} ms ({tf/t*1e3:.1f} TF/s)",
          flush=True)


def part_block_b_sweep():
    import jax
    import jax.numpy as jnp

    from sfc_vit_tpu.ops.fused_attention_block import _fused_attn_block

    rng = np.random.default_rng(1)
    b, n, d, inner = 256, 196, 768, 768
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.bfloat16)
    lns = jnp.ones((d,), jnp.bfloat16)
    lnb = jnp.zeros((d,), jnp.bfloat16)
    wq = jnp.asarray(rng.standard_normal((d, 3 * inner)) * 0.02,
                     jnp.bfloat16)
    wo = jnp.asarray(rng.standard_normal((inner, d)) * 0.02, jnp.bfloat16)

    for bb in (2, 4, 8):
        def mk(bb=bb):
            def body(c, _):
                o = _fused_attn_block(
                    x + c * 1e-24, lns, lnb, wq, wo, heads=12,
                    scale=0.125, eps=1e-5, block_b=bb,
                )
                return o.mean().astype(jnp.bfloat16), None
            return body

        t = _scan_time_ms(mk, jnp.zeros((), jnp.bfloat16))
        print(f"attn block block_b={bb}: {t:.3f} ms", flush=True)


def main():
    for name, fn in (
        ("int8_probe", part_int8_probe),
        ("block_b_sweep", part_block_b_sweep),
    ):
        print(f"=== {name}", flush=True)
        try:
            fn()
        except Exception:
            traceback.print_exc()
            print(f"=== {name} FAILED", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
