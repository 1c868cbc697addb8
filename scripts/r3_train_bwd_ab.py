"""Round-3 A/B: Pallas backward kernels vs the round-2 XLA train rule.

Measures, in ONE process (CLAUDE.md: across-process variance on the
remote chip is +-2-3%):

  1. Kernel-level fwd+bwd microbench at ViT-B shapes — fused MLP block
     and fused attention block, train_impl='pallas' vs 'xla'.
  2. End-to-end ViT-B/16 train-step throughput (full production step:
     fwd+bwd+AdamW+mixup/cutmix) at batch 64 / 128 / 256 for both
     train rules — the VERDICT round-2 item-1 numbers (933 img/s @64,
     inverted batch scaling under 'xla').

Run detached (compiles take minutes over the remote tunnel):
    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r3_train_bwd_ab.py > /tmp/r3_ab.log 2>&1 &
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _time_scan(step_fn, *args, iters=10, reps=3):
    """step_fn(carry, *args)->carry, run as one device-side lax.scan
    dispatch, scalar readback (bench.py::_throughput pattern).  Big
    operands are passed as jit ARGUMENTS, never closure constants
    (baked HLO constants can 413 the remote tunnel)."""

    @jax.jit
    def run(*a):
        def body(c, _):
            return step_fn(c, *a), None

        c, _ = lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    np.asarray(jax.device_get(run(*args)))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def kernel_microbench():
    from sfc_vit_tpu.ops.fused_attention_block import fused_attention_block
    from sfc_vit_tpu.ops.fused_mlp import fused_mlp_block

    b, n, d, f, heads = 256, 197, 768, 3072, 12
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    x = mk(b, n, d)
    lns, lnb = mk(d) * 0 + 1, mk(d) * 0
    w1, b1 = mk(d, f) / 28, mk(f) * 0
    w2, b2 = mk(f, d) / 55, mk(d) * 0
    wq, wo = mk(d, 3 * d) / 28, mk(d, d) / 28

    out = {}
    for impl in ("xla", "pallas"):
        def mlp_step(c, xa, a1, a2, _impl=impl):
            def loss(xx, a1, a2):
                y = fused_mlp_block(xx, lns, lnb, a1, b1, a2, b2,
                                    train_impl=_impl)
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-12

            # perturb WITHOUT promoting bf16 -> f32 (f32 scalar carry)
            l, gr = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                xa + (c * 1e-24).astype(xa.dtype), a1, a2
            )
            acc = sum(g.astype(jnp.float32).sum() for g in gr)
            return (l + acc * 1e-12).astype(jnp.float32)

        sec = _time_scan(mlp_step, x, w1, w2)
        tf = 3 * 2 * 2 * b * n * d * f / sec / 1e12  # 6 R.D.F GEMMs
        out[f"mlp_{impl}"] = {"ms": sec * 1e3, "eff_gemm_tf": tf}
        print(f"mlp  {impl:6s} {sec*1e3:8.2f} ms  ~{tf:.1f} TF/s",
              flush=True)

        def attn_step(c, xa, a1, a2, _impl=impl):
            def loss(xx, a1, a2):
                y = fused_attention_block(xx, lns, lnb,
                                          a1, a2, heads,
                                          train_impl=_impl)
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-12

            l, gr = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                xa + (c * 1e-24).astype(xa.dtype), a1, a2
            )
            acc = sum(g.astype(jnp.float32).sum() for g in gr)
            return (l + acc * 1e-12).astype(jnp.float32)

        sec = _time_scan(attn_step, x, wq, wo)
        out[f"attn_{impl}"] = {"ms": sec * 1e3}
        print(f"attn {impl:6s} {sec*1e3:8.2f} ms", flush=True)
    return out


def train_throughput(batch, impl, iters=20):
    from sfc_vit_tpu.models import CurveViT
    from sfc_vit_tpu.models import simple_vit as sv
    from sfc_vit_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
        warmup_cosine,
    )

    sv._TRAIN_IMPL = impl  # tracing-time switch; fresh jits below
    kw = dict(image_size=224, patch_size=16, num_classes=1000, dim=768,
              depth=12, heads=12, mlp_dim=3072, dim_head=64)
    model = CurveViT(curve="hilbert", dtype=jnp.bfloat16, **kw)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, 224, 224, 3)),
        jnp.float32,
    )
    sched = warmup_cosine(3e-4, 10, 1000)
    state = create_train_state(
        model, jax.random.key(0), x[:2], make_optimizer(sched)
    )
    step = make_train_step(num_classes=1000, schedule=sched)
    y = jnp.zeros((batch,), jnp.int32)

    @jax.jit
    def run(state, xf, y, key):
        def body(carry, i):
            st, _ = carry
            st, metrics = step(st, (xf, y), jax.random.fold_in(key, i))
            return (st, metrics["loss"]), None

        (st, loss), _ = lax.scan(
            body, (state, jnp.float32(0)), jnp.arange(iters)
        )
        return loss

    key = jax.random.key(1)
    np.asarray(jax.device_get(run(state, x, y, key)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run(state, x, y, key)))
        ts.append(time.perf_counter() - t0)
    ips = batch * iters / min(ts)
    print(f"train bs={batch:4d} impl={impl:6s} {ips:9.1f} img/s",
          flush=True)
    return ips


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    results = {"kernels": kernel_microbench(), "train": {}}
    for impl in ("xla", "pallas"):
        for batch in (64, 128, 256):
            results["train"][f"{impl}_bs{batch}"] = train_throughput(
                batch, impl
            )
    with open("results/r3_train_bwd_ab.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
