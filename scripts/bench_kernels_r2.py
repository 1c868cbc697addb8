"""Round-2 kernel measurements on real TPU hardware.

Batches every round-2 kernel question into one session (remote compiles
through the axon tunnel are minutes each; dispatches ~40 ms — so all
timing loops run device-side via lax.scan and end in a device_get).

Sections (each prints JSON lines to stdout):
  short   ViT-B/16 attention shapes (b256 n196 h12 dh64 bf16):
          xla fp32 / xla bf16-softmax / pallas head-folded (new).
  long    streaming flash scaling N in {4096, 16384, 32768}: fwd ms and
          train-grad ms vs XLA dense where it fits; on-chip parity.
  local   curve-local attention @4k: fwd and grad step vs XLA dense-mask
          (the windowed Pallas backward's training claim).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_kernels_r2.py [section ...]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _mk_qkv(b, n, h, dh, dtype, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.standard_normal((b, n, h, dh)) * 0.5, dtype=dtype
    )
    return mk(), mk(), mk()


def time_fwd(fn, q, k, v, iters=30):
    """Device-side loop: carry the output back into q so the compiler
    cannot hoist the attention out of the scan."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(q, k, v):
        def body(c, _):
            out = fn(c, k, v)
            return (c + out * 1e-24).astype(q.dtype), None

        c, _ = lax.scan(body, q, None, length=iters)
        # Read back a SCALAR: device_get of the full activation would
        # ship tens of MB over the axon tunnel and dominate the timing.
        return c.astype(jnp.float32).mean()

    np.asarray(jax.device_get(run(q, k, v)))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run(q, k, v)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def time_grad(fn, q, k, v, iters=10):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def loss(q, k, v):
        return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

    gfn = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(q, k, v):
        def body(c, _):
            dq, dk, dv = gfn(c, k, v)
            return (c + dq * 1e-24).astype(q.dtype), None

        c, _ = lax.scan(body, q, None, length=iters)
        return c.astype(jnp.float32).mean()  # scalar readback (tunnel!)

    np.asarray(jax.device_get(run(q, k, v)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run(q, k, v)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def emit(**kw):
    print(json.dumps(kw), flush=True)


def section_short():
    import jax.numpy as jnp

    from sfc_vit_tpu.ops.attention import (
        dot_product_attention_bf16,
        dot_product_attention_xla,
    )
    from sfc_vit_tpu.ops.flash_attention import flash_attention

    b, n, h, dh = 256, 196, 12, 64
    q, k, v = _mk_qkv(b, n, h, dh, jnp.bfloat16)

    # parity first (cheap shapes share the compile)
    want = np.asarray(dot_product_attention_xla(q, k, v), np.float32)
    got = np.asarray(flash_attention(q, k, v), np.float32)
    emit(section="short", check="pallas_folded_parity",
         max_err=float(np.abs(got - want).max()))

    for name, fn in (
        ("xla_fp32", dot_product_attention_xla),
        ("xla_bf16", dot_product_attention_bf16),
        ("pallas_folded", flash_attention),
        ("pallas_g1", lambda a, c, d: flash_attention(
            a, c, d, None, None, None, 1)),
    ):
        ms = time_fwd(fn, q, k, v) * 1e3
        emit(section="short", impl=name, shape=[b, n, h, dh], fwd_ms=ms)

    # train-relevant: grads at ViT-B shapes
    for name, fn in (
        ("xla_fp32", dot_product_attention_xla),
        ("pallas_folded", flash_attention),
    ):
        ms = time_grad(fn, q, k, v) * 1e3
        emit(section="short", impl=name, shape=[b, n, h, dh], grad_ms=ms)


def section_long():
    import jax.numpy as jnp

    from sfc_vit_tpu.ops.attention import dot_product_attention_xla
    from sfc_vit_tpu.ops.flash_attention import flash_attention

    import os

    only = os.environ.get("BENCH_LONG_N")
    cases = [  # (n, b, h, try_xla_fwd, try_xla_grad)
        (4096, 2, 8, True, True),
        (16384, 1, 4, True, False),
        (32768, 1, 2, False, False),
    ]
    if only:
        cases = [c for c in cases if c[0] == int(only)]
    for n, b, h, try_xla, try_xla_g in cases:
        q, k, v = _mk_qkv(b, n, h, 64, jnp.bfloat16)
        ms = time_fwd(flash_attention, q, k, v, iters=10) * 1e3
        emit(section="long", impl="pallas_stream", n=n, b=b, h=h, fwd_ms=ms)
        gms = time_grad(flash_attention, q, k, v, iters=5) * 1e3
        emit(section="long", impl="pallas_stream", n=n, b=b, h=h,
             grad_ms=gms)
        if try_xla:
            try:
                ms = time_fwd(dot_product_attention_xla, q, k, v,
                              iters=10) * 1e3
                emit(section="long", impl="xla_dense", n=n, b=b, h=h,
                     fwd_ms=ms)
                if n <= 4096:
                    # eager dense parity beyond 4k OOMs the device and
                    # can wedge the remote backend; 4k covers it
                    want = np.asarray(
                        dot_product_attention_xla(q, k, v), np.float32
                    )
                    got = np.asarray(flash_attention(q, k, v), np.float32)
                    emit(section="long", check="stream_parity", n=n,
                         max_err=float(np.abs(got - want).max()))
            except Exception as e:  # noqa: BLE001 - OOM expected at 16k+
                emit(section="long", impl="xla_dense", n=n,
                     error=type(e).__name__)
        if try_xla_g:
            try:
                gms = time_grad(dot_product_attention_xla, q, k, v,
                                iters=5) * 1e3
                emit(section="long", impl="xla_dense", n=n, b=b, h=h,
                     grad_ms=gms)
            except Exception as e:  # noqa: BLE001
                emit(section="long", impl="xla_dense_grad", n=n,
                     error=type(e).__name__)
        # streaming-bwd internal consistency at long N: two block configs
        if n == 32768:
            got2 = np.asarray(
                flash_attention(q, k, v, None, 512, 2048), np.float32
            )
            got1 = np.asarray(flash_attention(q, k, v), np.float32)
            emit(section="long", check="block_consistency", n=n,
                 max_err=float(np.abs(got2 - got1).max()))


def section_local():
    import jax.numpy as jnp

    from sfc_vit_tpu.ops.local_attention import (
        local_block_attention,
        local_block_attention_xla,
    )

    n, b, h = 4096, 2, 8
    q, k, v = _mk_qkv(b, n, h, 64, jnp.bfloat16)
    blk, halo = 128, 1

    pal = lambda a, c, d: local_block_attention(a, c, d, blk, halo)
    ref = lambda a, c, d: local_block_attention_xla(a, c, d, blk, halo)

    want = np.asarray(ref(q, k, v), np.float32)
    got = np.asarray(pal(q, k, v), np.float32)
    emit(section="local", check="fwd_parity", n=n,
         max_err=float(np.abs(got - want).max()))

    emit(section="local", impl="pallas_windowed", n=n,
         fwd_ms=time_fwd(pal, q, k, v) * 1e3)
    emit(section="local", impl="xla_densemask", n=n,
         fwd_ms=time_fwd(ref, q, k, v) * 1e3)
    emit(section="local", impl="pallas_windowed", n=n,
         grad_ms=time_grad(pal, q, k, v, iters=5) * 1e3)
    emit(section="local", impl="xla_densemask", n=n,
         grad_ms=time_grad(ref, q, k, v, iters=5) * 1e3)


def section_gather():
    """gather_project win-or-rescope (VERDICT r1 #7): flagship ViT-B
    patch-embed shape (XLA folds a pure permutation into the GEMM — can
    a bigger single-step block_n win anyway?) and the grouped-1D
    tokenizer shape (XLA cannot fold: the (n g) d -> n (g d) reshape
    mixes rows between gather and GEMM)."""
    import jax
    import jax.numpy as jnp

    from sfc_vit_tpu.ops.gather_project import (
        gather_project,
        gather_project_xla,
    )

    rng = np.random.default_rng(0)

    def timeit(fn, *args, iters=30):
        import time as _t

        @jax.jit
        def run(x, *rest):
            def body(c, _):
                out = fn(c, *rest)
                return (c + out.mean() * 1e-24).astype(c.dtype), None

            c, _ = jax.lax.scan(body, x, None, length=iters)
            return c.astype(jnp.float32).mean()

        np.asarray(jax.device_get(run(*args)))
        ts = []
        for _ in range(3):
            t0 = _t.perf_counter()
            np.asarray(jax.device_get(run(*args)))
            ts.append(_t.perf_counter() - t0)
        return min(ts) / iters

    # flagship: ViT-B patch embed, bs 512, N=196, K=D=768, bf16
    x = jnp.asarray(rng.standard_normal((512, 196, 768)) * 0.1,
                    jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((768, 768)) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(768) * 0.01, jnp.bfloat16)
    lut = jnp.asarray(rng.permutation(196).astype(np.int32))
    for name, fn in (
        ("xla_take_gemm", lambda c: gather_project_xla(c, lut, w, b)),
        ("pallas_bn128", lambda c: gather_project(c, lut, w, b, 128)),
        ("pallas_bn256", lambda c: gather_project(c, lut, w, b, 256)),
    ):
        ms = timeit(fn, x) * 1e3
        emit(section="gather", impl=name, shape="vitb_patch_embed",
             fwd_ms=ms)

    # grouped-1D: SFCEmbedding1D shape (B 256, N 1024 pixels, k 3,
    # group 16 -> 64 tokens of 48 features, D 256)
    xg = jnp.asarray(rng.standard_normal((256, 1024, 3)) * 0.1,
                     jnp.bfloat16)
    # pad K to something MXU-sane is the kernel's problem; XLA reshapes
    wg = jnp.asarray(rng.standard_normal((48, 256)) * 0.05, jnp.bfloat16)
    bg = jnp.asarray(rng.standard_normal(256) * 0.01, jnp.bfloat16)
    lutg = jnp.asarray(rng.permutation(1024).astype(np.int32))
    for name, fn in (
        ("xla_take_gemm", lambda c: gather_project_xla(
            c, lutg, wg, bg, group=16)),
        ("pallas_grouped", lambda c: gather_project(
            c, lutg, wg, bg, 64, False, 16)),
    ):
        ms = timeit(fn, xg, iters=50) * 1e3
        emit(section="gather", impl=name, shape="grouped1d_g16",
             fwd_ms=ms)
    want = np.asarray(gather_project_xla(xg, lutg, wg, bg, group=16),
                      np.float32)
    got = np.asarray(gather_project(xg, lutg, wg, bg, 64, False, 16),
                     np.float32)
    emit(section="gather", check="grouped_parity",
         max_err=float(np.abs(got - want).max()))


if __name__ == "__main__":
    sections = sys.argv[1:] or ["short", "long", "local"]
    t0 = time.time()
    for s in sections:
        globals()[f"section_{s}"]()
        emit(section=s, done=True, elapsed_s=round(time.time() - t0, 1))
