"""Measure whether raising the flash kernels' scoped-VMEM limit pays.

Background: the flash kernels run at Mosaic's 16 MiB default scoped
limit, and every block chooser in ops/flash_attention.py budgets
against it (`_fwd_block_q_cap`, `_FUSED_BWD_MAX`=2048, the streaming
bwd's 512/1024 caps).  The fused-block kernels (fused_mlp.py,
fused_attention_block.py, fused_torch_attention.py) raise theirs to
100 MiB per-call on this same v5e (128 MiB physical VMEM) and are the
headline production kernels — so the headroom is real.  Three
questions, answered by ONE-process on-chip A/Bs (CLAUDE.md: never
compare across processes):

  1. Is the raised limit FREE on measured-good configs?  (guard rows:
     identical config, limit None vs 100 MiB — the limit is supposed
     to be a pure allocator check, but trust nothing unmeasured.)
  2. Forward: does the fp32 N=4096 config the chooser demotes
     (512->256, results/r4_flash_fwd_vmem_probe.json) actually run
     FASTER at bq=512 once the limit permits it?  Plus: can the
     single-K-step regime extend to N=8192 (24 MiB bf16 logits pair)?
  3. Backward (the prize): the fused one-pass backward needs 25.8 MiB
     at (bq=512, N=4096) — module header note — vs the two-pass
     streaming pair that re-reads q/k/v/g and recomputes logits twice.
     If fused-at-100MiB beats streaming at N=4096, the 4k-token curve
     family (the thesis workload) trains faster.

Also carries the dh=128 follow-up row from the VMEM probe: the fwd
cap's 15 MiB pair budget was measured at dh<=64; the k/v residual
grows with dh, so fp32 N=3840/dh=128 (15.0 MiB pair) could be latently
over at the default limit.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r4_flash_vmem_limit_ab.py > /tmp/r4_vmem_limit.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import numpy as np

OUT = "results/r4_flash_vmem_limit_ab.json"
HUNDRED_MIB = 100 * 2 ** 20


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import sfc_vit_tpu.ops.flash_attention as fa

    print(f"backend: {jax.default_backend()}", flush=True)
    assert jax.default_backend() == "tpu"

    results: dict = {}

    def set_limit(lim):
        fa._VMEM_LIMIT = lim
        jax.clear_caches()

    def scan_time(fn, *arrs, iters=16):
        """Device-side loop; returns ms/call (carries ~2.7 ms/iter scan
        overhead — fine for the relative A/Bs here)."""

        @jax.jit
        def run():
            def body(c, _):
                o = fn(arrs[0] + c.astype(arrs[0].dtype) * 1e-12,
                       *arrs[1:])
                leaves = jax.tree_util.tree_leaves(o)
                s = sum(jnp.sum(t).astype(jnp.float32) for t in leaves)
                return s * 1e-30, None

            c, _ = lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=iters)
            return c

        np.asarray(jax.device_get(run()))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(run()))
            ts.append(time.perf_counter() - t0)
        return min(ts) / iters * 1e3

    def row(name, thunk):
        t0 = time.time()
        try:
            results[name] = round(thunk(), 3)
            print(f"-> {name}: {results[name]} ms "
                  f"(wall {time.time() - t0:.0f}s)", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:160] if str(e) else repr(e)
            results[name] = f"FAIL: {type(e).__name__}: {msg}"
            print(f"-> {name}: {results[name]}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    rng = np.random.default_rng(0)

    def mk(b, n, h, dh, dtype, m=3):
        return tuple(
            jnp.asarray(rng.standard_normal((b, n, h, dh)) * 0.5, dtype)
            for _ in range(m)
        )

    B, H = 8, 4  # realistic training grid extents (r4_vmem_probe note)

    # ---- 1. guard: measured-good bf16 fwd config, limit None vs 100M
    q64, k64, v64 = mk(B, 4096, H, 64, jnp.bfloat16)
    set_limit(None)
    row("guard_fwd_bf16_4k_none",
        lambda: scan_time(lambda q, k, v: fa._flash_fwd(q, k, v, 0.125, block_q=512),
                          q64, k64, v64))
    set_limit(HUNDRED_MIB)
    row("guard_fwd_bf16_4k_100m",
        lambda: scan_time(lambda q, k, v: fa._flash_fwd(q, k, v, 0.125, block_q=512),
                          q64, k64, v64))

    # ---- 2a. fwd fp32 N=4096: chooser-demoted vs raised-limit bq=512
    q32, k32, v32 = mk(B, 4096, H, 32, jnp.float32)
    set_limit(None)
    row("fwd_fp32_4k_demoted256_none",
        lambda: scan_time(
            lambda q, k, v: fa._flash_fwd(q, k, v, 0.177, block_q=512),
            q32, k32, v32))  # cap demotes to 256 internally
    set_limit(HUNDRED_MIB)
    # bypass the cap to run the true bq=512 config under the raised limit
    orig_cap = fa._fwd_block_q_cap
    fa._fwd_block_q_cap = lambda b, k, d: b
    row("fwd_fp32_4k_bq512_100m",
        lambda: scan_time(
            lambda q, k, v: fa._flash_fwd(q, k, v, 0.177, block_q=512),
            q32, k32, v32))
    fa._fwd_block_q_cap = orig_cap

    # ---- 2b. dh=128 boundary follow-up at the DEFAULT limit
    qb, kb, vb = mk(B, 3840, H, 128, jnp.float32)
    set_limit(None)
    row("fwd_fp32_3840_dh128_none",
        lambda: scan_time(
            lambda q, k, v: fa._flash_fwd(q, k, v, 0.088, block_q=512), qb, kb, vb))
    del qb, kb, vb

    # ---- 2c. single-K-step extension at N=8192 (bf16)
    q8, k8, v8 = mk(B // 4, 8192, H, 64, jnp.bfloat16)
    set_limit(None)
    row("fwd_bf16_8k_auto_none",
        lambda: scan_time(lambda q, k, v: fa._flash_fwd(q, k, v, 0.125, block_q=512),
                          q8, k8, v8))
    set_limit(HUNDRED_MIB)
    row("fwd_bf16_8k_singlek_100m",
        lambda: scan_time(
            lambda q, k, v: fa._flash_fwd(q, k, v, 0.125, block_q=512, block_k=8192),
            q8, k8, v8))

    # ---- 3. backward: streaming (production) vs fused-at-100MiB
    for dh in (32, 64):
        qt, kt, vt, gt = mk(B, 4096, H, dh, jnp.bfloat16, m=4)
        s = dh ** -0.5
        set_limit(None)
        out, lse = fa._flash_fwd(qt, kt, vt, s, block_q=512,
                                 return_lse=True)
        lse1 = lse[:, :, :1]  # what the VJP actually saves
        bh, n_pad = lse.shape[0], lse.shape[1]

        def stream(q, k, v, o, g, l1):
            lse_b = jnp.broadcast_to(l1, (bh, n_pad, 128))
            return fa._streaming_bwd(q, k, v, o, g, lse_b, s,
                                     block_q=512, block_k=1024)

        row(f"bwd_stream_4k_dh{dh}_none",
            lambda: scan_time(stream, qt, kt, vt, out, gt, lse1))
        set_limit(HUNDRED_MIB)
        for bq in (128, 256, 512):
            row(f"bwd_fused_4k_dh{dh}_bq{bq}_100m",
                lambda bq=bq: scan_time(
                    lambda q, k, v, g: fa._fused_bwd(q, k, v, g, s,
                                                     block_q=bq),
                    qt, kt, vt, gt))
        # numerics: fused vs streaming grads (device-side scalar)
        try:
            d1 = fa._fused_bwd(qt, kt, vt, gt, s, block_q=256)
            set_limit(None)
            lse_b = jnp.broadcast_to(lse1, (bh, n_pad, 128))
            d2 = fa._streaming_bwd(qt, kt, vt, out, gt, lse_b, s,
                                   block_q=512, block_k=1024)
            rel = max(
                float(jnp.linalg.norm((a - b).astype(jnp.float32))
                      / (jnp.linalg.norm(b.astype(jnp.float32)) + 1e-9))
                for a, b in zip(d1, d2)
            )
            results[f"parity_fused_vs_stream_dh{dh}_relL2"] = rel
            print(f"-> parity dh{dh}: rel-L2 {rel:.2e}", flush=True)
        except Exception:
            traceback.print_exc()
        del qt, kt, vt, gt, out, lse, lse1

    # ---- 3b. N=8192: does fused still win past the single-K regime?
    qt, kt, vt, gt = mk(B // 4, 8192, H, 64, jnp.bfloat16, m=4)
    s = 64 ** -0.5
    set_limit(None)
    out, lse = fa._flash_fwd(qt, kt, vt, s, block_q=512, return_lse=True)
    lse1 = lse[:, :, :1]
    bh, n_pad = lse.shape[0], lse.shape[1]

    def stream8(q, k, v, o, g, l1):
        lse_b = jnp.broadcast_to(l1, (bh, n_pad, 128))
        return fa._streaming_bwd(q, k, v, o, g, lse_b, s,
                                 block_q=512, block_k=1024)

    row("bwd_stream_8k_dh64_none",
        lambda: scan_time(stream8, qt, kt, vt, out, gt, lse1))
    set_limit(HUNDRED_MIB)
    for bq in (256, 512):
        row(f"bwd_fused_8k_dh64_bq{bq}_100m",
            lambda bq=bq: scan_time(
                lambda q, k, v, g: fa._fused_bwd(q, k, v, g, s,
                                                 block_q=bq),
                qt, kt, vt, gt))

    set_limit(None)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    try:
        main()
    except Exception:
        traceback.print_exc()
        sys.exit(1)
