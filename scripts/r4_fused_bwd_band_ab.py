"""Follow-up to r4_flash_vmem_limit_ab: settle the fused-backward bands.

The limit A/B (results/r4_flash_vmem_limit_ab.json) measured the fused
one-pass backward beating the streaming pair at N=4096/8192 under the
100 MiB scoped-VMEM limit, which is now the module default with
_FUSED_BWD_MAX=8192 and bq=512 past 2048.  Three loose ends, one
process (CLAUDE.md: never A/B across processes):

  1. END-TO-END guard: jax.grad through the PUBLIC flash_attention at
     N=4096 — old config (16 MiB default limit + streaming crossover
     at 2048, i.e. the shipped round-3 path incl. its LSE-saving
     forward) vs the new defaults.  The kernel-level rows measured
     6.77-6.92 vs 7.3-7.7 ms; this row confirms the integrated win.
  2. The 512 < N <= 2048 band kept its round-1 bq=128 optimum, which
     was tuned at the 16 MiB limit.  Under 100 MiB, do bq=256/512
     (or whole-N) win at N=1024/2048?
  3. N=16384: does fused bq512 (16 MiB fp32 logits tile, ~5-10 live)
     still compile at 100 MiB, and does it beat streaming?  If yes,
     _FUSED_BWD_MAX rises again; a compile failure here is expected
     and fine (streaming stays).

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r4_fused_bwd_band_ab.py > /tmp/r4_band.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import numpy as np

OUT = "results/r4_fused_bwd_band_ab.json"


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import sfc_vit_tpu.ops.flash_attention as fa

    print(f"backend: {jax.default_backend()}", flush=True)
    assert jax.default_backend() == "tpu"

    results: dict = {}

    def scan_time(fn, *arrs, iters=16):
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

    B, H = 8, 4

    # ---- 1. end-to-end: grad through public flash_attention, N=4096
    q, k, v = mk(B, 4096, H, 64, jnp.bfloat16)

    def vgrad(qx, kx, vx):
        def loss(a, b, c):
            return jnp.sum(
                fa.flash_attention(a, b, c).astype(jnp.float32) ** 2
            ) * 1e-9
        return jax.grad(loss, argnums=(0, 1, 2))(qx, kx, vx)

    def set_cfg(lim, fmax):
        fa._VMEM_LIMIT = lim
        fa._FUSED_BWD_MAX = fmax
        jax.clear_caches()

    new_lim, new_max = fa._VMEM_LIMIT, fa._FUSED_BWD_MAX
    set_cfg(None, 2048)  # the shipped round-3 configuration
    row("e2e_grad_4k_old_stream16M",
        lambda: scan_time(vgrad, q, k, v))
    set_cfg(new_lim, new_max)
    row("e2e_grad_4k_new_fused100M",
        lambda: scan_time(vgrad, q, k, v))

    # ---- 2. short band: is bq=128 still right at 100 MiB?
    for n in (1024, 2048):
        qt, kt, vt, gt = mk(B, n, H, 64, jnp.bfloat16, m=4)
        s = 64 ** -0.5
        bqs = [128, 256, 512]
        if n == 1024:
            bqs.append(1024)
        for bq in bqs:
            row(f"bwd_fused_{n}_bq{bq}_100m",
                lambda bq=bq: scan_time(
                    lambda a, b, c, g: fa._fused_bwd(a, b, c, g, s,
                                                     block_q=bq),
                    qt, kt, vt, gt))
        del qt, kt, vt, gt

    # ---- 3. N=16384: fused vs streaming at the new boundary
    qt, kt, vt, gt = mk(2, 16384, 2, 64, jnp.bfloat16, m=4)
    s = 64 ** -0.5
    out, lse = fa._flash_fwd(qt, kt, vt, s, block_q=512, return_lse=True)
    lse1 = lse[:, :, :1]
    bh, n_pad = lse.shape[0], lse.shape[1]

    def stream16(a, b, c, o, g, l1):
        lse_b = jnp.broadcast_to(l1, (bh, n_pad, 128))
        return fa._streaming_bwd(a, b, c, o, g, lse_b, s,
                                 block_q=512, block_k=1024)

    row("bwd_stream_16k_dh64",
        lambda: scan_time(stream16, qt, kt, vt, out, gt, lse1))
    for bq in (256, 512):
        row(f"bwd_fused_16k_bq{bq}_100m",
            lambda bq=bq: scan_time(
                lambda a, b, c, g: fa._fused_bwd(a, b, c, g, s,
                                                 block_q=bq),
                qt, kt, vt, gt))

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
