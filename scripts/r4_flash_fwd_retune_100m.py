"""Retune the flash FORWARD choosers under the 100 MiB scoped-VMEM limit.

The module default `_VMEM_LIMIT` moved from Mosaic's 16 MiB to 100 MiB
(results/r4_flash_vmem_limit_ab.json: the raise alone was -8.3% on the
measured-good N=4096 bf16 forward, and it unlocked the one-pass fused
backward to N=8192).  Three forward knobs are still carrying 16 MiB-era
tuning and have never been probed in the new regime:

  1. `_auto_block_q`'s short band (512 < N < 2048 -> bq=128) was tuned
     round 1 at 16 MiB.  At 100 MiB do bq=256/512/whole-N win?
  2. `_SINGLE_KSTEP_MAX` = 4096: past it the forward streams K in 1k
     chunks because the fp32 logits pair could not fit scoped VMEM.
     At 100 MiB a single K step at 8k (bf16 live pair 24 MiB) and even
     16k (48 MiB) compiles — does full-KV data movement win over the
     streaming online softmax there?  Intermediate bk=2048/4096 rows
     separate "bigger K chunk" from "single step, no correction terms".
  3. `_fwd_block_q_cap` caps the live pair at 15 MiB (a compile
     boundary that no longer binds).  Probe bq=1024 at N=4096.

One process (CLAUDE.md: never A/B across processes); rows that need the
pair budget raised set `_FWD_PAIR_BUDGET` and clear jit caches.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r4_flash_fwd_retune_100m.py > /tmp/r4_fwd_retune.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import numpy as np

OUT = "results/r4_flash_fwd_retune_100m.json"


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

    def row(name, thunk, budget=None):
        t0 = time.time()
        orig = fa._FWD_PAIR_BUDGET
        try:
            if budget is not None:
                fa._FWD_PAIR_BUDGET = budget
                jax.clear_caches()
            results[name] = round(thunk(), 3)
            print(f"-> {name}: {results[name]} ms "
                  f"(wall {time.time() - t0:.0f}s)", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:160] if str(e) else repr(e)
            results[name] = f"FAIL: {type(e).__name__}: {msg}"
            print(f"-> {name}: {results[name]}", flush=True)
        finally:
            if budget is not None:
                fa._FWD_PAIR_BUDGET = orig
                jax.clear_caches()
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    rng = np.random.default_rng(0)

    def mk(b, n, h, dh, dtype=jnp.bfloat16):
        return tuple(
            jnp.asarray(rng.standard_normal((b, n, h, dh)) * 0.5, dtype)
            for _ in range(3)
        )

    RAISE = 100 * 2 ** 20
    s = 64 ** -0.5

    def fwd(bq, bk):
        return lambda a, b, c: fa._flash_fwd(a, b, c, s,
                                             block_q=bq, block_k=bk)

    # ---- 1. short band: bq at N=1024 / 2048 (single K step both)
    for n, bqs in ((1024, (128, 256, 512, 1024)), (2048, (128, 256, 512))):
        q, k, v = mk(8, n, 4, 64)
        for bq in bqs:
            need = 6 * bq * n > fa._FWD_PAIR_BUDGET
            row(f"fwd_{n}_bq{bq}_bk{n}",
                lambda bq=bq, n=n, q=q, k=k, v=v:
                    scan_time(fwd(bq, n), q, k, v),
                budget=RAISE if need else None)
        del q, k, v

    # ---- 3. N=4096: cap probe — bq1024 vs the shipped bq512
    q, k, v = mk(8, 4096, 4, 64)
    row("fwd_4096_bq512_bk4096",
        lambda: scan_time(fwd(512, 4096), q, k, v))
    row("fwd_4096_bq1024_bk4096",
        lambda: scan_time(fwd(1024, 4096), q, k, v), budget=RAISE)
    del q, k, v

    # ---- 2. N=8192: K-chunk sweep incl. single step
    q, k, v = mk(8, 8192, 4, 64)
    for bk in (1024, 2048, 4096, 8192):
        need = 6 * 512 * bk > fa._FWD_PAIR_BUDGET
        row(f"fwd_8192_bq512_bk{bk}",
            lambda bk=bk: scan_time(fwd(512, bk), q, k, v),
            budget=RAISE if need else None)
    del q, k, v

    # ---- 2b. N=16384 (smaller batch): stream vs single step
    q, k, v = mk(2, 16384, 2, 64)
    for bk in (1024, 4096, 16384):
        need = 6 * 512 * bk > fa._FWD_PAIR_BUDGET
        row(f"fwd_16384_bq512_bk{bk}",
            lambda bk=bk: scan_time(fwd(512, bk), q, k, v),
            budget=RAISE if need else None)

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
