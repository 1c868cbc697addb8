"""A/B the scoped-VMEM limit on the STREAMING flash backward pair.

The round-4 scaling refresh (results/r4_scaling_refresh.json) measured
the >8k grads well above the old RESULTS.md table rows (16k: 16.78 vs
14.18 ms; 32k: 31.43 vs 22.43) — the one config never isolated when
`_VMEM_LIMIT` moved to 100 MiB: the original limit A/B compared
streaming-at-16MiB against fused-at-100MiB.  Same suspicion as the
local-attention backward (which measured an 8% loss under the raise):
small fixed (512, 1024) tiles over-buffer under a big budget.

Grad through the PUBLIC flash_attention at 16k (1x4) and 32k (1x2),
bf16 dh64 (the RESULTS table geometries), with the new
`_VMEM_LIMIT_STREAM_BWD` at None (16 MiB) vs 100 MiB — the forward
keeps its measured-good 100 MiB in both arms.  One process.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r4_stream_bwd_vmem_ab.py > /tmp/r4_sbwd.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import numpy as np

OUT = "results/r4_stream_bwd_vmem_ab.json"


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

    def row(name, thunk, limit):
        t0 = time.time()
        orig = fa._VMEM_LIMIT_STREAM_BWD
        try:
            fa._VMEM_LIMIT_STREAM_BWD = limit
            jax.clear_caches()
            results[name] = round(thunk(), 3)
            print(f"-> {name}: {results[name]} ms "
                  f"(wall {time.time() - t0:.0f}s)", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:160] if str(e) else repr(e)
            results[name] = f"FAIL: {type(e).__name__}: {msg}"
            print(f"-> {name}: {results[name]}", flush=True)
        finally:
            fa._VMEM_LIMIT_STREAM_BWD = orig
            jax.clear_caches()
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    rng = np.random.default_rng(0)

    def grad_fn(a, b, c):
        def loss(x, y, z):
            return jnp.sum(
                fa.flash_attention(x, y, z).astype(jnp.float32) ** 2
            ) * 1e-9
        return jax.grad(loss, argnums=(0, 1, 2))(a, b, c)

    for b, n, h in ((1, 16384, 4), (1, 32768, 2)):
        q, k, v = (
            jnp.asarray(rng.standard_normal((b, n, h, 64)) * 0.5,
                        jnp.bfloat16)
            for _ in range(3)
        )
        for lim, tag in ((None, "16m"), (100 * 2 ** 20, "100m")):
            row(f"grad_{n}_sbwd_{tag}",
                lambda q=q, k=k, v=v: scan_time(grad_fn, q, k, v),
                limit=lim)
        del q, k, v

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
