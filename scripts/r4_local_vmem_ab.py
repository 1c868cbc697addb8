"""A/B the scoped-VMEM limit on the curve-local attention kernels.

flash_attention's 100 MiB raise measured -8.3% on its N=4096 forward
(deeper double-buffering of its big logits tiles).  The local kernels
work on window-sized tiles that sit far under 16 MiB, so the prior is
"no effect" — but the flash result says measure, don't model.  Forward
and fwd+bwd at the RESULTS.md local-attention benchmark geometry
(N=4096, block=256, halo=1, ViT-B heads), both limits, one process.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r4_local_vmem_ab.py > /tmp/r4_local_vmem.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import numpy as np

OUT = "results/r4_local_vmem_ab.json"


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import sfc_vit_tpu.ops.local_attention as la

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
        orig = la._VMEM_LIMIT
        try:
            la._VMEM_LIMIT = limit
            jax.clear_caches()
            results[name] = round(thunk(), 3)
            print(f"-> {name}: {results[name]} ms "
                  f"(wall {time.time() - t0:.0f}s)", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:160] if str(e) else repr(e)
            results[name] = f"FAIL: {type(e).__name__}: {msg}"
            print(f"-> {name}: {results[name]}", flush=True)
        finally:
            la._VMEM_LIMIT = orig
            jax.clear_caches()
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((8, 4096, 4, 64)) * 0.5,
                    jnp.bfloat16)
        for _ in range(3)
    )

    def fwd(a, b, c):
        return la.local_block_attention(a, b, c, block=256, halo=1)

    def grad_fn(a, b, c):
        def loss(x, y, z):
            return jnp.sum(fwd(x, y, z).astype(jnp.float32) ** 2) * 1e-9
        return jax.grad(loss, argnums=(0, 1, 2))(a, b, c)

    for lim, tag in ((None, "16m"), (100 * 2 ** 20, "100m")):
        row(f"local_fwd_4k_b256_h1_{tag}",
            lambda: scan_time(fwd, q, k, v), limit=lim)
        row(f"local_grad_4k_b256_h1_{tag}",
            lambda: scan_time(grad_fn, q, k, v), limit=lim)

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
