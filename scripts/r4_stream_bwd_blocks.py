"""Block sweep for the streaming flash backward pair at 16k/32k.

Follow-up to r4_stream_bwd_vmem_ab (the scoped-VMEM limit measured a
tie): the >8k grad rows sit ~3.5x the forward's FLOP-normalized cost,
which is structurally consistent (dq 6 + dkv 8 vs fwd 4 FLOP units),
but the pair's (512, 1024) blocks were inherited from the forward's
optimum, never swept for the backward kernels themselves.  Sweep
(block_q, block_k) on `_streaming_bwd` directly (one geometry per
length, saved-LSE forward run once outside the timed region).

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r4_stream_bwd_blocks.py > /tmp/r4_sbwd_blocks.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import numpy as np

OUT = "results/r4_stream_bwd_blocks.json"


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
    s = 64 ** -0.5

    for b, n, h in ((1, 16384, 4), (1, 32768, 2)):
        q, k, v, g = (
            jnp.asarray(rng.standard_normal((b, n, h, 64)) * 0.5,
                        jnp.bfloat16)
            for _ in range(4)
        )
        out, lse = fa._flash_fwd(q, k, v, s, block_q=512,
                                 return_lse=True)

        def pair(bq, bk):
            # re-pad the saved LSE rows to the sweep's q block, as
            # _fa_bwd does (512-saved rows cover any divisor tile)
            def run(a, bb, c, o, gg, l):
                n_pad = fa._round_up(a.shape[1], bq)
                lb = jnp.broadcast_to(
                    l[:, :n_pad, :1], (l.shape[0], n_pad, 128)
                )
                return fa._streaming_bwd(a, bb, c, o, gg, lb, s,
                                         block_q=bq, block_k=bk)
            return run

        for bq, bk in ((512, 1024), (256, 1024), (128, 1024),
                       (512, 2048), (256, 2048), (512, 512)):
            row(f"pair_{n}_bq{bq}_bk{bk}",
                lambda bq=bq, bk=bk: scan_time(
                    pair(bq, bk), q, k, v, out, g, lse))
        del q, k, v, g, out, lse

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
