"""On-chip ServingEngine A/B for the FUSED family (B): ViT-B/16 CurveViT.

Before holder interception this config was the honest negative in
`results/r3_int8_serving.json` (only embed/head interceptor-reachable:
0.99x memory, throughput parity).  With _DenseParams holder reads now
served weight-only from the int8 table, every encoder projection is
int8-resident — re-measure residency, throughput and logit error
through the deployment surface, one process.

    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r3_serving_family_b.py > /tmp/r3_serving_b.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def _device_time_per_call(eng, x_dev, iters=6):
    """True device-side per-call time: K forwards chained through a
    lax.scan carry (CLAUDE.md bench rule — host-looped engine calls
    carry ~40 ms of tunnel overhead each, which biases the int8/native
    RATIO toward 1).  The scan adds a ~2.7 ms/iter carry constant,
    identical for both modes, <3%% at these shapes."""
    import jax.numpy as jnp
    from jax import lax

    fwd, v, q = eng._forward, eng.variables, eng._qtable

    @jax.jit
    def run(v, q, x):
        def body(c, _):
            out = fwd(v, q, x * (1.0 + c))
            m = out.astype(jnp.float32).mean()
            return (m * 1e-30).astype(x.dtype), m

        _, outs = lax.scan(body, jnp.zeros((), x.dtype), None,
                           length=iters)
        return outs.sum()

    float(run(v, q, x_dev))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(v, q, x_dev))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def _time_calls(eng, x_dev, reps):
    np.asarray(eng._run(x_dev))  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(eng._run(x_dev))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from sfc_vit_tpu.models import CurveViT
    from sfc_vit_tpu.serving import ServingEngine

    print("devices:", jax.devices(), flush=True)
    model = CurveViT(
        curve="hilbert", image_size=224, patch_size=16, num_classes=1000,
        dim=768, depth=12, heads=12, mlp_dim=3072, dim_head=64,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((1, 224, 224, 3)), jnp.bfloat16)
    params = model.init({"params": jax.random.key(0)}, x1)

    big = int(os.environ.get("R3_SERVING_BS", 256))
    x_host = rng.standard_normal((big, 224, 224, 3))

    results = {"note": "ViT-B/16 fused family through ServingEngine; "
                       "absolute img/s tunnel-bound, ratios are the "
                       "measurement"}
    engines = {}
    for mode in ("native", "int8"):
        t0 = time.perf_counter()
        eng = ServingEngine(
            model, params, image_shape=(224, 224, 3),
            batch_sizes=(big,), dtype=jnp.bfloat16, weights=mode,
        )
        build_s = time.perf_counter() - t0
        x_dev = jax.device_put(jnp.asarray(x_host, jnp.bfloat16))
        wall = _time_calls(eng, x_dev, reps=6)
        dev = _device_time_per_call(eng, x_dev)
        results[mode] = {
            "build_s": round(build_s, 2),
            "weight_bytes": eng.weight_bytes(),
            "images_per_sec": round(big / wall, 1),
            "device_images_per_sec": round(big / dev, 1),
        }
        engines[mode] = eng
        print(mode, results[mode], flush=True)

    a = engines["native"].predict(x_host[:32])
    b = engines["int8"].predict(x_host[:32])
    rel = float(np.linalg.norm(a - b) / np.linalg.norm(a))
    results["int8_logit_rel_l2"] = round(rel, 5)
    results["argmax_match"] = round(
        float((a.argmax(-1) == b.argmax(-1)).mean()), 4
    )
    n, q = results["native"], results["int8"]
    results["int8_vs_native"] = {
        "weight_mem_ratio": round(q["weight_bytes"] / n["weight_bytes"], 3),
        "throughput_ratio": round(
            q["images_per_sec"] / n["images_per_sec"], 3),
        # the un-tunnel-biased number (device-side scan timing)
        "device_throughput_ratio": round(
            q["device_images_per_sec"] / n["device_images_per_sec"], 3),
    }
    with open("results/r3_serving_family_b.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
