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
        results[mode] = {
            "build_s": round(build_s, 2),
            "weight_bytes": eng.weight_bytes(),
            "images_per_sec": round(big / wall, 1),
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
    }
    with open("results/r3_serving_family_b.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
