"""On-chip A/B: ServingEngine native vs int8 (dynamic) vs int8+static
calibration, after the holder APPLY-mode routing landed.

Context: the round-3 engine measurement (results/r3_serving_onchip.json)
got +15.8% from int8 because family-A in/out projections (54% of the
weights) were holder reads served dequantize-on-read — a bf16 GEMM plus
a full weight-materialization pass — while the pre-refactor raw path
(all nn.Dense -> int8_dense) measured +46%.  Holders now have an APPLY
mode the interceptor routes to the true int8 MXU dot, and the engine
can bake STATIC activation scales (calibration=) so the quantize fuses
into producer epilogues.  This script measures all three engine modes
in ONE process (CLAUDE.md A/B rule) on the same family-A ViT-B-width
config.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r3_serving_holder_int8.py > /tmp/r3_holder_serving.log 2>&1 &
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
    """K engine forwards chained through a lax.scan carry: device-side
    per-call time (host-looped calls carry ~40 ms tunnel overhead)."""
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


def main():
    from sfc_vit_tpu.registry import ModelConfig, build_model
    from sfc_vit_tpu.serving import ServingEngine

    print("devices:", jax.devices(), flush=True)
    cfg = ModelConfig(
        model="vit1d", tokenizer="hierarchical", curve="morton",
        img_size=32, patch_size_list=(16, 4, 1), embed_dim=768,
        depth=12, n_heads=12, mlp_dim=3072, num_classes=1000,
        dtype="bfloat16", attn_impl="auto",
    )
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.bfloat16)
    params = model.init({"params": jax.random.key(0)}, x1)

    big = int(os.environ.get("R3_SERVING_BS", 512))
    x_host = rng.standard_normal((big, 32, 32, 3))
    calib = [x_host[:64], x_host[64:128]]

    results = {"note": "device-side scan timing; ratios are the "
                       "measurement. int8=dynamic act quant, "
                       "int8_static=calibrated x_scales"}
    engines = {}
    for mode, kw in (
        ("native", {}),
        ("int8", {"weights": "int8"}),
        ("int8_static", {"weights": "int8", "calibration": calib}),
    ):
        t0 = time.perf_counter()
        eng = ServingEngine(
            model, params, image_shape=(32, 32, 3),
            batch_sizes=(big,), dtype=jnp.bfloat16, **kw,
        )
        build_s = time.perf_counter() - t0
        x_dev = jax.device_put(jnp.asarray(x_host, jnp.bfloat16))
        dev = _device_time_per_call(eng, x_dev)
        results[mode] = {
            "build_s": round(build_s, 2),
            "weight_bytes": eng.weight_bytes(),
            "device_images_per_sec": round(big / dev, 1),
        }
        engines[mode] = eng
        print(mode, results[mode], flush=True)

    a = engines["native"].predict(x_host[:64])
    for mode in ("int8", "int8_static"):
        b = engines[mode].predict(x_host[:64])
        rel = float(np.linalg.norm(a - b) / np.linalg.norm(a))
        agree = float((a.argmax(-1) == b.argmax(-1)).mean())
        n = results["native"]
        q = results[mode]
        results[f"{mode}_vs_native"] = {
            "logit_rel_l2": round(rel, 5),
            "argmax_agree": round(agree, 4),
            "weight_mem_ratio": round(
                q["weight_bytes"] / n["weight_bytes"], 3),
            "device_throughput_ratio": round(
                q["device_images_per_sec"] / n["device_images_per_sec"],
                3),
        }
        print(f"{mode}_vs_native", results[f"{mode}_vs_native"],
              flush=True)

    with open("results/r3_serving_holder_int8.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
