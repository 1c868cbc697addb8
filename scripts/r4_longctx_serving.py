"""Serving the longctx-16k operating point through the AOT engine.

Completes the long-context story on the deployment side: the round-3/4
serving engine work (AOT fixed-shape executables, int8-resident
weights, static activation scales) was measured at 32x32 flagship and
ViT-B geometries only; this drives the 16,384-token `longctx-16k`
preset (CurveViT hilbert 128x128/patch-1, token merge r=0.5@L1)
through `ServingEngine` in four modes, one process:

  * native / attn auto  — streaming-flash inference
  * native / attn local — curve-local windowed (the measured train
    winner at this length, results/r4_longctx_train.json)
  * int8_static / local — calibrated int8-resident weights
  * int8_static / auto

Logit parity is asserted int8-vs-native within the same attn impl
(auto vs local compute different functions by design).

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r4_longctx_serving.py > /tmp/r4_lcs.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

OUT = "results/r4_longctx_serving.json"
BS = 8
IMAGE = 128


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
    from sfc_vit_tpu.registry import build_model, preset_config
    from sfc_vit_tpu.serving import ServingEngine

    print("devices:", jax.devices(), flush=True)
    assert jax.default_backend() == "tpu"

    rng = np.random.default_rng(0)
    x_host = rng.standard_normal((BS, IMAGE, IMAGE, 3))
    calib = [x_host[:4], x_host[4:8]]

    results = {"note": "device-side scan timing, bs=8, 16,384 tokens "
                       "(longctx-16k preset, merge r=0.5@L1)"}

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    engines = {}
    params_cache = {}
    for name, attn, kw in (
        ("native_auto", "auto", {}),
        ("native_local", "local", {}),
        ("int8_local", "local",
         {"weights": "int8", "calibration": calib}),
        ("int8_auto", "auto",
         {"weights": "int8", "calibration": calib}),
    ):
        t0 = time.time()
        try:
            model = build_model(
                preset_config("longctx-16k", attn_impl=attn,
                              num_classes=1000)
            )
            if attn not in params_cache:
                x1 = jnp.asarray(x_host[:1], jnp.bfloat16)
                params_cache[attn] = model.init(
                    {"params": jax.random.key(0)}, x1
                )
            eng = ServingEngine(
                model, params_cache[attn],
                image_shape=(IMAGE, IMAGE, 3), batch_sizes=(BS,),
                dtype=jnp.bfloat16, **kw,
            )
            x_dev = jax.device_put(jnp.asarray(x_host, jnp.bfloat16))
            dev = _device_time_per_call(eng, x_dev)
            results[name] = {
                "ms_per_batch": round(dev * 1e3, 2),
                "device_images_per_sec": round(BS / dev, 1),
                "weight_bytes": eng.weight_bytes(),
            }
            engines[name] = eng
            print(f"-> {name}: {results[name]} "
                  f"(wall {time.time() - t0:.0f}s)", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:200] if str(e) else repr(e)
            results[name] = f"FAIL: {type(e).__name__}: {msg}"
            print(f"-> {name}: {results[name]}", flush=True)
        save()

    for q, n in (("int8_local", "native_local"),
                 ("int8_auto", "native_auto")):
        if q in engines and n in engines:
            a = engines[n].predict(x_host)
            b = engines[q].predict(x_host)
            rel = float(np.linalg.norm(a - b) / np.linalg.norm(a))
            results[f"{q}_vs_{n}"] = {
                "logit_rel_l2": round(rel, 5),
                "argmax_agree": round(
                    float((a.argmax(-1) == b.argmax(-1)).mean()), 4),
                "weight_mem_ratio": round(
                    results[q]["weight_bytes"]
                    / results[n]["weight_bytes"], 3),
                "device_throughput_ratio": round(
                    results[q]["device_images_per_sec"]
                    / results[n]["device_images_per_sec"], 3),
            }
            print(f"{q}_vs_{n}", results[f"{q}_vs_{n}"], flush=True)
            save()

    print("done.", flush=True)


if __name__ == "__main__":
    main()
