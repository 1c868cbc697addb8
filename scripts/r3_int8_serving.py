"""Round-3 int8 serving measurement (VERDICT item 5).

Round 2 asserted "int8-resident weights halve serving HBM" without
measuring it.  This probe, in ONE process on the chip:

  1. ViT-B/16 bf16 serving throughput (the 4,026 img/s configuration).
  2. int8 (dynamic per-token activations) serving throughput.
  3. Device-memory footprint of the resident parameters: bf16 tree vs
     int8-stripped tree + side table, via device.memory_stats() deltas
     (falls back to nbytes accounting when the backend lacks stats).

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r3_int8_serving.py > /tmp/r3_int8.log 2>&1 &
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _throughput(apply_fn, params, x, iters=20, reps=3):
    @jax.jit
    def run(p, v):
        def body(c, _):
            out = apply_fn(p, v + (c * 1e-24).astype(v.dtype))
            return out.mean().astype(jnp.float32), None

        c, _ = lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    np.asarray(jax.device_get(run(params, x)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run(params, x)))
        ts.append(time.perf_counter() - t0)
    return x.shape[0] * iters / min(ts)


def _tree_nbytes(tree):
    return int(sum(
        a.size * a.dtype.itemsize for a in jax.tree_util.tree_leaves(tree)
        if hasattr(a, "dtype")
    ))


def _device_bytes():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return int(stats.get("bytes_in_use", -1))
    except Exception:
        return -1


def _measure(name, model, x, apply_kwargs, out):
    from sfc_vit_tpu.quant import (
        discover_dense_paths,
        quantize_dense_params,
        quantized_apply,
        strip_quantized_kernels,
    )

    params = model.init(
        {"params": jax.random.key(0)}, x[:1], **apply_kwargs
    )["params"]
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params,
    )
    mem0 = _device_bytes()
    params = jax.device_put(params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    mem_bf16 = _device_bytes()
    bf16_bytes = _tree_nbytes(params)
    ips_bf16 = _throughput(
        lambda p, v: model.apply({"params": p}, v, **apply_kwargs),
        params, x,
    )
    print(f"{name} bf16:  {ips_bf16:9.1f} img/s, params "
          f"{bf16_bytes/2**20:.1f} MiB "
          f"(device delta {(mem_bf16-mem0)/2**20:.1f} MiB)", flush=True)

    paths = discover_dense_paths(
        model, {"params": params}, x[:1], **apply_kwargs
    )
    qtable = quantize_dense_params({"params": params}, paths=paths)
    stripped = strip_quantized_kernels({"params": params}, qtable)[
        "params"
    ]
    bundle = {"p": stripped, "q": qtable}
    del params
    mem1 = _device_bytes()
    bundle = jax.device_put(bundle)
    jax.block_until_ready(jax.tree_util.tree_leaves(bundle)[0])
    mem_int8 = _device_bytes()
    int8_bytes = _tree_nbytes(bundle)
    ips_int8 = _throughput(
        lambda b, v: quantized_apply(
            model, {"params": b["p"]}, b["q"], v, **apply_kwargs
        ),
        bundle, x,
    )
    print(f"{name} int8:  {ips_int8:9.1f} img/s, resident "
          f"{int8_bytes/2**20:.1f} MiB "
          f"({len(paths)} quantized paths, device delta "
          f"{(mem_int8-mem1)/2**20:.1f} MiB)", flush=True)
    out[name] = {
        "bf16_images_per_sec": ips_bf16,
        "int8_images_per_sec": ips_int8,
        "bf16_param_bytes": bf16_bytes,
        "int8_resident_bytes": int8_bytes,
        "weight_memory_ratio": int8_bytes / bf16_bytes,
        "n_quantized_paths": len(paths),
        "device_delta_bf16": mem_bf16 - mem0,
        "device_delta_int8": mem_int8 - mem1,
        "batch": int(x.shape[0]),
    }


def main():
    from sfc_vit_tpu.models import CurveViT
    from sfc_vit_tpu.registry import ModelConfig, build_model

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    out = {}

    # Family A flagship at ViT-B width: every projection is a real
    # nn.Dense, so the int8 interceptor reaches the whole transformer —
    # this is where "int8 halves serving weight memory" must hold.
    flag = build_model(ModelConfig(
        model="vit1d", tokenizer="hierarchical", curve="morton",
        img_size=32, patch_size_list=(16, 4, 1), embed_dim=768,
        depth=12, n_heads=12, mlp_dim=3072, num_classes=1000,
        attn_impl="auto",
    ))
    xa = jnp.asarray(
        rng.standard_normal((512, 32, 32, 3)), jnp.bfloat16
    )
    _measure("flagship_vitb_width", flag, xa,
             {"deterministic": True}, out)

    # Fused-kernel ViT-B/16 (the 4k img/s serving config): the fused
    # blocks consume _DenseParams directly, so only the interceptor-
    # reachable embed/head quantize — measured for the honest negative.
    kw = dict(image_size=224, patch_size=16, num_classes=1000, dim=768,
              depth=12, heads=12, mlp_dim=3072, dim_head=64)
    vitb = CurveViT(curve="hilbert", dtype=jnp.bfloat16, **kw)
    xb = jnp.asarray(
        rng.standard_normal((256, 224, 224, 3)), jnp.bfloat16
    )
    _measure("vitb16_fused", vitb, xb, {}, out)

    with open("results/r3_int8_serving.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
