"""Headline benchmark: ViT-B/16 Hilbert-order vs raster-order throughput.

Prints ONE JSON line:
    {"metric": "vitb16_hilbert_images_per_sec", "value": <hilbert ips>,
     "unit": "images/sec/chip", "vs_baseline": <hilbert_ips / raster_ips>}

``vs_baseline`` >= 0.95 is the BASELINE.md north star (curve reordering
within 5% of raster).  Extra detail goes to stderr.

Usage:
    python bench.py            # full ViT-B/16 on the available accelerator
    python bench.py --quick    # tiny model (CI / CPU smoke)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _build(curve: str, quick: bool, attn_impl: str, dtype):
    from sfc_vit_tpu.models import CurveViT, SimpleViT

    if quick:
        kw = dict(image_size=32, patch_size=4, num_classes=10, dim=64,
                  depth=2, heads=2, mlp_dim=128, dim_head=32)
    else:
        # ViT-B/16 @ 224: 196 tokens, dim 768, depth 12, heads 12.
        kw = dict(image_size=224, patch_size=16, num_classes=1000, dim=768,
                  depth=12, heads=12, mlp_dim=3072, dim_head=64)
    if curve == "raster":
        return SimpleViT(dtype=dtype, attn_impl=attn_impl, **kw)
    return CurveViT(curve=curve, dtype=dtype, attn_impl=attn_impl, **kw)


#: measured single-chip MXU envelope for bf16 GEMMs on this stack
#: (scripts/mxu_speed_of_light.py, v5e) — the denominator that makes
#: the headline img/s self-interpreting as an MFU percentage.
_MXU_ENVELOPE_TFS = 160.5


def _model_flops_per_image(quick: bool, train: bool) -> float:
    """Nominal dense GEMM FLOPs of the benched ViT per image.

    Standard MFU accounting: 2 FLOPs/MAC on the model's *logical*
    GEMMs (patch embed + per-layer qkv/logits/weighted-sum/out-proj/MLP
    + head); kernel padding (196→208) and softmax/LN VPU work are
    excluded, so the reported MFU is conservative.  Training counts the
    conventional 3× (backward ≈ 2× forward GEMM FLOPs); the optimizer
    is bandwidth, not FLOPs.
    """
    if quick:
        n, d, f, depth, p, classes = 64, 64, 128, 2, 4, 10
    else:
        n, d, f, depth, p, classes = 196, 768, 3072, 12, 16, 1000
    embed = 2 * n * (p * p * 3) * d
    per_layer = (
        2 * n * d * (3 * d)      # qkv projection
        + 4 * n * n * d          # logits + weighted sum
        + 2 * n * d * d          # out projection
        + 2 * 2 * n * d * f      # MLP fc1 + fc2
    )
    head = 2 * d * classes
    fwd = embed + depth * per_layer + head
    return 3.0 * fwd if train else float(fwd)


def _throughput(
    model, params, x, iters: int, apply_fn=None, unroll: int = 4,
    seq_ctx=None,
) -> float:
    """Device-side timing: the iteration loop runs as one jitted
    ``lax.scan`` (a single dispatch), with each iteration's input
    perturbed by the previous output so the compiler cannot hoist the
    loop-invariant forward out of the scan.  ``unroll`` model
    applications run per scan iteration (chained through the same
    perturbation so none is CSE'd away): a K=1 carry-chained scan adds
    ~2.7 ms of per-iteration carry/boundary overhead on this stack and
    understates ABSOLUTE throughput (CLAUDE.md instrument calibration;
    relative numbers like vs_baseline were never affected).  ``iters``
    counts total model applications.  Ends in a real host readback --
    robust against async-dispatch runtimes where block_until_ready
    means only "handle exists"."""
    import contextlib

    import jax
    import jax.numpy as jnp
    import numpy as _np
    from jax import lax

    if apply_fn is None:
        def apply_fn(p, v):
            return model.apply({"params": p}, v)

    length = max(1, iters // unroll)
    total = length * unroll
    if seq_ctx is None:
        seq_ctx = contextlib.nullcontext

    @jax.jit
    def run(p, v):
        def body(carry, _):
            c = carry
            for _k in range(unroll):
                out = apply_fn(p, v + c * 1e-24)
                c = out.mean().astype(v.dtype)
            return c, None

        c, _ = lax.scan(body, jnp.zeros((), v.dtype), None, length=length)
        return c

    with seq_ctx():  # tracing-time switch (ring/sp attention)
        _np.asarray(jax.device_get(run(params, x)))  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _np.asarray(jax.device_get(run(params, x)))
            times.append(time.perf_counter() - t0)
    return x.shape[0] * total / min(times)


def _train_throughput(curve, args, x, dtype, jax, seq_ctx=None) -> float:
    """Full training-step throughput (fwd+bwd+AdamW+mixing) via lax.scan.

    ``args.unroll`` train steps run per scan iteration (genuine state
    dependency chains them), amortizing the scan-boundary carry copies
    of the whole TrainState — same instrument correction as
    :func:`_throughput`."""
    import contextlib

    import jax.numpy as jnp
    import numpy as _np
    from jax import lax

    from sfc_vit_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
        warmup_cosine,
    )

    classes = 10 if args.quick else 1000
    model = _build(curve, args.quick, args.attn_impl, dtype)
    sched = warmup_cosine(3e-4, 10, 1000)
    state = create_train_state(
        model, jax.random.key(0), x[:2].astype(jnp.float32),
        make_optimizer(sched),
    )
    step = make_train_step(num_classes=classes, schedule=sched)
    y = jnp.zeros((x.shape[0],), jnp.int32)
    xf = x.astype(jnp.float32)
    unroll = args.unroll
    length = max(1, args.iters // unroll)
    total = length * unroll
    if seq_ctx is None:
        seq_ctx = contextlib.nullcontext

    @jax.jit
    def run(state, xf, y, key):
        def body(carry, i):
            st, _ = carry
            for k in range(unroll):
                st, metrics = step(
                    st, (xf, y), jax.random.fold_in(key, i * unroll + k)
                )
            return (st, metrics["loss"]), None

        (st, loss), _ = lax.scan(
            body, (state, jnp.float32(0)), jnp.arange(length)
        )
        return loss

    key = jax.random.key(1)
    with seq_ctx():
        _np.asarray(jax.device_get(run(state, xf, y, key)))  # compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _np.asarray(jax.device_get(run(state, xf, y, key)))
            times.append(time.perf_counter() - t0)
    return x.shape[0] * total / min(times)


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--iters", type=int, default=20,
                   help="total model applications (steps) per timed run")
    p.add_argument("--unroll", type=int, default=4,
                   help="applications per scan iteration (K=1 scans "
                        "carry ~2.7 ms/iter of overhead — CLAUDE.md; "
                        "set 1 to reproduce the round-2/3 instrument)")
    p.add_argument("--curve", default="hilbert")
    p.add_argument("--attn-impl", default="auto",
                   choices=["auto", "xla", "xla_bf16", "pallas", "local", "ring", "sp"])
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--platform", default=None)
    p.add_argument("--train", action="store_true",
                   help="measure training-step throughput instead")
    p.add_argument("--quant", default=None,
                   choices=[None, "int8", "int8-static"],
                   help="opt-in post-training int8 serving path "
                        "(sfc_vit_tpu.quant; inference only). "
                        "'int8-static' calibrates per-tensor activation "
                        "scales on the bench input first")
    args = p.parse_args(argv)
    if args.train and args.quant:
        p.error("--quant is inference-only (post-training quantization); "
                "combine it with the default inference bench")

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    dtype = jnp.dtype(args.dtype) if args.dtype else None
    batch = args.batch_size or (32 if args.quick else 256)
    hw = 32 if args.quick else 224

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, hw, hw, 3)),
        dtype=dtype or jnp.float32,
    )

    seq_ctx = None
    if args.attn_impl in ("ring", "sp"):
        # ring/sp are tracing-time switches: without an ambient
        # sequence_sharding context they silently fall back to local XLA
        # attention and the printed attn= label would be a lie.
        from sfc_vit_tpu.parallel import make_mesh, sequence_sharding

        mesh = make_mesh(data=1, model=len(jax.devices()), pipe=1)
        seq_ctx = lambda: sequence_sharding(mesh, axis="model")
        print(
            f"# sequence sharding over model={len(jax.devices())} "
            "for ring/sp", file=sys.stderr,
        )

    results = {}
    # dict.fromkeys dedups --curve raster (benching raster twice costs a
    # second 5-20 min remote compile and reports a meaningless 1.0)
    for curve in dict.fromkeys(("raster", args.curve)):
        if args.train:
            results[curve] = _train_throughput(
                curve, args, x, dtype, jax, seq_ctx=seq_ctx
            )
            print(
                f"# {curve:8s} {results[curve]:12.1f} train images/sec "
                f"(backend={jax.default_backend()}, batch={batch})",
                file=sys.stderr,
            )
            continue
        model = _build(curve, args.quick, args.attn_impl, dtype)
        params = model.init({"params": jax.random.key(0)}, x[:1])["params"]
        if dtype is not None:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
                params,
            )

        apply_fn = None
        if args.quant in ("int8", "int8-static"):
            from sfc_vit_tpu.quant import (
                build_int8_serving_tables,
                quantized_apply,
            )

            # the canonical serving build (discovery-gated paths,
            # calibration as an overlay): deriving paths from the
            # calibration output instead would leave weight-mode holder
            # reads (to_qkv/fc1/... on the TPU fused path) unquantized
            # — an invalid A/B vs --quant int8
            qtable, stripped = build_int8_serving_tables(
                model, {"params": params}, x,
                calibration=[x] if args.quant == "int8-static" else None,
            )
            stripped = stripped["params"]
            # Bundle the side-table INTO the jit argument: closing over
            # it would bake ~d_model^2*depth int8 bytes into the HLO as
            # constants (HTTP 413 on the remote backend, CLAUDE.md).
            params = {"p": stripped, "q": qtable}

            def apply_fn(bundle, v, _m=model):
                return quantized_apply(
                    _m, {"params": bundle["p"]}, bundle["q"], v
                )

        ips = _throughput(
            model, params, x, args.iters, apply_fn,
            unroll=args.unroll, seq_ctx=seq_ctx,
        )
        results[curve] = ips
        print(
            f"# {curve:8s} {ips:12.1f} images/sec "
            f"(backend={jax.default_backend()}, batch={batch}, "
            f"dtype={args.dtype}, attn={args.attn_impl})",
            file=sys.stderr,
        )

    hil, ras = results[args.curve], results["raster"]
    prefix = "quick" if args.quick else "vitb16"
    if args.train:
        prefix += "_train"
    if args.quant:
        # distinct metric key: int8 numbers must never be conflated
        # with the unquantized headline the judge tracks
        prefix += "_" + args.quant.replace("-", "_")
    record = {
        "metric": f"{prefix}_{args.curve}_images_per_sec",
        "value": round(hil, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(hil / ras, 4),
    }
    # MFU context (VERDICT r4 item 8): effective TF/s of the nominal
    # model GEMMs at the measured img/s, as a fraction of the measured
    # 160.5 TF/s bf16 MXU envelope.  Dense-model accounting — for
    # --attn-impl local the nominal-FLOP MFU overstates executed work,
    # so it is emitted for the dense-equivalent impls only.
    # (--quick is a CPU smoke: the TPU envelope denominator would be
    # meaningless there, so MFU is emitted for the full config only.)
    if args.attn_impl in ("auto", "xla", "xla_bf16", "pallas") \
            and not args.quant and not args.quick:
        flops = _model_flops_per_image(args.quick, args.train)
        tfs = hil * flops / 1e12
        record["tflops_per_sec"] = round(tfs, 1)
        record["mfu"] = round(tfs / _MXU_ENVELOPE_TFS, 4)
        print(
            f"# MFU: {tfs:.1f} TF/s effective = "
            f"{100 * tfs / _MXU_ENVELOPE_TFS:.1f}% of the "
            f"{_MXU_ENVELOPE_TFS} TF/s measured bf16 MXU envelope "
            f"({flops / 1e9:.2f} GFLOP/img nominal, "
            f"{'train 3x fwd' if args.train else 'fwd'})",
            file=sys.stderr,
        )
    print(json.dumps(record))
    return record


if __name__ == "__main__":
    main()
