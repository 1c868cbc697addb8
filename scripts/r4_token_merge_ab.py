#!/usr/bin/env python
"""Token merging: accuracy-vs-throughput A/B (round-4 VERDICT item 2).

``ops/token_merge.py::curve_pair_merge_topk`` (ToMe specialised to
curve adjacency) shipped in round 3 with unit tests but no evidence it
buys anything.  This sweep measures both sides of the trade on the
long-sequence family the reference's 1D tokenizers live in
(hilbert_embedding1D.py:18 — 1,024 tokens on CIFAR; plus the 4k-token
scale where merging has more leverage):

  * arms: no-merge baseline, merge_ratio in {0.25, 0.5} applied after
    layer 1 or layer 3 of a depth-4 CurveViT,
  * accuracy: 3 seeds x 12 epochs x 64 steps (warmup-cosine over the
    full budget), 1,024 eval samples, class-separable synthetic set
    (CIFAR-10 absent on this zero-egress image),
  * throughput: device-side scan (bench.py instrument, unroll=4),
    bf16 inference at the same geometry.

One process for all arms (CLAUDE.md A/B rule: cross-process variance
on the remote chip is +-2-3%).

    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r4_token_merge_ab.py > /tmp/r4_token_merge.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ARMS = [
    {"name": "baseline", "merge_layers": (), "merge_ratio": 0.0},
    {"name": "r25_l1", "merge_layers": (1,), "merge_ratio": 0.25},
    {"name": "r50_l1", "merge_layers": (1,), "merge_ratio": 0.5},
    {"name": "r25_l3", "merge_layers": (3,), "merge_ratio": 0.25},
    {"name": "r50_l3", "merge_layers": (3,), "merge_ratio": 0.5},
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--steps-per-epoch", type=int, default=64)
    p.add_argument("--image-sizes", type=int, nargs="+",
                   default=[128, 256])
    p.add_argument("--train-samples", type=int, default=2048)
    p.add_argument("--eval-samples", type=int, default=1024)
    p.add_argument("--platform", default=None)
    p.add_argument("--skip-accuracy", action="store_true")
    p.add_argument("--out", default="results/r4_token_merge_ab.json")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sfc_vit_tpu.data import synthetic_dataset
    from sfc_vit_tpu.models import CurveViT
    from sfc_vit_tpu.training import (
        create_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
        warmup_cosine,
    )

    on_tpu = jax.default_backend() == "tpu"
    results = {}

    def build(hw, arm, bs_train):
        return CurveViT(
            curve="hilbert", image_size=hw, patch_size=4,
            num_classes=10, dim=128, depth=4, heads=4, mlp_dim=256,
            dim_head=32, merge_layers=arm["merge_layers"],
            merge_ratio=arm["merge_ratio"], attn_impl="auto",
        )

    def infer_throughput(model, hw, bs, iters=48, unroll=4):
        """bench.py-style device-side scan; returns images/sec."""
        x = jnp.zeros((bs, hw, hw, 3), jnp.bfloat16)
        params = model.init({"params": jax.random.key(0)},
                            x[:1].astype(jnp.float32))["params"]
        params = jax.tree_util.tree_map(
            lambda t: t.astype(jnp.bfloat16)
            if t.dtype == jnp.float32 else t, params)
        length = max(1, iters // unroll)

        @jax.jit
        def run(p, v):
            def body(c, _):
                for _k in range(unroll):
                    out = model.apply({"params": p}, v + c * 1e-24)
                    c = out.mean().astype(v.dtype)
                return c, None

            c, _ = lax.scan(body, jnp.zeros((), v.dtype), None,
                            length=length)
            return c

        np.asarray(jax.device_get(run(params, x)))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(run(params, x)))
            ts.append(time.perf_counter() - t0)
        return bs * length * unroll / min(ts)

    for hw in args.image_sizes:
        tokens = (hw // 4) ** 2
        scale_key = f"{tokens}tok"
        bs_train = 16 if tokens <= 1024 else 8
        bs_infer = 32 if tokens <= 1024 else 8
        scale_res = {"tokens": tokens, "arms": {}}

        train_ds = synthetic_dataset(n=args.train_samples, hw=hw, seed=0)
        test_ds = synthetic_dataset(n=args.eval_samples, hw=hw, seed=1)
        imgs_tr = jnp.asarray(train_ds.images)
        lbl_tr = jnp.asarray(train_ds.labels)
        imgs_te = jnp.asarray(test_ds.images)
        lbl_te = jnp.asarray(test_ds.labels)
        mean = jnp.asarray([0.5] * 3, jnp.float32)
        std = jnp.asarray([0.25] * 3, jnp.float32)

        def norm(u8):
            return (u8.astype(jnp.float32) / 255.0 - mean) / std

        spe = args.steps_per_epoch
        total = args.epochs * spe
        n_eval = len(test_ds) // bs_train
        eidx = jnp.arange(n_eval * bs_train).reshape(n_eval, bs_train)

        for arm in ARMS:
            model = build(hw, arm, bs_train)
            t0 = time.perf_counter()
            ips = infer_throughput(model, hw, bs_infer)
            arm_res = {
                "merge_layers": list(arm["merge_layers"]),
                "merge_ratio": arm["merge_ratio"],
                "infer_images_per_sec": round(ips, 1),
                "infer_batch": bs_infer,
            }
            print(f"{scale_key} {arm['name']}: {ips:.1f} img/s "
                  f"(compile+measure {time.perf_counter() - t0:.0f}s)",
                  flush=True)

            if not args.skip_accuracy:
                sched = warmup_cosine(3e-4, spe, total)
                tx = make_optimizer(sched)
                step = make_train_step(num_classes=10, use_mixing=False,
                                       schedule=sched)
                estep = make_eval_step(num_classes=10)

                # dataset tensors as ARGUMENTS, not closures: a
                # closed-over 400 MB array risks HTTP 413 over the
                # remote-compile tunnel (CLAUDE.md)
                @jax.jit
                def train_epoch(state, idxs, key, imgs, lbls):
                    def body(st, i):
                        st, m = step(st, (norm(imgs[i]), lbls[i]),
                                     key)
                        return st, m["loss"]

                    state, losses = lax.scan(body, state, idxs)
                    return state, losses.mean()

                @jax.jit
                def eval_all(state, idxs, imgs, lbls):
                    def body(c, i):
                        m = estep(state, (norm(imgs[i]), lbls[i]))
                        return c, (m["correct"], m["count"])

                    _, (cor, cnt) = lax.scan(body, 0, idxs)
                    return cor.sum() / cnt.sum()

                per_seed = []
                for seed in range(args.seeds):
                    state = create_train_state(
                        model, jax.random.key(seed),
                        jnp.zeros((1, hw, hw, 3), jnp.float32), tx)
                    accs = []
                    rng = np.random.default_rng(100 + seed)
                    for ep in range(args.epochs):
                        need = spe * bs_train
                        if need <= len(train_ds):
                            order = rng.permutation(len(train_ds))[:need]
                        else:
                            order = rng.choice(len(train_ds), size=need)
                        idxs = jnp.asarray(
                            order.reshape(spe, bs_train))
                        state, loss = train_epoch(
                            state, idxs, jax.random.key(seed * 997 + ep),
                            imgs_tr, lbl_tr)
                        accs.append(
                            float(eval_all(state, eidx, imgs_te, lbl_te)))
                    print(f"{scale_key} {arm['name']} seed={seed} "
                          f"final_acc={accs[-1]:.4f}", flush=True)
                    per_seed.append(accs)
                arr = np.asarray(per_seed)
                arm_res.update(
                    acc_per_seed=arr.tolist(),
                    acc_final_mean=float(arr[:, -1].mean()),
                    acc_final_std=float(arr[:, -1].std()),
                    acc_best_mean=float(arr.mean(axis=0).max()),
                )
            scale_res["arms"][arm["name"]] = arm_res
        results[scale_key] = scale_res

        base = scale_res["arms"]["baseline"]
        for name, r in scale_res["arms"].items():
            if name == "baseline":
                continue
            r["speedup_vs_baseline"] = round(
                r["infer_images_per_sec"]
                / base["infer_images_per_sec"], 4)
            if "acc_final_mean" in r:
                r["acc_delta_vs_baseline"] = round(
                    r["acc_final_mean"] - base["acc_final_mean"], 4)

    out = {
        "protocol": {
            "model": "CurveViT hilbert p4 d128/depth4/h4/mlp256",
            "backend": jax.default_backend(),
            "on_tpu": on_tpu,
            "seeds": args.seeds, "epochs": args.epochs,
            "steps_per_epoch": args.steps_per_epoch,
            "eval_samples": args.eval_samples,
            "note": "one process for all arms; device-side scan timing",
        },
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({
        k: {n: {kk: r.get(kk) for kk in
                ("speedup_vs_baseline", "acc_delta_vs_baseline")}
            for n, r in v["arms"].items() if n != "baseline"}
        for k, v in results.items()}))


if __name__ == "__main__":
    main()
