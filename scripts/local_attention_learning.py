#!/usr/bin/env python
"""Does curve-local attention LEARN as well as dense? (round 4 protocol;
round-3 VERDICT weak-item 2: the first cut was a tie at 1/128 eval
granularity in a low-accuracy regime, which shows non-divergence but
cannot resolve an accuracy cost of windowing).

Round-4 protocol changes that make the question resolvable:
  * 1,024 eval samples (1/1024 granularity; was 128),
  * 3 arms — dense XLA / Pallas flash (exact, kernel) / curve-local
    windowed (block 128, halo 1) — so kernel-vs-math effects separate
    from windowing-vs-dense effects,
  * 2,048 training steps per seed (16 epochs x 128 steps, warmup-cosine
    over the full budget; was 128 steps total) — the model trains into
    a separated regime where a real windowing cost would be visible
    above seed noise.

Model: CurveViT 256x256/patch-4 hilbert (4,096 tokens — the
long-context family where SFC locality is the thesis), on the
class-separable synthetic set (CIFAR-10 absent on this zero-egress
image; same caveat as results/compare_curves_synthetic.json).

``--task relational`` is the POSITIVE CONTROL (first run of the
texture task saturated every arm at 1.0: windowing costs nothing
terminally there, but a ceiling tie can't prove the instrument would
DETECT a cost).  Each image carries two 32x32 sinusoid markers at
opposite corners — ~4,000 tokens apart along the Hilbert curve, far
beyond the depth-2 local receptive field (block 128, halo 1) — and the
label is (p1 - p2) mod 4, a pure relation: each marker alone is
uniform over patterns, and the mean-pooled marginals feed a LINEAR
head, so XOR-style class structure is unreadable without cross-site
attention.  Dense arms should solve it; the local arm should sit near
chance (0.25).  A measured dense-vs-local gap here validates that the
texture-task tie is a real "no cost", not instrument blindness.

``--task relational-v2`` is the round-5 instrument (VERDICT r4 item 3:
the v1 control was marginal — dense finals 0.49 ± 0.22, one seed in
three never learned in 16 epochs).  Same cross-site structure, easier
per-site features: the two corner markers are luminance-matched SOLID
COLORS (red vs blue — per-site identification is linearly trivial) and
the label is the binary XOR of the two color bits (chance 0.5).  The
relation stays additively unreadable (pooled feature = f(p1) + g(p2);
XOR is not linear in that sum), so pure-local arms must stay at
chance, while dense should saturate in a few epochs — the reliable
discriminator every schedule A/B needs.  Acceptance bar (VERDICT):
dense finals >= 0.9 with std <= 0.05 within <= 10 epochs.

``--task texture-hard`` is a NON-SATURATING texture regime (VERDICT r4
item 2: the merge-on default was validated only at the texture-task
ceiling, where a zero delta is uninformative): the per-class sinusoid
templates of the standard synthetic set at 0.12 amplitude under 0.15
noise, so final accuracy lands mid-range and a merge-induced accuracy
cost is resolvable.

Arms are IMPL[+mergeR] specs: a comma-joined impl list is a per-layer
schedule whose length sets that arm's depth (``local,local,local,xla``
= the shipped hybrid shape with a dense-XLA global layer); a
``+merge0.5`` suffix enables ``curve_pair_merge_topk`` with
merge_layers=(1,) at that ratio for that arm.  Results are written
incrementally after every arm so a truncated run still yields data.

Whole epochs run device-side (lax.scan over index batches into the
device-resident uint8 dataset) — the remote chip costs ~40 ms per
dispatch, so per-step dispatch would dominate.

    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/local_attention_learning.py > /tmp/r3_local.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--epochs", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps-per-epoch", type=int, default=128)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--train-samples", type=int, default=2048)
    p.add_argument("--eval-samples", type=int, default=1024)
    p.add_argument("--impls", nargs="+",
                   default=["local", "pallas", "xla"])
    p.add_argument("--task",
                   choices=["texture", "relational", "relational-v2",
                            "texture-hard"],
                   default="texture")
    p.add_argument("--patch-size", type=int, default=4)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--depth", type=int, default=2,
                   help="depth for single-impl arms; schedule arms "
                        "(comma-joined) use their own entry count")
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--mlp-dim", type=int, default=256)
    p.add_argument("--dim-head", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--texture-amp", type=float, default=0.12)
    p.add_argument("--texture-noise", type=float, default=0.15)
    p.add_argument("--model-dtype", default=None,
                   help="e.g. bfloat16 for the 16k preset geometry")
    p.add_argument("--platform", default=None)
    p.add_argument("--steps-per-call", type=int, default=None,
                   help="split each epoch's device-side step scan into "
                        "chunks of this many steps (must divide "
                        "--steps-per-epoch). The remote tunnel KILLS "
                        "the TPU worker on single executable calls "
                        "beyond ~1 minute (measured round 5: a "
                        "128-step 16k-token epoch at ~0.8 s/step "
                        "crashed 3/3 runs at the first readback, a "
                        "16-step call passed) — 16k runs need ~16 "
                        "steps/call. Device work is identical; one "
                        "~40 ms dispatch is added per chunk.")
    p.add_argument("--out", default="results/local_attention_learning.json")
    p.add_argument("--resume-from", default=None,
                   help="path to a partial artifact from an aborted "
                        "run: arms already complete there (full "
                        "seeds x epochs) are copied instead of re-run, "
                        "making tunnel-hang retries cheap")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sfc_vit_tpu.data import Dataset, synthetic_dataset
    from sfc_vit_tpu.models import CurveViT
    from sfc_vit_tpu.training import (
        create_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
        warmup_cosine,
    )

    def relational_dataset(n, hw, seed):
        """Two sinusoid markers at opposite corners; label is
        (p1 - p2) mod 4.  Marginals are uniform — only a model that can
        RELATE the two sites (≈4k tokens apart on the Hilbert curve)
        beats chance through the linear head over mean-pooled tokens."""
        rng = np.random.default_rng(seed)
        p1 = rng.integers(0, 4, size=n)
        p2 = rng.integers(0, 4, size=n)
        labels = ((p1 - p2) % 4).astype(np.int32)
        m = max(hw // 8, 8)  # marker side
        yy, xx = np.mgrid[0:m, 0:m].astype(np.float32) / m
        pats = np.stack([
            np.sin(2 * np.pi * ((k + 1) * xx + (3 - k) * yy))
            for k in range(4)
        ])  # [4, m, m]
        imgs = np.full((n, hw, hw, 3), 0.5, np.float32)
        imgs[:, :m, :m, :] = pats[p1][..., None] * 0.5 + 0.5
        imgs[:, -m:, -m:, :] = pats[p2][..., None] * 0.5 + 0.5
        imgs += rng.normal(0, 0.05, imgs.shape).astype(np.float32)
        return Dataset(
            (np.clip(imgs, 0, 1) * 255).astype(np.uint8), labels, 4
        )

    def relational_v2_dataset(n, hw, seed):
        """Round-5 instrument: luminance-matched solid-color corner
        markers (red vs blue), label = color-bit XOR, chance 0.5.
        Per-site identification is trivial; only the cross-site
        relation carries label information (marginals uniform)."""
        rng = np.random.default_rng(seed)
        p1 = rng.integers(0, 2, size=n)
        p2 = rng.integers(0, 2, size=n)
        labels = (p1 ^ p2).astype(np.int32)
        m = max(hw // 4, 8)
        # same per-channel energy either way: no pooled-brightness leak
        colors = np.asarray(
            [[0.9, 0.2, 0.2], [0.2, 0.2, 0.9]], np.float32
        )
        imgs = np.full((n, hw, hw, 3), 0.5, np.float32)
        imgs[:, :m, :m, :] = colors[p1][:, None, None, :]
        imgs[:, -m:, -m:, :] = colors[p2][:, None, None, :]
        imgs += rng.normal(0, 0.05, imgs.shape).astype(np.float32)
        return Dataset(
            (np.clip(imgs, 0, 1) * 255).astype(np.uint8), labels, 2
        )

    def texture_hard_dataset(n, hw, seed, num_classes=10):
        """Non-saturating texture regime: the synthetic per-class
        sinusoid templates at --texture-amp amplitude under
        --texture-noise noise (the standard set uses 0.5/0.1 and every
        arm saturates at 1.0).  More tokens = more evidence, so the
        amplitude must shrink with image size to stay off-ceiling —
        calibrate at the target geometry."""
        rng = np.random.default_rng(seed)
        labels = rng.integers(0, num_classes, size=n).astype(np.int32)
        yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32) / hw
        templates = np.stack([
            np.sin(2 * np.pi * ((k + 1) * xx + k * yy))[..., None]
            * np.ones((1, 1, 3), np.float32)
            for k in range(num_classes)
        ])
        imgs = templates[labels] * args.texture_amp + 0.5
        imgs += rng.normal(
            0, args.texture_noise, imgs.shape
        ).astype(np.float32)
        return Dataset(
            (np.clip(imgs, 0, 1) * 255).astype(np.uint8), labels,
            num_classes,
        )

    hw = args.image_size
    if args.task == "relational":
        train_ds = relational_dataset(args.train_samples, hw, seed=0)
        test_ds = relational_dataset(args.eval_samples, hw, seed=1)
    elif args.task == "relational-v2":
        train_ds = relational_v2_dataset(args.train_samples, hw, seed=0)
        test_ds = relational_v2_dataset(args.eval_samples, hw, seed=1)
    elif args.task == "texture-hard":
        train_ds = texture_hard_dataset(args.train_samples, hw, seed=0)
        test_ds = texture_hard_dataset(args.eval_samples, hw, seed=1)
    else:
        train_ds = synthetic_dataset(n=args.train_samples, hw=hw, seed=0)
        test_ds = synthetic_dataset(n=args.eval_samples, hw=hw, seed=1)
    n_classes = train_ds.num_classes
    n_train = len(train_ds)
    n_test = len(test_ds)
    imgs_tr = jnp.asarray(train_ds.images)   # device-resident uint8
    lbl_tr = jnp.asarray(train_ds.labels)
    imgs_te = jnp.asarray(test_ds.images)
    lbl_te = jnp.asarray(test_ds.labels)
    mean = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    std = jnp.asarray([0.25, 0.25, 0.25], jnp.float32)

    def norm(u8):
        return (u8.astype(jnp.float32) / 255.0 - mean) / std

    bs = args.batch_size
    spe = args.steps_per_epoch
    total = args.epochs * spe
    n_eval = n_test // bs
    results = {}
    prior = {}
    if args.resume_from:
        try:
            with open(args.resume_from) as f:
                prior = json.load(f).get("results", {})
        except (OSError, ValueError) as e:
            print(f"resume-from unreadable ({e}); running all arms")

    for arm in args.impls:
        prev = prior.get(arm)
        if (prev and len(prev["per_seed"]) == args.seeds
                and len(prev["per_seed"][0]) == args.epochs):
            print(f"{arm}: complete in {args.resume_from}, copying")
            results[arm] = prev
            _write(args, results, partial=True)
            continue
        # arm spec: IMPL[+mergeR].  'local,xla' = a per-layer hybrid
        # schedule (one entry per layer; entry count sets that arm's
        # depth): the relational control's fix — sparse global layers
        # restore the cross-site routing pure-local provably lacks
        # (models/simple_vit._impl_schedule).  '+merge0.5' enables
        # curve_pair_merge_topk at layer 1 for that arm (VERDICT r4
        # item 2: validate the merge-on default off-ceiling).
        impl, merge_ratio = arm, None
        if "+merge" in arm:
            impl, mr = arm.split("+merge", 1)
            merge_ratio = float(mr)
        attn_impl = tuple(impl.split(",")) if "," in impl else impl
        depth = len(attn_impl) if isinstance(attn_impl, tuple) \
            else args.depth
        model = CurveViT(
            curve="hilbert", image_size=hw, patch_size=args.patch_size,
            num_classes=n_classes,
            dim=args.dim, depth=depth, heads=args.heads,
            mlp_dim=args.mlp_dim, dim_head=args.dim_head,
            attn_impl=attn_impl,
            merge_layers=(1,) if merge_ratio else (),
            merge_ratio=merge_ratio or 0.5,
            dtype=(jnp.dtype(args.model_dtype)
                   if args.model_dtype else None),
        )
        sched = warmup_cosine(args.lr, spe, total)
        tx = make_optimizer(sched)
        step = make_train_step(num_classes=n_classes, use_mixing=False,
                               schedule=sched)
        estep = make_eval_step(num_classes=n_classes)

        # Dataset tensors are ARGUMENTS, not closure captures: a
        # closed-over 400 MB uint8 array risks being baked into the
        # lowered program (HTTP 413 over the remote-compile tunnel,
        # CLAUDE.md).
        @jax.jit
        def train_epoch(state, idxs, key, imgs, lbls):
            def body(st, i):
                st, m = step(
                    st, (norm(imgs[i]), lbls[i]), key
                )
                return st, m["loss"]

            state, losses = lax.scan(body, state, idxs)
            return state, losses.mean()

        @jax.jit
        def eval_all(state, idxs, imgs, lbls):
            def body(carry, i):
                m = estep(state, (norm(imgs[i]), lbls[i]))
                return carry, (m["correct"], m["count"])

            _, (cor, cnt) = lax.scan(body, 0, idxs)
            return cor.sum() / cnt.sum()

        eidx = jnp.arange(n_eval * bs).reshape(n_eval, bs)
        per_seed = []
        for seed in range(args.seeds):
            state = create_train_state(
                model, jax.random.key(seed),
                jnp.zeros((1, hw, hw, 3), jnp.float32), tx,
            )
            accs = []
            rng = np.random.default_rng(100 + seed)
            for ep in range(args.epochs):
                need = spe * bs
                if need <= n_train:
                    order = rng.permutation(n_train)[:need]
                else:  # sample with replacement past one full pass
                    order = rng.choice(n_train, size=need)
                idxs = jnp.asarray(order.reshape(spe, bs))
                spc = args.steps_per_call or spe
                if spe % spc:
                    raise SystemExit(
                        f"--steps-per-call {spc} must divide "
                        f"--steps-per-epoch {spe}")
                ekey = jax.random.key(seed * 1000 + ep)
                losses = []
                # chunked host loop: same jitted executable reused for
                # every chunk (shape (spc, bs)); keeps each device call
                # under the tunnel's ~1 min kill threshold
                for c in range(spe // spc):
                    state, loss = train_epoch(
                        state, idxs[c * spc:(c + 1) * spc], ekey,
                        imgs_tr, lbl_tr,
                    )
                    losses.append(loss)
                loss = jnp.stack(losses).mean()
                acc = float(eval_all(state, eidx, imgs_te, lbl_te))
                accs.append(acc)
                print(f"{arm} seed={seed} epoch={ep + 1} "
                      f"loss={float(loss):.4f} acc={acc:.4f}", flush=True)
            per_seed.append(accs)
        arr = np.asarray(per_seed)
        results[arm] = {
            "per_seed": arr.tolist(),
            "mean": arr.mean(axis=0).tolist(),
            "std": arr.std(axis=0).tolist(),
        }
        _write(args, results, partial=True)  # survive truncation

    summary = _write(args, results, partial=False,
                     extra=dict(batch=bs, steps_per_epoch=spe,
                                train_samples=n_train,
                                eval_samples=n_eval * bs, hw=hw,
                                n_classes=n_classes))
    print(json.dumps(summary))


_DENSE = {"xla", "xla_bf16", "pallas", "auto"}


def _dense_baseline(results):
    """First arm whose every schedule entry is exact dense math and
    which carries no token merging — the delta reference."""
    for arm in results:
        impl = arm.split("+merge")[0]
        if all(e in _DENSE for e in impl.split(",")):
            return arm
    return None


def _write(args, results, partial, extra=None):
    summary = {
        arm: {
            "final_mean": r["mean"][-1],
            "final_std": r["std"][-1],
            "best_mean": max(r["mean"]),
        }
        for arm, r in results.items()
    }
    # Pairwise deltas vs the dense control arm (exact-math reference):
    # a windowing/merge cost shows up as arm-minus-dense < -(combined
    # std).
    base_arm = _dense_baseline(results)
    if base_arm is not None:
        base = np.asarray(results[base_arm]["per_seed"])[:, -1]
        for arm, r in results.items():
            if arm == base_arm:
                continue
            vals = np.asarray(r["per_seed"])[:, -1]
            summary[arm]["final_delta_vs_dense"] = float(
                vals.mean() - base.mean()
            )
            # ddof=1 needs >=2 seeds; emit JSON-safe null, not NaN
            summary[arm]["delta_std"] = float(
                np.sqrt(vals.var(ddof=1) / len(vals)
                        + base.var(ddof=1) / len(base))
            ) if len(vals) > 1 and len(base) > 1 else None
    hw = args.image_size
    chance = {"relational": 0.25, "relational-v2": 0.5}.get(
        args.task, None
    )
    task_desc = {
        "relational": "relational positive control: two corner "
                      "markers, label=(p1-p2)%4, chance=0.25",
        "relational-v2": "round-5 instrument: solid-color corner "
                         "markers, label=color XOR, chance=0.5 "
                         "(module docstring)",
        "texture-hard": "non-saturating texture regime (0.12 "
                        "amplitude / 0.15 noise sinusoid classes)",
        "texture": "synthetic class-separable (CIFAR-10 absent; see "
                   "compare_curves_synthetic.json)",
    }[args.task]
    out = {
        "protocol": {
            "model": f"CurveViT hilbert {hw}x{hw}/p{args.patch_size} "
                     f"({(hw // args.patch_size) ** 2} tokens) "
                     f"d{args.dim}/h{args.heads}/mlp{args.mlp_dim} "
                     f"(depth per arm: schedule length, else "
                     f"{args.depth})",
            "local_window": "block=128 halo=1 (ops/local_attention.py "
                            "defaults)",
            "task": args.task,
            "dataset": task_desc,
            "chance": chance,
            "lr": args.lr,
            **({"texture_amp": args.texture_amp,
                "texture_noise": args.texture_noise}
               if args.task == "texture-hard" else {}),
            "model_dtype": args.model_dtype,
            "dense_baseline_arm": base_arm,
            "seeds": args.seeds, "epochs": args.epochs,
            "partial": partial,
            **(extra or {}),
        },
        "results": results,
        "summary": summary,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    return summary


if __name__ == "__main__":
    main()
