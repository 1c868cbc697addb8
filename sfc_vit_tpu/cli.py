"""Training CLI -- the declarative replacement for the reference's
edit-the-source ``main.py``.

Example (the reference's flagship config, ``main.py:269-314``):

    python -m sfc_vit_tpu.cli --dataset cifar10 --data-root /data \\
        --model vit1d --tokenizer hierarchical --curve morton \\
        --patch-size-list 16 4 1 --embed-dim 256 --depth 8 --heads 4 \\
        --mlp-dim 512 --batch-size 512 --epochs 300 --warmup-epochs 10

Smoke test (no data / network needed):

    python -m sfc_vit_tpu.cli --dataset synthetic --epochs 1 \\
        --steps-per-epoch 3 --batch-size 32
"""

from __future__ import annotations

import argparse

import numpy as np

_ATTN_IMPLS = ("auto", "xla", "xla_bf16", "pallas", "local", "ring", "sp")


def _parse_attn_impl(s: str):
    """'auto' -> 'auto'; 'local,local,auto' -> ('local','local','auto').

    A comma-separated value is a per-layer schedule (family-B models;
    length is validated against depth at model build time)."""
    parts = tuple(p.strip() for p in s.split(","))
    bad = [p for p in parts if p not in _ATTN_IMPLS]
    if bad:
        raise argparse.ArgumentTypeError(
            f"unknown attention implementation(s) {bad}; "
            f"choose from {_ATTN_IMPLS}"
        )
    return parts[0] if len(parts) == 1 else parts


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sfc_vit_tpu", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    d = p.add_argument_group("data")
    d.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "cifar10", "tiny-imagenet",
                            "imagefolder"])
    d.add_argument("--data-root", default=None)
    d.add_argument("--img-size", type=int, default=32)
    d.add_argument("--batch-size", type=int, default=512)
    d.add_argument("--loader", default="numpy",
                   choices=("numpy", "grain"),
                   help="host batch loader backend: the dependency-free "
                        "numpy iterator, or grain (thread read-ahead; "
                        "identical deterministic batch stream)")
    d.add_argument("--loader-threads", type=int, default=4,
                   help="grain read threads (--loader grain only)")
    d.add_argument("--no-augment", action="store_true",
                   help="skip train-time augmentation")

    m = p.add_argument_group("model")
    m.add_argument("--model", default="vit1d",
                   choices=["vit", "vit1d", "hier", "simple", "curvevit"])
    m.add_argument("--tokenizer", default="hierarchical",
                   choices=["2d", "1d", "hierarchical"])
    m.add_argument("--curve", default="morton")
    m.add_argument("--patch-size", type=int, default=4)
    m.add_argument("--patch-size-list", type=int, nargs="+",
                   default=[16, 4, 1])
    m.add_argument("--embed-dim", type=int, default=256)
    m.add_argument("--depth", type=int, default=8)
    m.add_argument("--heads", type=int, default=4)
    m.add_argument("--mlp-dim", type=int, default=512)
    m.add_argument("--posemb", default="none",
                   choices=["none", "sincos1d", "gfpe", "learned"])
    m.add_argument("--dtype", default=None,
                   help="compute dtype, e.g. bfloat16")
    m.add_argument("--remat", action="store_true",
                   help="rematerialize encoder layers (memory for FLOPs)")
    m.add_argument("--fused-tokenizer", action="store_true",
                   help="use the Pallas fused gather+GEMM tokenizer")
    m.add_argument("--attn-impl", default="auto", type=_parse_attn_impl,
                   help="attention implementation: one of auto|xla|"
                        "xla_bf16|pallas|local|ring|sp for every layer, "
                        "or a comma-separated per-layer schedule of "
                        "length --depth (family-B models), e.g. "
                        "'local,local,local,auto' for a hybrid "
                        "local/global long-context stack")
    m.add_argument("--merge-layers", type=int, nargs="+", default=[],
                   help="curve-pair token merging after these layers "
                        "(model curvevit; measured winner for >=1k "
                        "tokens: --merge-layers 1 --merge-ratio 0.5)")
    m.add_argument("--merge-ratio", type=float, default=0.5,
                   help="fraction of curve-adjacent token pairs merged "
                        "at each merge layer")

    t = p.add_argument_group("training")
    t.add_argument("--epochs", type=int, default=300)
    t.add_argument("--warmup-epochs", type=int, default=10)
    t.add_argument("--lr", type=float, default=3e-4)
    t.add_argument("--weight-decay", type=float, default=5e-5)
    t.add_argument("--no-mixing", action="store_true",
                   help="disable mixup/cutmix")
    t.add_argument("--seed", type=int, default=42)
    t.add_argument("--steps-per-epoch", type=int, default=None,
                   help="cap steps per epoch (smoke tests)")
    t.add_argument("--workdir", default=None)
    t.add_argument("--resume", action="store_true")
    t.add_argument("--eval-only", action="store_true",
                   help="restore the best checkpoint and evaluate")
    t.add_argument("--data-parallel", type=int, default=-1)
    t.add_argument("--model-parallel", type=int, default=1)
    t.add_argument("--pipeline-parallel", type=int, default=1,
                   help="pipeline stages over the 'pipe' mesh axis "
                        "(pre-norm ViT families; depth must divide)")
    t.add_argument("--pipeline-microbatches", type=int, default=4)
    t.add_argument("--fsdp", action="store_true",
                   help="fully-sharded data parallel (ZeRO-3 over the "
                        "'data' axis): params + Adam moments sharded, "
                        "XLA inserts the gather/reduce-scatter "
                        "collectives; composes with --model-parallel")
    t.add_argument("--grad-accum", type=int, default=1,
                   help="gradient-accumulation microbatches per update "
                        "(peak activation memory / N; batch size must "
                        "divide)")
    t.add_argument("--tensorboard", action="store_true",
                   help="also write TensorBoard event files under "
                        "--workdir (process 0 only)")
    t.add_argument("--dropout-key-impl", default="auto",
                   choices=["auto", "rbg", "threefry"],
                   help="dropout mask PRNG: auto = TPU hardware RNG "
                        "(+35%% flagship train), threefry = "
                        "cross-version-replayable bitstream")
    t.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu)")
    t.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache directory: "
                        "re-runs of the same config skip the 5-20 min "
                        "cold compile on the remote TPU backend")
    return p


def _load_dataset(args):
    from .data import (
        CIFAR10_MEAN,
        CIFAR10_STD,
        IMAGENET_MEAN,
        IMAGENET_STD,
        load_cifar10,
        load_image_folder,
        load_tiny_imagenet,
        synthetic_dataset,
    )

    if args.dataset == "synthetic":
        train = synthetic_dataset(n=4096, hw=args.img_size, seed=args.seed)
        test = synthetic_dataset(n=512, hw=args.img_size, seed=args.seed + 1)
        stats = ((0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    elif args.dataset == "cifar10":
        assert args.data_root, "--data-root required for cifar10"
        train = load_cifar10(args.data_root, train=True)
        test = load_cifar10(args.data_root, train=False)
        stats = (CIFAR10_MEAN, CIFAR10_STD)
    elif args.dataset == "tiny-imagenet":
        assert args.data_root, "--data-root required"
        train = load_tiny_imagenet(args.data_root, "train", hw=args.img_size)
        test = load_tiny_imagenet(args.data_root, "val", hw=args.img_size)
        stats = (IMAGENET_MEAN, IMAGENET_STD)
    else:
        assert args.data_root, "--data-root required"
        train = load_image_folder(f"{args.data_root}/train", hw=args.img_size)
        test = load_image_folder(f"{args.data_root}/val", hw=args.img_size)
        stats = (IMAGENET_MEAN, IMAGENET_STD)
    return train, test, stats


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    if args.compile_cache:
        from .utils import enable_compile_cache

        enable_compile_cache(args.compile_cache)

    # Multi-host: join the jax.distributed cluster BEFORE any jax use
    # (no-op outside a cluster — fires only on the JAX_COORDINATOR_ADDRESS
    # auto-detect env).  Without this a 2-host CLI launch would silently
    # run as 2 independent single-process trainings racing on --workdir.
    from .parallel import init_distributed

    init_distributed()

    from .data import epoch_batches, make_eval_transform, make_train_augment
    from .registry import ModelConfig, build_model
    from .training import TrainConfig, Trainer

    if args.loader == "grain":
        import functools

        from .data import grain_epoch_batches, have_grain

        if not have_grain():
            raise SystemExit("--loader grain: grain is not installed")
        epoch_batches = functools.partial(
            grain_epoch_batches, num_threads=args.loader_threads
        )

    train_ds, test_ds, (mean, std) = _load_dataset(args)

    mcfg = ModelConfig(
        model=args.model, tokenizer=args.tokenizer, curve=args.curve,
        img_size=args.img_size, patch_size=args.patch_size,
        patch_size_list=tuple(args.patch_size_list),
        embed_dim=args.embed_dim, depth=args.depth, n_heads=args.heads,
        mlp_dim=args.mlp_dim, num_classes=train_ds.num_classes,
        posemb=args.posemb, remat=args.remat, fused=args.fused_tokenizer,
        dtype=args.dtype, attn_impl=args.attn_impl,
        merge_layers=tuple(args.merge_layers), merge_ratio=args.merge_ratio,
    )
    model = build_model(mcfg)

    # steps/epoch that will actually execute: each process iterates its
    # 1/process_count shard at batch_size per process, so dividing the
    # FULL dataset length would overstate steps by process_count x —
    # stretching the LR schedule horizon and corrupting resume's
    # step//steps_per_epoch epoch recovery.
    steps = (len(train_ds) // jax.process_count()) // args.batch_size
    if args.steps_per_epoch:
        steps = min(steps, args.steps_per_epoch)
    tcfg = TrainConfig(
        num_classes=train_ds.num_classes, epochs=args.epochs,
        warmup_epochs=args.warmup_epochs, base_lr=args.lr,
        weight_decay=args.weight_decay, use_mixing=not args.no_mixing,
        seed=args.seed, workdir=args.workdir,
        data_parallel=args.data_parallel,
        model_parallel=args.model_parallel,
        pipeline_parallel=args.pipeline_parallel,
        pipeline_microbatches=args.pipeline_microbatches,
        dropout_key_impl=args.dropout_key_impl,
        grad_accum=args.grad_accum,
        fsdp=args.fsdp,
        tensorboard=args.tensorboard,
        # ring/sp attention needs the ambient sequence_sharding context
        # at trace time or it silently degrades to local XLA attention
        # (attn_impl may be a per-layer schedule tuple — any ring/sp
        # layer needs the context)
        sequence_parallel=any(
            i in ("ring", "sp")
            for i in ((args.attn_impl,) if isinstance(args.attn_impl, str)
                      else args.attn_impl)
        ),
    )
    trainer = Trainer(
        model, tcfg, steps_per_epoch=steps,
        sample_input=np.zeros(
            (2, args.img_size, args.img_size, 3), np.float32
        ),
    )
    eval_tf = make_eval_transform(mean, std)

    def eval_data():
        # batches stay ON DEVICE (see the train-loop note below)
        for xb, yb in epoch_batches(
            test_ds, args.batch_size, shuffle=False, drop_last=False,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        ):
            yield eval_tf(xb), yb

    if args.eval_only:
        assert trainer.checkpointer is not None, "--eval-only needs --workdir"
        # layout-aware: converts a best checkpoint saved under a
        # different --pipeline-parallel setting (like maybe_resume)
        trainer.restore_best()
        result = trainer.evaluate(eval_data())
        print(
            f"eval: step={int(trainer.state.step)} "
            f"test_loss={result['test_loss']:.4f} "
            f"test_accuracy={result['test_accuracy']:.4f}"
        )
        return result

    if args.resume:
        resumed = trainer.maybe_resume()
        print(f"resume: {'restored step ' + str(int(trainer.state.step)) if resumed else 'no checkpoint found'}")

    aug = (
        make_train_augment(args.img_size, mean, std)
        if not args.no_augment
        else None
    )
    aug_key = jax.random.key(args.seed + 17)
    # resume-aware epoch counter: shuffle order and augmentation keys
    # continue from the restored epoch, keeping runs replayable.
    epoch_holder = [trainer.start_epoch]

    def train_epoch_data():
        epoch = epoch_holder[0]
        epoch_holder[0] += 1
        count = 0
        # multi-host: each process yields its DISJOINT shard of every
        # epoch (same seeded permutation, strided split); shard_batch
        # assembles the process-order global batch on the mesh.
        for xb, yb in epoch_batches(
            train_ds, args.batch_size, seed=args.seed, epoch=epoch,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        ):
            if count >= steps:
                break
            count += 1
            if aug is not None:
                x = aug(jax.random.fold_in(aug_key, epoch * 100003 + count), xb)
            else:
                x = eval_tf(xb)
            # x stays ON DEVICE: np.asarray here would fetch the whole
            # augmented batch back to the host only for the train step
            # to re-upload it — on the remote-tunnel TPU that readback
            # round-trip dominated the host pipeline (round 3 fix).
            # Trainer.shard_batch device_puts are no-ops / D2D.
            yield x, yb

    result = trainer.fit(train_epoch_data, eval_data)
    print(
        f"done: best_test_accuracy={result.get('best_test_accuracy', 0):.4f}"
    )
    return result


if __name__ == "__main__":
    main()
