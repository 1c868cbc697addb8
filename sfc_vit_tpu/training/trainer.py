"""Epoch-level training orchestration.

The JAX re-design of the reference's ``main()`` loop
(``main.py:324-355``): jitted sharded steps, per-epoch eval, structured
metrics with images/sec, Orbax best+periodic checkpointing and -- unlike
the reference -- actual resume.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from ..parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch
from .checkpoint import Checkpointer
from .metrics_logger import MetricsLogger
from .schedules import warmup_cosine, warmup_cosine_min_lr
from .steps import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

__all__ = ["TrainConfig", "Trainer"]


@dataclasses.dataclass
class TrainConfig:
    """Declarative training config (the reference's hardcoded
    hyperparameters at ``main.py:288-314`` made explicit)."""

    num_classes: int = 10
    epochs: int = 300
    warmup_epochs: int = 10
    base_lr: float = 3e-4
    weight_decay: float = 5e-5
    grad_clip: float = 1.0
    mixup_alpha: float = 0.2
    cutmix_alpha: float = 1.0
    mix_prob: float = 0.5
    use_mixing: bool = True
    schedule: str = "cosine"  # "cosine" (HF math) | "cosine_min_lr"
    min_lr: float = 1e-6
    seed: int = 42
    workdir: Optional[str] = None
    checkpoint_keep: int = 3
    checkpoint_every_epochs: int = 1
    data_parallel: int = -1  # -1: all devices
    model_parallel: int = 1
    pipeline_parallel: int = 1  # stages over the 'pipe' mesh axis
    pipeline_microbatches: int = 4  # GPipe M (bubble = (S-1)/(M+S-1))
    grad_accum: int = 1  # microbatches per update (activation memory / A)
    # ZeRO-3-style fully-sharded data parallel: params + Adam moments
    # sharded over the "data" axis (largest divisible dim of every
    # >=2-D tensor; composes with model_parallel via the TP shape
    # rule).  XLA inserts the all-gathers/reduce-scatters — per-device
    # weight+optimizer memory drops to ~1/data_parallel.  Not composed
    # with pipeline_parallel (stage sharding already partitions params).
    fsdp: bool = False
    # enter parallel.sequence_sharding(mesh, 'model') around every
    # train/eval step so attn_impl='ring'/'sp' models actually shard
    # the token axis (the context is a TRACING-time switch; without it
    # those impls silently degrade to local XLA attention while the
    # model axis does replicated work).  CLI sets this automatically
    # from --attn-impl.
    sequence_parallel: bool = False
    tensorboard: bool = False  # event files under workdir (process 0)
    # 'auto' = TPU hardware RNG for dropout mask bits (threefry key
    # derivation kept), threefry elsewhere; 'threefry' pins the
    # cross-version-replayable path.  +35% flagship train throughput
    # (results/r3_flagship_dropout_ab.json).
    dropout_key_impl: str = "auto"


class Trainer:
    """Train a model over iterable epochs of (images NHWC, labels) batches.

    ``train_data`` / ``eval_data`` are callables returning a fresh
    iterator per epoch (host-side input pipeline); batches are numpy.
    """

    def __init__(
        self,
        model,
        config: TrainConfig,
        steps_per_epoch: int,
        sample_input: np.ndarray,
        mesh=None,
        init_params=None,
    ) -> None:
        """``init_params``: optional pretrained parameter tree (same
        structure/shapes as the model's init) to fine-tune from — e.g. a
        RetrofitViT imported via ``load_torchvision_vit`` (the notebook
        cell-7 recipe, scripts/retrofit_finetune.py)."""
        self.model = model
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh(
            data=config.data_parallel, model=config.model_parallel,
            pipe=config.pipeline_parallel,
        )
        total_steps = config.epochs * steps_per_epoch
        warmup_steps = config.warmup_epochs * steps_per_epoch
        if config.schedule == "cosine":
            self.schedule = warmup_cosine(
                config.base_lr, warmup_steps, total_steps
            )
        elif config.schedule == "cosine_min_lr":
            self.schedule = warmup_cosine_min_lr(
                config.base_lr, warmup_steps, total_steps, config.min_lr
            )
        else:
            raise ValueError(f"unknown schedule {config.schedule!r}")
        tx = make_optimizer(
            self.schedule, config.weight_decay, config.grad_clip
        )
        rng = jax.random.key(config.seed)
        self.rng = rng
        self.state = create_train_state(
            model, rng, jax.numpy.asarray(sample_input), tx
        )
        if init_params is not None:
            import jax.numpy as jnp

            init_params = jax.tree_util.tree_map(
                jnp.asarray, init_params
            )
            got = jax.tree_util.tree_structure(self.state.params)
            want = jax.tree_util.tree_structure(init_params)
            if got != want:
                raise ValueError(
                    f"init_params tree mismatch: {want} vs model {got}"
                )
            for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(init_params),
                jax.tree_util.tree_leaves(self.state.params),
            ):
                if a.shape != b.shape:
                    raise ValueError(
                        f"init_params leaf {jax.tree_util.keystr(path)} "
                        f"has shape {a.shape}, model expects {b.shape}"
                    )
            # Rebuild the optimizer state from the injected params so
            # AdamW moments reference the right leaves.
            self.state = self.state.replace(
                params=init_params, opt_state=tx.init(init_params)
            )
        rep = replicated(self.mesh)
        if config.fsdp and config.pipeline_parallel > 1:
            raise ValueError(
                "fsdp=True does not compose with pipeline_parallel>1: "
                "stage sharding already partitions params over 'pipe'"
            )
        if config.pipeline_parallel > 1:
            # Pipeline-parallel model path: convert the sequential param
            # tree to the pipelined layout ({"outer", "stages"}), swap
            # apply_fn for the GPipe microbatch ring, and stage-shard
            # the stacked subtrees (plus their Adam mirrors) P('pipe').
            from ..parallel.pipeline_model import (
                make_pipelined_apply,
                pipeline_state_sharding,
                split_pipeline_params,
            )

            s = config.pipeline_parallel
            # build the apply first: make_pipelined_apply validates the
            # model family/geometry with explanatory errors, where
            # split_pipeline_params would die on a raw KeyError
            apply_fn = make_pipelined_apply(
                model, self.mesh, s, config.pipeline_microbatches
            )
            pp_params = split_pipeline_params(
                self.state.params, model.depth, s
            )
            self.state = TrainState.create(
                apply_fn=apply_fn, params=pp_params, tx=tx
            )
            state_sh = pipeline_state_sharding(self.mesh, self.state)
        elif config.fsdp:
            from ..parallel.mesh import apply_fsdp_sharding

            state_sh = apply_fsdp_sharding(self.mesh, self.state)
        elif config.model_parallel > 1 and not config.sequence_parallel:
            # Tensor parallelism: shard params + Adam mirrors over the
            # 'model' axis via the shape rule (without this the model
            # axis would do fully redundant replicated compute).  Under
            # sequence_parallel the 'model' axis shards the TOKEN axis
            # instead, so params stay replicated there.
            from ..parallel.mesh import apply_param_sharding

            state_sh = apply_param_sharding(self.mesh, self.state)
        else:
            state_sh = jax.tree_util.tree_map(
                lambda _: rep, self.state
            )
        # Shard/replicate state over the mesh; batch arrives data-sharded.
        self._state_sh = state_sh
        self.state = jax.device_put(self.state, state_sh)
        bsh = batch_sharding(self.mesh)
        train_step = make_train_step(
            num_classes=config.num_classes,
            mixup_alpha=config.mixup_alpha,
            cutmix_alpha=config.cutmix_alpha,
            mix_prob=config.mix_prob,
            use_mixing=config.use_mixing,
            schedule=self.schedule,
            dropout_key_impl=config.dropout_key_impl,
            grad_accum=config.grad_accum,
        )
        self._train_step = jax.jit(
            train_step,
            in_shardings=(state_sh, (bsh, bsh), None),
            out_shardings=(state_sh, rep),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            make_eval_step(config.num_classes),
            in_shardings=(state_sh, (bsh, bsh)),
            out_shardings=rep,
        )
        self.logger = MetricsLogger(
            config.workdir, tensorboard=config.tensorboard
        )
        self.checkpointer = (
            Checkpointer(
                f"{config.workdir}/checkpoints",
                keep=config.checkpoint_keep,
            )
            if config.workdir
            else None
        )
        self.start_epoch = 0
        self.steps_per_epoch = steps_per_epoch

    def maybe_resume(self) -> bool:
        """Restore the latest checkpoint if one exists; returns True if
        training resumed (the capability the reference lacks).

        Layout-aware: a checkpoint saved with a different
        ``--pipeline-parallel`` setting (sequential <-> pipelined param
        layout) is restored into the other layout's template and
        converted losslessly, Adam moments included
        (:mod:`~sfc_vit_tpu.parallel.pipeline_model`)."""
        if self.checkpointer is None or self.checkpointer.latest_step() is None:
            return False
        template, convert = self._restore_template()
        self.state = convert(self.checkpointer.restore(template))
        self.start_epoch = int(self.state.step) // self.steps_per_epoch
        return True

    def restore_best(self) -> None:
        """Restore the best checkpoint (the --eval-only path), with the
        same layout conversion ``maybe_resume`` applies — a sequential
        best checkpoint loads into a pipelined run and vice versa."""
        assert self.checkpointer is not None, "restore_best needs a workdir"
        template, convert = self._restore_template(which="best")
        self.state = convert(self.checkpointer.restore_best(template))

    def _restore_template(self, which: str = "latest"):
        """(template, convert) for the latest/best checkpoint: identity
        when the saved param layout matches this run's; otherwise the
        other layout's template plus the lossless conversion back."""
        ident = (self.state, lambda s: s)
        try:
            md = self.checkpointer.params_metadata(which=which)
        except Exception:
            return ident  # metadata unavailable: assume same layout
        saved_pp = isinstance(md, dict) and "stages" in md
        s_saved = (
            jax.tree_util.tree_leaves(md["stages"])[0].shape[0]
            if saved_pp else 0
        )
        s_run = (
            self.config.pipeline_parallel
            if self.config.pipeline_parallel > 1 else 0
        )
        if s_saved == s_run:
            return ident
        from ..parallel.pipeline_model import (
            merge_pipeline_state,
            split_pipeline_state,
        )

        depth = getattr(self.model, "depth", None)
        if depth is None:
            raise ValueError(
                f"checkpoint param layout (stages={s_saved or None}) "
                f"does not match this run (stages={s_run or None}) and "
                "the model exposes no depth to convert"
            )

        def to_layout(st, stages):  # 0 = sequential
            if s_run:
                st = merge_pipeline_state(st, depth, s_run)
            return (split_pipeline_state(st, depth, stages)
                    if stages else st)

        template = to_layout(self.state, s_saved)

        def convert(st):
            if s_saved:
                st = merge_pipeline_state(st, depth, s_saved)
            if s_run:
                st = split_pipeline_state(st, depth, s_run)
            return jax.device_put(st, self._state_sh)

        return template, convert

    def _seq_ctx(self):
        """Ambient sequence-parallel context for ring/sp attention —
        consulted when jax TRACES the step (first call), harmless on
        later cached calls, so every step call is wrapped uniformly."""
        if self.config.sequence_parallel:
            from ..parallel.context import sequence_sharding

            return sequence_sharding(self.mesh, axis="model")
        import contextlib

        return contextlib.nullcontext()

    def train_epoch(self, batches: Iterable) -> dict:
        losses, accs, n = [], [], 0
        t0 = time.time()
        images = 0
        for batch in batches:
            batch = shard_batch(self.mesh, batch)
            with self._seq_ctx():
                self.state, m = self._train_step(
                    self.state, batch, self.rng
                )
            losses.append(m["loss"])
            accs.append(m["accuracy"])
            images += batch[1].shape[0]
            n += 1
        # one host sync per epoch
        loss = float(np.mean(jax.device_get(losses))) if losses else 0.0
        acc = float(np.mean(jax.device_get(accs))) if accs else 0.0
        dt = time.time() - t0
        return {
            "train_loss": loss,
            "train_accuracy": acc,
            "images_per_sec": images / dt if dt > 0 else 0.0,
        }

    def evaluate(self, batches: Iterable) -> dict:
        import jax.numpy as jnp

        dsize = int(self.mesh.shape.get("data", 1))
        ms = []
        for batch in batches:
            x, y = batch[0], batch[1]
            rem = (-x.shape[0]) % dsize
            if rem:
                # ragged final batch (drop_last=False): pad rows up to
                # the data-axis multiple with label -1; the eval step
                # masks them out of every metric.
                x = jnp.concatenate(
                    [jnp.asarray(x),
                     jnp.zeros((rem,) + x.shape[1:], x.dtype)]
                )
                y = jnp.concatenate(
                    [jnp.asarray(y), jnp.full((rem,), -1, y.dtype)]
                )
            batch = (x, y)
            batch = shard_batch(self.mesh, batch)
            with self._seq_ctx():
                ms.append(self._eval_step(self.state, batch))
        # ONE host sync for the whole eval (a per-batch device_get is a
        # blocking HTTP round trip each on the remote backend)
        ms = jax.device_get(ms)
        loss_sum = float(sum(float(m["loss_sum"]) for m in ms))
        correct = int(sum(int(m["correct"]) for m in ms))
        count = int(sum(int(m["count"]) for m in ms))
        return {
            "test_loss": loss_sum / max(1, count),
            "test_accuracy": correct / max(1, count),
        }

    def fit(
        self,
        train_data: Callable[[], Iterable],
        eval_data: Callable[[], Iterable],
        epochs: Optional[int] = None,
    ) -> dict:
        cfg = self.config
        epochs = epochs if epochs is not None else cfg.epochs
        if epochs > cfg.epochs:
            import warnings

            warnings.warn(
                f"fit(epochs={epochs}) exceeds the schedule horizon "
                f"(TrainConfig.epochs={cfg.epochs}): the LR schedule "
                "has fully decayed, so the extra epochs update at "
                "lr=min_lr (cosine_min_lr) or exactly 0 (cosine — "
                "pure no-op compute)",
                stacklevel=2,
            )
        # resume-aware: recover the best metric across restarts so a
        # resumed run neither under-reports best_test_accuracy nor
        # re-saves a worse 'best' checkpoint record.
        best_acc = 0.0
        if self.checkpointer is not None:
            best_acc = self.checkpointer.best_metric() or 0.0
        record = {}
        if self.start_epoch >= epochs:
            # fully-resumed run: nothing left to train, but return the
            # documented record shape (evaluate the restored params)
            # instead of a bare {'best_test_accuracy': 0.0}.
            record = {"epoch": self.start_epoch}
            record.update(self.evaluate(eval_data()))
            self.logger.log(record)
            record["best_test_accuracy"] = max(
                best_acc, record["test_accuracy"]
            )
            return record
        for epoch in range(self.start_epoch, epochs):
            record = {"epoch": epoch + 1}
            record.update(self.train_epoch(train_data()))
            record.update(self.evaluate(eval_data()))
            self.logger.log(record)
            if self.checkpointer is not None and (
                (epoch + 1) % cfg.checkpoint_every_epochs == 0
                or record["test_accuracy"] > best_acc
            ):
                self.checkpointer.save(
                    int(self.state.step), self.state, record
                )
            best_acc = max(best_acc, record["test_accuracy"])
        if self.checkpointer is not None:
            self.checkpointer.wait()
        record["best_test_accuracy"] = best_acc
        return record
