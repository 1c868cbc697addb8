"""Subprocess worker for the real multi-process (multi-host) test.

Launched twice by ``tests/test_multihost.py`` (process_id 0 and 1), each
process owning 2 virtual CPU devices; collectives run over Gloo exactly
as a 2-host TPU job would run them over DCN.  Exercises the production
multi-host path end-to-end:

    init_distributed -> make_mesh (global 4-device mesh)
    -> host_shard_slice (this host's contiguous rows of the global batch)
    -> global_batch_from_local (make_array_from_process_local_data)
    -> jitted make_train_step with replicated state + data-sharded batch
       (XLA inserts the cross-process gradient all-reduce)

An optional 5th argv selects the state sharding mode: ``dp`` (default,
replicated params) or ``fsdp`` (``apply_fsdp_sharding``: params + Adam
moments ZeRO-3-sharded over the SAME "data" axis, which here spans the
process boundary — the per-step param all-gathers and gradient
reduce-scatters cross Gloo, exactly what a 2-host FSDP job does on DCN).
In fsdp mode the worker also round-trips the sharded TrainState through
a distributed Orbax checkpoint (argv[6]: shared directory — each
process writes/reads only the shards it owns) and digests the restore.

``pp`` mode runs the Trainer's ``--pipeline-parallel 4`` model path on
a (data=1, model=1, pipe=4) mesh whose stage ring spans both processes
(2 local devices each), so the GPipe ppermute activation rotation at
the stage-2/3 boundary crosses Gloo.  ``sp`` mode runs a CurveViT with
``attn_impl='ring'`` + ``sequence_parallel`` on (data=1, model=4): ring
attention's K/V ppermute ring crosses the boundary every layer (the
worker asserts collective_permute is in the lowered step).  Launched
with nproc=1 (4 local devices) the same code is its own single-process
reference.

Writes ``{"losses": [...], "digest": float, "ndev": int}`` as JSON to the
output path.  The digest is a full reduction over the updated params
(re-replicated in-graph first, so every process can read its local copy)
— the test asserts both processes agree bit-for-bit and match a
single-process run.

The reference has no distributed story at all (SURVEY.md §2f: no
torch.distributed anywhere); this is the new-capability axis, tested for
real rather than only via the single-process 8-device dryrun.
"""

import json
import os
import sys


def _run_trainer_mode(jax, np, out_path: str, mode: str) -> None:
    """Trainer model paths whose collectives cross the process boundary
    when nproc=2 (mesh axes of size 4 over 2x2 devices):

    * ``pp`` — --pipeline-parallel 4: the GPipe ppermute stage ring
      rotates activations across the boundary at stage 2/3;
    * ``sp`` — attn_impl='ring' + sequence_parallel on model=4: ring
      attention's K/V ppermute ring crosses the boundary every step.

    Batches are replicated over the size-1 data axis, so every process
    feeds the same full global batch (shard_batch handles assembly)."""
    from sfc_vit_tpu.models import CurveViT
    from sfc_vit_tpu.parallel import replicated
    from sfc_vit_tpu.training import TrainConfig, Trainer

    if mode == "pp":
        model = CurveViT(
            curve="hilbert", image_size=32, patch_size=4, num_classes=10,
            dim=64, depth=4, heads=2, mlp_dim=128, dim_head=32,
        )
        cfg = TrainConfig(
            num_classes=10, epochs=1, warmup_epochs=0, use_mixing=False,
            data_parallel=1, pipeline_parallel=4, pipeline_microbatches=2,
        )
    else:  # sp
        model = CurveViT(
            curve="hilbert", image_size=32, patch_size=4, num_classes=10,
            dim=64, depth=2, heads=2, mlp_dim=128, dim_head=32,
            attn_impl="ring",
        )
        cfg = TrainConfig(
            num_classes=10, epochs=1, warmup_epochs=0, use_mixing=False,
            data_parallel=1, model_parallel=4, sequence_parallel=True,
        )
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    ys = (np.arange(16) % 10).astype(np.int32)
    tr = Trainer(
        model, cfg, steps_per_epoch=2,
        sample_input=np.zeros((2, 32, 32, 3), np.float32),
    )
    batches = lambda: iter([(xs[:8], ys[:8]), (xs[8:], ys[8:])])
    if mode == "sp":
        # ring attention must actually trace its ppermute ring (a
        # silent fallback to local attention would pass parity on both
        # sides of the comparison)
        from sfc_vit_tpu.parallel.mesh import shard_batch

        b = shard_batch(tr.mesh, (xs[:8], ys[:8]))
        with tr._seq_ctx():
            txt = tr._train_step.lower(tr.state, b, tr.rng).as_text()
        assert "collective_permute" in txt, "ring attention not engaged"
    rec = tr.train_epoch(batches())
    ev = tr.evaluate(batches())

    rep = replicated(tr.mesh)
    params = jax.jit(
        lambda p: p,
        out_shardings=jax.tree_util.tree_map(lambda _: rep, tr.state.params),
    )(tr.state.params)
    digest = float(
        sum(
            np.abs(
                np.asarray(leaf.addressable_shards[0].data, np.float64)
            ).sum()
            for leaf in jax.tree_util.tree_leaves(params)
        )
    )
    with open(out_path, "w") as f:
        json.dump(
            {"losses": [rec["train_loss"], ev["test_loss"]],
             "digest": digest, "ndev": jax.device_count(),
             "eval": None, "ckpt_digest": None}, f,
        )


def main() -> None:
    pid, nproc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "dp"
    ckpt_dir = sys.argv[6] if len(sys.argv) > 6 else None
    ndev_local = 4 // nproc  # 4 global devices regardless of nproc
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev_local}"
    )

    import jax

    # The axon sitecustomize force-sets JAX_PLATFORMS; override in-process
    # (same trick as tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

    from sfc_vit_tpu.parallel import (
        batch_sharding,
        global_batch_from_local,
        host_shard_slice,
        init_distributed,
        make_mesh,
        replicated,
    )

    init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == ndev_local, jax.local_device_count()

    import numpy as np

    if mode in ("pp", "sp"):
        _run_trainer_mode(jax, np, out_path, mode)
        return

    from sfc_vit_tpu.models import SimpleViT
    from sfc_vit_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
        warmup_cosine,
    )

    mesh = make_mesh()  # (data=4, model=1, pipe=1) over both processes
    model = SimpleViT(
        image_size=16, patch_size=4, num_classes=10, dim=32, depth=1,
        heads=2, mlp_dim=64, dim_head=16,
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    y = (np.arange(8) % 10).astype(np.int32)

    sched = warmup_cosine(1e-3, 2, 10)
    state = create_train_state(
        model, jax.random.key(0), x[:2], make_optimizer(sched)
    )
    rep = replicated(mesh)
    if mode == "fsdp":
        from sfc_vit_tpu.parallel import apply_fsdp_sharding

        state_sh = apply_fsdp_sharding(mesh, state)
    else:
        state_sh = jax.tree_util.tree_map(lambda _: rep, state)
    state = jax.device_put(state, state_sh)
    bsh = batch_sharding(mesh)
    step = jax.jit(
        make_train_step(num_classes=10, schedule=sched),
        in_shardings=(state_sh, (bsh, bsh), None),
        out_shardings=(state_sh, rep),
        donate_argnums=(0,),
    )

    sl = host_shard_slice(8)  # contiguous: process-order concat == global
    batch = global_batch_from_local(mesh, (x[sl], y[sl]))

    losses = []
    key = jax.random.key(1)
    for i in range(2):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))

    eval_totals = None
    if mode == "dp":
        # Exact-sample-accounting eval across the process boundary: 7
        # samples over 2 hosts via the production strided shard
        # (epoch_batches drop_last=False pads the short host's shard
        # with label -1; make_eval_step masks those rows out of every
        # metric).  The global count must be exactly 7.
        from sfc_vit_tpu.data import Dataset, epoch_batches
        from sfc_vit_tpu.training import make_eval_step

        rng2 = np.random.default_rng(7)
        ds = Dataset(
            rng2.integers(0, 256, (7, 16, 16, 3)).astype(np.uint8),
            (np.arange(7) % 10).astype(np.int32),
            10,
        )
        eval_step = jax.jit(
            make_eval_step(num_classes=10),
            in_shardings=(state_sh, (bsh, bsh)),
            out_shardings=rep,
        )
        eval_totals = {"loss_sum": 0.0, "correct": 0, "count": 0}
        for bx, by in epoch_batches(
            ds, 4, shuffle=False, drop_last=False,
            process_index=pid, process_count=nproc,
        ):
            gb = global_batch_from_local(
                mesh, (bx.astype(np.float32) / 255.0, by)
            )
            m = jax.device_get(eval_step(state, gb))
            eval_totals["loss_sum"] += float(m["loss_sum"])
            eval_totals["correct"] += int(m["correct"])
            eval_totals["count"] += int(m["count"])

    # Re-replicate params in-graph (under fsdp each process holds only its
    # shards) so the host-side f64 digest reads identical data everywhere.
    def _digest(p):
        p = jax.jit(
            lambda q: q,
            out_shardings=jax.tree_util.tree_map(lambda _: rep, p),
        )(p)
        return float(
            sum(
                np.abs(
                    np.asarray(leaf.addressable_shards[0].data, np.float64)
                ).sum()
                for leaf in jax.tree_util.tree_leaves(p)
            )
        )

    digest = _digest(state.params)

    ckpt_digest = None
    if mode == "fsdp" and ckpt_dir is not None:
        # Distributed checkpoint round-trip: every process writes the
        # shards it owns (params + Adam moments are sharded ACROSS the
        # process boundary), then restores into a zeroed template with
        # the same shardings — the digest matching proves the values
        # came back from disk, reassembled from per-host shard files.
        import jax.numpy as jnp

        from sfc_vit_tpu.training import Checkpointer

        ck = Checkpointer(ckpt_dir, keep=1)
        ck.save(2, state, {"test_accuracy": 0.5})
        ck.wait()
        template = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored = ck.restore(template)
        ck.close()
        ckpt_digest = _digest(restored.params)
    with open(out_path, "w") as f:
        json.dump(
            {"losses": losses, "digest": digest,
             "ndev": jax.device_count(), "eval": eval_totals,
             "ckpt_digest": ckpt_digest}, f,
        )


if __name__ == "__main__":
    main()
