"""Parallelism tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfc_vit_tpu.data.pipeline import prefetch_to_device
from sfc_vit_tpu.ops.attention import dot_product_attention_xla
from sfc_vit_tpu.parallel import (
    apply_param_sharding,
    batch_sharding,
    make_mesh,
    shard_batch,
)
from sfc_vit_tpu.parallel.sequence import sequence_parallel_attention


def test_make_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2, "pipe": 1}
    mesh1 = make_mesh(data=1, devices=jax.devices()[:1])
    assert mesh1.shape == {"data": 1, "model": 1, "pipe": 1}
    mesh_pp = make_mesh(data=2, pipe=4)
    assert mesh_pp.shape == {"data": 2, "model": 1, "pipe": 4}


def test_shard_batch_places_on_mesh():
    mesh = make_mesh(data=8)
    x = np.zeros((16, 4, 4, 3), np.float32)
    y = np.zeros((16,), np.int32)
    xb, yb = shard_batch(mesh, (x, y))
    assert xb.sharding == batch_sharding(mesh)
    assert len(xb.addressable_shards) == 8


def test_param_sharding_shape_rule():
    mesh = make_mesh(data=4, model=2)
    tree = {
        "dense": {"kernel": np.zeros((64, 128)), "bias": np.zeros(128)},
        "down": {"kernel": np.zeros((128, 64))},
        "odd": np.zeros((3, 5)),
    }
    sh = apply_param_sharding(mesh, tree)
    assert "model" in str(sh["dense"]["kernel"].spec)
    assert sh["dense"]["bias"].spec == jax.sharding.PartitionSpec()
    assert "model" in str(sh["down"]["kernel"].spec)
    assert sh["odd"].spec == jax.sharding.PartitionSpec()


def test_sequence_parallel_attention_matches_dense():
    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(0)
    b, n, h, dh = 2, 64, 2, 16
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, n, h, dh)), dtype=jnp.float32)
        for _ in range(3)
    )
    want = dot_product_attention_xla(q, k, v)
    got = sequence_parallel_attention(mesh, q, k, v, axis="model")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_prefetch_to_device():
    mesh = make_mesh(data=8)
    batches = [
        (np.full((8, 2, 2, 3), i, np.float32), np.full((8,), i, np.int32))
        for i in range(5)
    ]
    seen = []
    for xb, yb in prefetch_to_device(iter(batches), size=2, mesh=mesh):
        assert len(xb.addressable_shards) == 8
        seen.append(int(yb[0]))
    assert seen == [0, 1, 2, 3, 4]


def test_prefetch_propagates_errors():
    def gen():
        yield (np.zeros((8, 2, 2, 3), np.float32), np.zeros((8,), np.int32))
        raise ValueError("boom")

    it = prefetch_to_device(gen(), size=1)
    next(it)
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_ring_attention_matches_dense():
    from sfc_vit_tpu.parallel.sequence import ring_attention

    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(1)
    b, n, h, dh = 2, 64, 2, 16
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, n, h, dh)), dtype=jnp.float32)
        for _ in range(3)
    )
    want = dot_product_attention_xla(q, k, v)
    got = ring_attention(mesh, q, k, v, axis="model")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_ring_attention_2dev_bf16():
    from sfc_vit_tpu.parallel.sequence import ring_attention

    mesh = make_mesh(data=4, model=2)
    rng = np.random.default_rng(2)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 32, 2, 16)), dtype=jnp.bfloat16)
        for _ in range(3)
    )
    want = dot_product_attention_xla(q, k, v).astype(jnp.float32)
    got = ring_attention(mesh, q, k, v, axis="model").astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


# ---------------- sequence parallelism in the model path ----------------


def _tiny_curvevit(attn_impl, image_size=256, tokens_hint=4096):
    from sfc_vit_tpu.models import CurveViT

    return CurveViT(
        curve="hilbert", image_size=image_size, patch_size=4,
        num_classes=10, dim=32, depth=1, heads=2, mlp_dim=64, dim_head=16,
        attn_impl=attn_impl,
    )


def test_ring_attn_impl_engages_collectives():
    """attn_impl='ring' inside a model lowers to a collective-permute
    under an active sequence_sharding context (i.e. SP is actually in
    the model path, not a standalone demo)."""
    from sfc_vit_tpu.parallel import make_mesh, sequence_sharding

    mesh = make_mesh(data=2, model=4)
    model = _tiny_curvevit("ring", image_size=32)  # 64 tokens / 4 = 16
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x)["params"]

    def fwd(p, x):
        return model.apply({"params": p}, x)

    def fwd_plain(p, x):  # distinct fn: jit caches traces per identity
        return model.apply({"params": p}, x)

    with sequence_sharding(mesh, axis="model"):
        txt = jax.jit(fwd).lower(params, x).as_text()
    assert "collective_permute" in txt or "ppermute" in txt

    # outside the context the same model lowers collective-free
    txt_plain = jax.jit(fwd_plain).lower(params, x).as_text()
    assert "collective_permute" not in txt_plain


@pytest.mark.parametrize("impl", ["ring", "sp"])
def test_sequence_sharded_train_step_matches_unsharded(impl):
    """One full sequence-sharded training step of a 4k-token CurveViT on
    the 8-device mesh: loss finite, updated params match the unsharded
    xla-attention step (ring/sp are exact)."""
    from sfc_vit_tpu.parallel import make_mesh, sequence_sharding
    from sfc_vit_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
        warmup_cosine,
    )

    mesh = make_mesh(data=2, model=4)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 256, 256, 3)),
        jnp.float32,
    )  # 4096 tokens at patch 4
    y = jnp.arange(4, dtype=jnp.int32) % 10
    sched = warmup_cosine(3e-4, 2, 10)
    step = make_train_step(num_classes=10, use_mixing=False,
                           schedule=sched)
    key = jax.random.key(1)

    def run(attn_impl, ctx):
        model = _tiny_curvevit(attn_impl)
        state = create_train_state(
            model, jax.random.key(0), x[:1], make_optimizer(sched)
        )
        if ctx is None:
            new_state, metrics = jax.jit(step)(state, (x, y), key)
        else:
            with ctx:
                new_state, metrics = jax.jit(step)(state, (x, y), key)
        return new_state, metrics

    ref_state, ref_metrics = run("xla", None)
    got_state, got_metrics = run(impl, sequence_sharding(mesh, "model"))

    assert np.isfinite(float(got_metrics["loss"]))
    np.testing.assert_allclose(
        float(got_metrics["loss"]), float(ref_metrics["loss"]),
        rtol=1e-5, atol=1e-5,
    )
    flat_ref = jax.tree_util.tree_leaves(ref_state.params)
    flat_got = jax.tree_util.tree_leaves(got_state.params)
    for a, b in zip(flat_got, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        )


# ---------------- pipeline parallelism ----------------


def test_pipeline_apply_matches_sequential():
    """GPipe microbatch pipeline over a 4-stage 'pipe' axis == running
    the stages sequentially (fwd), and grads flow through the ring."""
    from jax.sharding import Mesh
    from sfc_vit_tpu.parallel.pipeline import (
        pipeline_apply,
        stack_stage_params,
    )

    s, m, mb, d = 4, 6, 8, 32
    mesh = Mesh(np.array(jax.devices()[:s]).reshape(s), ("pipe",))
    rng = np.random.default_rng(0)
    stages = [
        {
            "w": jnp.asarray(rng.standard_normal((d, d)) * 0.1,
                             jnp.float32),
            "b": jnp.asarray(rng.standard_normal(d) * 0.01, jnp.float32),
        }
        for _ in range(s)
    ]
    stacked = stack_stage_params(stages)
    x = jnp.asarray(rng.standard_normal((m, mb, d)), jnp.float32)

    def stage_fn(p, a):
        return jnp.tanh(a @ p["w"] + p["b"])

    def sequential(x):
        out = x.reshape(m * mb, d)
        for p in stages:
            out = stage_fn(p, out)
        return out.reshape(m, mb, d)

    got = jax.jit(
        lambda params, x: pipeline_apply(mesh, stage_fn, params, x)
    )(stacked, x)
    want = sequential(x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )

    # grads through the pipelined schedule match sequential grads
    def loss_pipe(params):
        return jnp.sum(pipeline_apply(mesh, stage_fn, params, x) ** 2)

    def loss_seq(params_list):
        out = x.reshape(m * mb, d)
        for p in params_list:
            out = stage_fn(p, out)
        return jnp.sum(out ** 2)

    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    g_seq = jax.grad(loss_seq)(stages)
    for i in range(s):
        for key in ("w", "b"):
            np.testing.assert_allclose(
                np.asarray(g_pipe[key][i]), np.asarray(g_seq[i][key]),
                rtol=2e-4, atol=2e-4,
            )


def test_pipeline_single_stage_degenerates():
    from jax.sharding import Mesh
    from sfc_vit_tpu.parallel.pipeline import (
        pipeline_apply,
        stack_stage_params,
    )

    mesh = Mesh(np.array(jax.devices()[:1]), ("pipe",))
    p = [{"w": jnp.eye(8, dtype=jnp.float32)}]
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((3, 4, 8)), jnp.float32
    )
    got = pipeline_apply(
        mesh, lambda p, a: a @ p["w"], stack_stage_params(p), x
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), rtol=1e-6)


# ---------------- pipeline parallelism as a model path (round 3) ----


def _pp_curvevit(depth=4):
    from sfc_vit_tpu.models import CurveViT

    return CurveViT(
        curve="hilbert", image_size=32, patch_size=4, num_classes=10,
        dim=64, depth=depth, heads=2, mlp_dim=128, dim_head=32,
    )


def test_pipeline_param_roundtrip_exact():
    from sfc_vit_tpu.parallel import (
        merge_pipeline_params,
        split_pipeline_params,
    )

    m = _pp_curvevit()
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    p = m.init({"params": jax.random.key(0)}, x)["params"]
    pp = split_pipeline_params(p, 4, 4)
    assert set(pp) == {"outer", "stages"}
    # every stacked leaf has the stage axis
    for leaf in jax.tree_util.tree_leaves(pp["stages"]):
        assert leaf.shape[0] == 4
    back = merge_pipeline_params(pp, 4, 4)
    ref = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(p)
    }
    for k, v in jax.tree_util.tree_leaves_with_path(back):
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(ref[jax.tree_util.keystr(k)])
        )


@pytest.mark.parametrize("family", ["curve", "simple"])
def test_pipelined_apply_matches_sequential_model(family):
    """Pipelined forward over a (data=2, pipe=4) mesh == the sequential
    model (tolerance, not bit-exact: shard_map recompilation changes
    FMA/fusion rounding at the 1e-6 fp32 level — same bar as SP)."""
    from sfc_vit_tpu.models import SimpleViT
    from sfc_vit_tpu.parallel import (
        make_mesh,
        make_pipelined_apply,
        split_pipeline_params,
    )

    if family == "curve":
        m = _pp_curvevit()
    else:
        m = SimpleViT(image_size=32, patch_size=4, num_classes=10,
                      dim=64, depth=4, heads=2, mlp_dim=128, dim_head=32)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 32, 32, 3)),
        jnp.float32,
    )
    p = m.init({"params": jax.random.key(0)}, x)["params"]
    ref = m.apply({"params": p}, x)

    mesh = make_mesh(data=2, pipe=4)
    pp = split_pipeline_params(p, 4, 4)
    ap = make_pipelined_apply(m, mesh, 4, microbatches=4)
    out = ap({"params": pp}, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_pipelined_train_step_matches_sequential():
    """One full training step (mixing off, AdamW) through the pipelined
    apply == the sequential step: loss and every updated param leaf
    (merged back to the sequential layout) at the SP-integration bar."""
    from sfc_vit_tpu.parallel import (
        batch_sharding,
        make_mesh,
        make_pipelined_apply,
        merge_pipeline_params,
        pipeline_state_sharding,
        split_pipeline_params,
    )
    from sfc_vit_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
        warmup_cosine,
    )
    from sfc_vit_tpu.training.steps import TrainState

    m = _pp_curvevit()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 32, 32, 3)),
        jnp.float32,
    )
    y = jnp.arange(8, dtype=jnp.int32) % 10
    sched = warmup_cosine(3e-4, 2, 10)
    tx = make_optimizer(sched)
    step = make_train_step(num_classes=10, use_mixing=False,
                           schedule=sched)
    key = jax.random.key(1)

    seq_state = create_train_state(m, jax.random.key(0), x[:1], tx)
    seq_new, seq_metrics = jax.jit(step)(seq_state, (x, y), key)

    mesh = make_mesh(data=2, pipe=4)
    pp_params = split_pipeline_params(seq_state.params, 4, 4)
    ap = make_pipelined_apply(m, mesh, 4, microbatches=4)
    pp_state = TrainState.create(apply_fn=ap, params=pp_params, tx=tx)
    sh = pipeline_state_sharding(mesh, pp_state)
    pp_state = jax.device_put(pp_state, sh)
    bsh = batch_sharding(mesh)
    jitted = jax.jit(step, in_shardings=(sh, (bsh, bsh), None),
                     out_shardings=(sh, None))
    pp_new, pp_metrics = jitted(pp_state, (x, y), key)

    np.testing.assert_allclose(
        float(pp_metrics["loss"]), float(seq_metrics["loss"]),
        rtol=1e-5, atol=1e-5,
    )
    merged = merge_pipeline_params(pp_new.params, 4, 4)
    ref = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(seq_new.params)
    }
    for k, v in jax.tree_util.tree_leaves_with_path(merged):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref[jax.tree_util.keystr(k)]),
            rtol=5e-4, atol=5e-4, err_msg=jax.tree_util.keystr(k),
        )
    # the stage params really are sharded over 'pipe'
    leaf = jax.tree_util.tree_leaves(pp_new.params["stages"])[0]
    assert "pipe" in str(leaf.sharding.spec)


def test_trainer_pipeline_parallel_end_to_end():
    """Trainer(--pipeline-parallel 4): epoch of training + eval on the
    (2, 1, 4) mesh runs, learns a finite loss, and checkpoint state
    stays the pipelined layout."""
    from sfc_vit_tpu.training import TrainConfig, Trainer

    m = _pp_curvevit()
    cfg = TrainConfig(
        num_classes=10, epochs=1, warmup_epochs=0, use_mixing=False,
        data_parallel=2, pipeline_parallel=4, pipeline_microbatches=2,
    )
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    ys = (np.arange(16) % 10).astype(np.int32)
    tr = Trainer(m, cfg, steps_per_epoch=2,
                 sample_input=np.zeros((2, 32, 32, 3), np.float32))
    batches = lambda: iter(
        [(xs[:8], ys[:8]), (xs[8:], ys[8:])]
    )
    rec = tr.train_epoch(batches())
    assert np.isfinite(rec["train_loss"])
    ev = tr.evaluate(batches())
    assert np.isfinite(ev["test_loss"])
    assert set(tr.state.params) == {"outer", "stages"}


def test_pipelined_apply_rejects_bad_configs():
    from sfc_vit_tpu.parallel import make_mesh, make_pipelined_apply

    mesh = make_mesh(data=2, pipe=4)
    m = _pp_curvevit(depth=5)  # 5 % 4 != 0
    with pytest.raises(ValueError, match="divisible"):
        make_pipelined_apply(m, mesh, 4, microbatches=2)

    from sfc_vit_tpu.models.layers import TransformerSeqEncoder

    with pytest.raises(TypeError, match="pre-norm"):
        make_pipelined_apply(
            TransformerSeqEncoder(dim=32, n_heads=2, hidden_dim=64),
            mesh, 4, microbatches=2,
        )


@pytest.mark.parametrize("microbatches", [1, 2, 8])
def test_pipelined_apply_microbatch_sweep(microbatches):
    """Bubble fraction changes with M; results must not (GPipe
    schedule correctness across microbatch counts)."""
    from sfc_vit_tpu.parallel import (
        make_mesh,
        make_pipelined_apply,
        split_pipeline_params,
    )

    m = _pp_curvevit()
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((16, 32, 32, 3)),
        jnp.float32,
    )
    p = m.init({"params": jax.random.key(0)}, x)["params"]
    ref = m.apply({"params": p}, x)
    mesh = make_mesh(data=2, pipe=4)
    pp = split_pipeline_params(p, 4, 4)
    ap = make_pipelined_apply(m, mesh, 4, microbatches=microbatches)
    out = ap({"params": pp}, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

    # batch smaller than the pipe geometry's quantum (16 microbatches
    # x data 2 = 32 > batch 16): padded up inside apply_fn, pad logits
    # sliced off -> exact results, no raise (ragged final eval batches
    # take this path under drop_last=False)
    if microbatches == 8:
        ragged = make_pipelined_apply(m, mesh, 4, microbatches=16)
        out2 = ragged({"params": pp}, x)
        np.testing.assert_allclose(
            np.asarray(out2), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


def test_trainer_pipeline_checkpoint_resume(tmp_path):
    """Orbax save/restore round-trips the pipelined (stacked-stage)
    TrainState layout; resume continues from the saved step."""
    from sfc_vit_tpu.training import TrainConfig, Trainer

    m = _pp_curvevit()
    cfg = TrainConfig(
        num_classes=10, epochs=2, warmup_epochs=0, use_mixing=False,
        data_parallel=2, pipeline_parallel=4, pipeline_microbatches=2,
        workdir=str(tmp_path),
    )
    rng = np.random.default_rng(1)
    xs = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    ys = (np.arange(8) % 10).astype(np.int32)
    batches = lambda: iter([(xs, ys)])
    tr = Trainer(m, cfg, steps_per_epoch=1,
                 sample_input=np.zeros((2, 32, 32, 3), np.float32))
    tr.fit(batches, batches, epochs=1)

    tr2 = Trainer(m, cfg, steps_per_epoch=1,
                  sample_input=np.zeros((2, 32, 32, 3), np.float32))
    assert tr2.maybe_resume()
    assert int(tr2.state.step) == 1
    a = jax.tree_util.tree_leaves(tr.state.params["stages"])[0]
    b = jax.tree_util.tree_leaves(tr2.state.params["stages"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                               atol=0)


def test_trainer_pipeline_ragged_eval_batch():
    """The final eval batch under drop_last=False can be any size —
    the pipelined apply pads it to the pipe geometry internally and the
    metrics count only real examples (parity vs a sequential run)."""
    from sfc_vit_tpu.training import TrainConfig, Trainer

    m = _pp_curvevit()
    rng = np.random.default_rng(3)
    xs = rng.standard_normal((13, 32, 32, 3)).astype(np.float32)
    ys = (np.arange(13) % 10).astype(np.int32)
    batches = lambda: iter([(xs[:8], ys[:8]), (xs[8:], ys[8:])])

    evals = {}
    for pp in (1, 4):
        cfg = TrainConfig(
            num_classes=10, epochs=1, warmup_epochs=0, use_mixing=False,
            data_parallel=8 // pp, pipeline_parallel=pp,
            pipeline_microbatches=2, seed=7,
        )
        tr = Trainer(m, cfg, steps_per_epoch=1,
                     sample_input=np.zeros((2, 32, 32, 3), np.float32))
        evals[pp] = tr.evaluate(batches())
    assert evals[1]["test_accuracy"] == evals[4]["test_accuracy"]
    np.testing.assert_allclose(
        evals[1]["test_loss"], evals[4]["test_loss"], rtol=1e-5
    )


def test_trainer_cross_layout_checkpoint_resume(tmp_path):
    """A checkpoint saved sequentially resumes into a pipelined run
    (and back), params AND Adam moments converted losslessly
    (pipeline_model docstring contract)."""
    from sfc_vit_tpu.training import TrainConfig, Trainer

    m = _pp_curvevit()
    rng = np.random.default_rng(5)
    xs = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    ys = (np.arange(8) % 10).astype(np.int32)
    batches = lambda: iter([(xs, ys)])
    sample = np.zeros((2, 32, 32, 3), np.float32)
    base = dict(
        num_classes=10, epochs=3, warmup_epochs=0, use_mixing=False,
        pipeline_microbatches=2, workdir=str(tmp_path),
    )

    seq = Trainer(
        m, TrainConfig(**base, data_parallel=8, pipeline_parallel=1),
        steps_per_epoch=1, sample_input=sample)
    seq.fit(batches, batches, epochs=1)

    # sequential checkpoint -> pipelined run
    pp = Trainer(
        m, TrainConfig(**base, data_parallel=2, pipeline_parallel=4),
        steps_per_epoch=1, sample_input=sample)
    assert pp.maybe_resume()
    assert int(pp.state.step) == 1
    assert set(pp.state.params) == {"outer", "stages"}
    from sfc_vit_tpu.parallel import merge_pipeline_params

    merged = merge_pipeline_params(pp.state.params, m.depth, 4)
    for a, b in zip(jax.tree_util.tree_leaves(merged),
                    jax.tree_util.tree_leaves(seq.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Adam mu converted too (not reinitialized to zeros)
    mu_leaves = [
        np.asarray(l)
        for l in jax.tree_util.tree_leaves(pp.state.opt_state)
        if getattr(l, "ndim", 0) > 0
    ]
    assert any(np.abs(l).max() > 0 for l in mu_leaves)
    pp.fit(batches, batches, epochs=2)  # continues training

    # pipelined checkpoint (saved by pp.fit) -> sequential run
    seq2 = Trainer(
        m, TrainConfig(**base, data_parallel=8, pipeline_parallel=1),
        steps_per_epoch=1, sample_input=sample)
    assert seq2.maybe_resume()
    assert int(seq2.state.step) == 2
    assert "transformer" in seq2.state.params


def test_global_batch_from_local_matches_shard_batch():
    """Single-process the multi-host assembly path must produce the
    same data-sharded global array as the device_put fast path (this
    is how the hermetic suite exercises make_array_from_process_local_
    data on the 8-virtual-device CPU mesh)."""
    from sfc_vit_tpu.parallel import global_batch_from_local, make_mesh
    from sfc_vit_tpu.parallel.mesh import shard_batch

    mesh = make_mesh(data=8)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    y = np.arange(16, dtype=np.int32)
    a = global_batch_from_local(mesh, (x, y))
    b = shard_batch(mesh, (x, y))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    assert a[0].sharding.is_equivalent_to(b[0].sharding, a[0].ndim)
    # consumable by a jitted data-parallel reduction
    s = jax.jit(lambda v: v.sum())(a[0])
    assert float(s) == float(x.sum())


def test_host_shard_slice(monkeypatch):
    """Each process gets a contiguous, process-ordered slice; global
    batch must divide by process_count."""
    from sfc_vit_tpu.parallel import host_shard_slice

    assert host_shard_slice(16) == slice(0, 16)
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    assert host_shard_slice(16) == slice(8, 12)
    covered = []
    for pi in range(4):
        monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
        sl = host_shard_slice(16)
        covered.extend(range(sl.start, sl.stop))
    assert covered == list(range(16))  # exact disjoint cover
    with pytest.raises(ValueError, match="not divisible"):
        host_shard_slice(10)


def test_grad_accum_under_data_parallel_sharding():
    """grad_accum composes with batch sharding: the strided microbatch
    split keeps each microbatch spread over every device's block (no
    all-to-all needed) and the sharded accumulated update equals the
    unsharded A=1 update (dropout-free family B)."""
    from sfc_vit_tpu.models import SimpleViT
    from sfc_vit_tpu.parallel import make_mesh
    from sfc_vit_tpu.parallel.mesh import batch_sharding, replicated
    from sfc_vit_tpu.training import (
        create_train_state, make_optimizer, make_train_step,
    )
    from sfc_vit_tpu.training.schedules import warmup_cosine

    model = SimpleViT(image_size=8, patch_size=4, num_classes=4, dim=32,
                      depth=1, heads=2, mlp_dim=64, dim_head=16)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((16, 8, 8, 3)),
        jnp.float32,
    )
    y = jnp.arange(16, dtype=jnp.int32) % 4
    sched = warmup_cosine(1e-3, 0, 10)
    state = create_train_state(
        model, jax.random.key(0), x[:2], make_optimizer(sched)
    )
    ref_state, ref_m = jax.jit(
        make_train_step(num_classes=4, schedule=sched)
    )(state, (x, y), jax.random.key(5))

    mesh = make_mesh(data=8)
    rep, bsh = replicated(mesh), batch_sharding(mesh)
    state_sh = jax.tree_util.tree_map(lambda _: rep, state)
    step = jax.jit(
        make_train_step(num_classes=4, schedule=sched, grad_accum=4),
        in_shardings=(state_sh, (bsh, bsh), None),
        out_shardings=(state_sh, rep),
    )
    sp = jax.device_put(state, state_sh)
    bp = (jax.device_put(x, bsh), jax.device_put(y, bsh))
    got_state, got_m = step(sp, bp, jax.random.key(5))
    np.testing.assert_allclose(
        float(ref_m["loss"]), float(got_m["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(got_state.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-7
        )


def test_trainer_sequence_parallel_config_engages_ring():
    """TrainConfig(sequence_parallel=True) must put the ambient
    sequence_sharding context around the step so attn_impl='ring'
    actually traces ring collectives — without it the impl silently
    degrades to local XLA attention (review finding: no production
    call site ever entered the context)."""
    from sfc_vit_tpu.models import CurveViT
    from sfc_vit_tpu.training import TrainConfig, Trainer

    mesh = make_mesh(data=2, model=4)
    model = CurveViT(
        curve="hilbert", image_size=16, patch_size=2, num_classes=4,
        dim=32, depth=1, heads=2, mlp_dim=48, dim_head=16,
        attn_impl="ring",
    )
    cfg = TrainConfig(
        num_classes=4, epochs=1, warmup_epochs=0, base_lr=1e-3,
        use_mixing=False, data_parallel=2, model_parallel=4,
        sequence_parallel=True,
    )
    tr = Trainer(
        model, cfg, steps_per_epoch=1,
        sample_input=np.zeros((2, 16, 16, 3), np.float32), mesh=mesh,
    )
    x = np.zeros((8, 16, 16, 3), np.float32)
    y = np.zeros((8,), np.int32)
    batch = shard_batch(mesh, (x, y))
    with tr._seq_ctx():
        hlo = tr._train_step.lower(
            tr.state, batch, tr.rng
        ).compile().as_text()
    assert "collective-permute" in hlo, "ring attention did not engage"
    rec = tr.train_epoch(iter([(x, y)]))
    assert np.isfinite(rec["train_loss"])


def test_pipeline_apply_rejects_stage_count_mismatch():
    """8 stacked stages on a 4-device pipe axis must raise — shard_map
    would silently keep stages 0,2,4,6 (review finding)."""
    from sfc_vit_tpu.parallel.pipeline import (
        pipeline_apply,
        stack_stage_params,
    )

    mesh = make_mesh(data=2, pipe=4)
    stages = [{"w": np.full((4, 4), float(i))} for i in range(8)]
    stacked = stack_stage_params(stages)
    x = np.zeros((2, 2, 4), np.float32)
    with pytest.raises(ValueError, match="must match"):
        pipeline_apply(
            mesh, lambda p, a: a @ p["w"], stacked, jnp.asarray(x),
            axis="pipe",
        )


def test_fsdp_sharding_rule():
    from jax.sharding import PartitionSpec as P

    from sfc_vit_tpu.parallel import fsdp_sharding_rules

    # data-only: the largest divisible dim shards over 'data'
    assert fsdp_sharding_rules(np.zeros((64, 128)), 8) == P(None, "data")
    assert fsdp_sharding_rules(np.zeros((128, 64)), 8) == P("data", None)
    # 1-D vectors and scalars replicate
    assert fsdp_sharding_rules(np.zeros((128,)), 8) == P()
    assert fsdp_sharding_rules(np.zeros(()), 8) == P()
    # nothing divisible: replicate
    assert fsdp_sharding_rules(np.zeros((3, 5)), 8) == P()
    # composes with the TP rule: widest dim 'model', the other 'data'
    assert fsdp_sharding_rules(
        np.zeros((64, 128)), 4, model_size=2
    ) == P("data", "model")
    # >2-D (conv kernels): largest divisible dim
    assert fsdp_sharding_rules(
        np.zeros((3, 3, 3, 32)), 8
    ) == P(None, None, None, "data")
    # data_size 1 degenerates to replication
    assert fsdp_sharding_rules(np.zeros((64, 128)), 1) == P()


def _fsdp_data():
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    ys = (np.arange(16) % 10).astype(np.int32)
    return xs, ys


def test_trainer_fsdp_matches_replicated():
    """--fsdp: identical data/seed -> the replicated trainer's losses and
    updated params (the SP/PP integration bar), with the state actually
    sharded over 'data' (each device holds 1/8 of the wide leaves)."""
    from sfc_vit_tpu.training import TrainConfig, Trainer

    xs, ys = _fsdp_data()
    batches = lambda: iter([(xs[:8], ys[:8]), (xs[8:], ys[8:])])
    records, params, states = [], [], []
    for fsdp in (False, True):
        cfg = TrainConfig(
            num_classes=10, epochs=1, warmup_epochs=0, use_mixing=False,
            data_parallel=8, fsdp=fsdp,
        )
        tr = Trainer(_pp_curvevit(), cfg, steps_per_epoch=2,
                     sample_input=np.zeros((2, 32, 32, 3), np.float32))
        rec = tr.train_epoch(batches())
        rec.update(tr.evaluate(batches()))
        records.append(rec)
        params.append(jax.device_get(tr.state.params))
        states.append(tr.state)
    np.testing.assert_allclose(
        records[1]["train_loss"], records[0]["train_loss"],
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        records[1]["test_loss"], records[0]["test_loss"],
        rtol=1e-5, atol=1e-6,
    )
    ref = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(params[0])
    }
    for k, v in jax.tree_util.tree_leaves_with_path(params[1]):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref[jax.tree_util.keystr(k)]),
            rtol=5e-5, atol=5e-6, err_msg=jax.tree_util.keystr(k),
        )
    # the FSDP state is genuinely sharded: wide leaves carry 'data' in
    # their spec and each device holds 1/8 of them; Adam moments too
    leaves = jax.tree_util.tree_leaves(states[1].params)
    sharded = [l for l in leaves if "data" in str(l.sharding.spec)]
    assert sharded, "FSDP sharded no param leaves"
    l = max(sharded, key=lambda a: a.size)
    assert l.addressable_shards[0].data.size == l.size // 8
    mu = states[1].opt_state[1][0].mu
    assert any(
        "data" in str(m.sharding.spec)
        for m in jax.tree_util.tree_leaves(mu)
    ), "Adam moments not sharded under fsdp"


def test_trainer_fsdp_composes_with_tp():
    """fsdp=True on a (4, 2) mesh: runs, finite, and at least one leaf
    is sharded over BOTH axes."""
    from sfc_vit_tpu.training import TrainConfig, Trainer

    xs, ys = _fsdp_data()
    cfg = TrainConfig(
        num_classes=10, epochs=1, warmup_epochs=0, use_mixing=False,
        data_parallel=4, model_parallel=2, fsdp=True,
    )
    tr = Trainer(_pp_curvevit(), cfg, steps_per_epoch=1,
                 sample_input=np.zeros((2, 32, 32, 3), np.float32))
    rec = tr.train_epoch(iter([(xs[:8], ys[:8])]))
    assert np.isfinite(rec["train_loss"])
    specs = [
        str(l.sharding.spec)
        for l in jax.tree_util.tree_leaves(tr.state.params)
    ]
    assert any("data" in s and "model" in s for s in specs), specs


def test_trainer_fsdp_rejects_pipeline():
    from sfc_vit_tpu.training import TrainConfig, Trainer

    cfg = TrainConfig(
        num_classes=10, data_parallel=2, pipeline_parallel=4, fsdp=True,
    )
    with pytest.raises(ValueError, match="fsdp"):
        Trainer(_pp_curvevit(), cfg, steps_per_epoch=1,
                sample_input=np.zeros((2, 32, 32, 3), np.float32))


def test_trainer_fsdp_checkpoint_resume(tmp_path):
    """Orbax save/restore round-trips the FSDP-sharded state (restore
    targets the sharded template) and resumes at the right epoch."""
    from sfc_vit_tpu.training import TrainConfig, Trainer

    xs, ys = _fsdp_data()
    cfg = TrainConfig(
        num_classes=10, epochs=2, warmup_epochs=0, use_mixing=False,
        data_parallel=8, fsdp=True, workdir=str(tmp_path),
    )
    mk = lambda: Trainer(
        _pp_curvevit(), cfg, steps_per_epoch=2,
        sample_input=np.zeros((2, 32, 32, 3), np.float32),
    )
    batches = lambda: iter([(xs[:8], ys[:8]), (xs[8:], ys[8:])])
    tr = mk()
    tr.fit(batches, batches, epochs=1)
    tr2 = mk()
    assert tr2.maybe_resume()
    assert tr2.start_epoch == 1
    a = jax.tree_util.tree_leaves(jax.device_get(tr.state.params))
    b = jax.tree_util.tree_leaves(jax.device_get(tr2.state.params))
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    # restored leaves keep the FSDP sharding
    assert any(
        "data" in str(l.sharding.spec)
        for l in jax.tree_util.tree_leaves(tr2.state.params)
    )
