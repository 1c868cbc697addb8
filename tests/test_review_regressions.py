"""Regressions for the round-1 code-review findings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfc_vit_tpu.curves import pixel_lut
from sfc_vit_tpu.data import epoch_batches, synthetic_dataset
from sfc_vit_tpu.ops.local_attention import (
    local_block_attention,
    local_block_attention_xla,
)
from sfc_vit_tpu.registry import ModelConfig, build_model
from sfc_vit_tpu.tokenizers import HierarchicalCurveEmbedding


def test_local_attention_three_block_regime_masked():
    """n_blocks in (halo+1, 2*halo+1]: dense is NOT equivalent; the
    kernel must produce the masked result (was: silent dense fallback)."""
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 24, 1, 64)), dtype=jnp.float32)
        for _ in range(3)
    )
    want = local_block_attention_xla(q, k, v, block=8, halo=1)
    got = local_block_attention(q, k, v, block=8, halo=1, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("curve", ["onion", "raster", "hilbert", "morton"])
def test_pixel_lut_non_square(curve):
    """Non-square images: LUT must be an in-range permutation; raster
    must be the identity (was: out-of-range indices for onion/raster)."""
    for h, w in [(2, 4), (6, 3), (8, 12)]:
        lut = pixel_lut(curve, h, w)
        assert sorted(lut.tolist()) == list(range(h * w)), (curve, h, w)
        if curve == "raster":
            np.testing.assert_array_equal(lut, np.arange(h * w))


def test_hierarchical_non_square_group_sizes():
    """patch_list must match actual per-level token counts for any group
    size (was: ((grid)//sqrt(g))**2 breaks non-perfect-square g)."""
    tok = HierarchicalCurveEmbedding(
        img_size=32, patch_size_list=(2, 1), embed_dim=16, curve="morton",
        return_levels=True,
    )
    assert tok.patch_list == [512, 256]
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = tok.init(jax.random.key(0), x)["params"]
    levels = tok.apply({"params": params}, x)
    assert [t.shape[1] for t in levels] == tok.patch_list
    # fused variant must also concatenate cleanly
    tok2 = HierarchicalCurveEmbedding(
        img_size=32, patch_size_list=(2, 1), embed_dim=16, curve="morton"
    )
    p2 = tok2.init(jax.random.key(0), x)["params"]
    y = tok2.apply({"params": p2}, x)
    assert y.shape == (1, 512, 32)


def test_checkpointer_latest_survives_best_peak(tmp_path):
    """latest_step() must track the true latest save even when the best
    metric peaked earlier (was: best_fn pruned newer checkpoints)."""
    from sfc_vit_tpu.training import Checkpointer

    ckpt = Checkpointer(tmp_path, keep=2)
    state = {"w": np.arange(4.0)}
    accs = [0.3, 0.9, 0.5, 0.4, 0.2]  # peak at step 2
    for step, acc in enumerate(accs, start=1):
        ckpt.save(step, {"w": state["w"] + step},
                  {"test_accuracy": acc})
    ckpt.wait()
    assert ckpt.latest_step() == 5
    assert ckpt.best_step() == 2
    restored = ckpt.restore({"w": np.zeros(4)})
    np.testing.assert_array_equal(restored["w"], state["w"] + 5)
    best = ckpt.restore_best({"w": np.zeros(4)})
    np.testing.assert_array_equal(best["w"], state["w"] + 2)
    ckpt.close()


def test_mha_weight_dropout_is_stochastic():
    """Training-mode attention dropout acts on the weights and varies
    with the dropout key (was: silently absent)."""
    from sfc_vit_tpu.models import TorchMultiHeadAttention

    mha = TorchMultiHeadAttention(dim=32, n_heads=2, dropout_rate=0.5,
                                  attn_impl="xla")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 32)),
                    dtype=jnp.float32)
    p = mha.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                 x, deterministic=False)["params"]
    y_eval = mha.apply({"params": p}, x, deterministic=True)
    y1 = mha.apply({"params": p}, x, deterministic=False,
                   rngs={"dropout": jax.random.key(2)})
    y2 = mha.apply({"params": p}, x, deterministic=False,
                   rngs={"dropout": jax.random.key(3)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    assert not np.allclose(np.asarray(y1), np.asarray(y_eval))


def test_registry_rejects_random_for_1d():
    with pytest.raises(ValueError, match="only.*2d"):
        build_model(ModelConfig(tokenizer="1d", curve="random"))


def test_epoch_batches_equal_steps_across_hosts():
    """Uneven dataset sizes must still give every host the same number
    of batches (was: collective desync)."""
    ds = synthetic_dataset(n=1023)
    counts = [
        sum(1 for _ in epoch_batches(ds, 256, process_index=p,
                                     process_count=2))
        for p in range(2)
    ]
    assert counts[0] == counts[1]


# ---- round-2 self-review fixes ----


def test_packed_qkv_attention_rejects_unknown_impl():
    import jax.numpy as jnp
    import pytest as _pytest

    from sfc_vit_tpu.ops.attention import packed_qkv_attention

    qkv = jnp.zeros((1, 8, 3 * 32))
    with _pytest.raises(ValueError, match="unknown attention"):
        packed_qkv_attention(qkv, 2, implementation="locall")


def test_bf16_softmax_gate_respects_sequence_length():
    """auto must not extrapolate the bf16-softmax study past the flash
    crossover: long rows keep fp32 softmax even when the pallas head-dim
    gate fails."""
    import jax.numpy as jnp

    from sfc_vit_tpu.ops.attention import _PALLAS_MIN_N, _bf16_softmax_ok

    long_q = jnp.zeros((1, _PALLAS_MIN_N, 2, 32), jnp.bfloat16)
    assert not _bf16_softmax_ok(long_q, long_q.shape[1])
    # the packed path holds BHND: the helper takes the sequence length
    # EXPLICITLY so a (B, H=2, N, Dh) layout cannot sneak its head
    # count past the gate (review finding: q.shape[1] tested H there,
    # enabling bf16 softmax for exactly the long rows the study
    # excluded)
    packed_q = jnp.zeros((1, 2, _PALLAS_MIN_N, 32), jnp.bfloat16)
    assert not _bf16_softmax_ok(packed_q, _PALLAS_MIN_N)


def test_sequence_parallel_attention_honors_impl_without_flash():
    """The gathered K/V is p x longer than the Q slice (cross-attention)
    — every implementation selection must route to a rectangular-safe
    path (the square flash kernel crashed at trace time here)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sfc_vit_tpu.ops.attention import dot_product_attention_xla
    from sfc_vit_tpu.parallel import make_mesh
    from sfc_vit_tpu.parallel.sequence import sequence_parallel_attention

    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(3)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 2048, 2, 64)),
                    dtype=jnp.float32)
        for _ in range(3)
    )
    want = np.asarray(dot_product_attention_xla(q, k, v))
    for impl in ("auto", "pallas", "xla"):  # 'pallas' must remap safely
        got = np.asarray(sequence_parallel_attention(
            mesh, q, k, v, axis="model", implementation=impl
        ))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_trainer_init_params_shape_mismatch_raises():
    import numpy as np
    import pytest as _pytest

    from sfc_vit_tpu.models.retrofit import (
        load_torchvision_vit,
        synthetic_torchvision_state_dict,
    )
    from sfc_vit_tpu.training import TrainConfig, Trainer

    sd = synthetic_torchvision_state_dict()
    model, params = load_torchvision_vit(sd, image_size=64, num_classes=10)
    params["encoder_layer_0"]["mlp_1"]["kernel"] = np.zeros(
        (3, 3), np.float32
    )
    with _pytest.raises(ValueError, match="shape"):
        Trainer(
            model, TrainConfig(num_classes=10, epochs=1),
            steps_per_epoch=1,
            sample_input=np.zeros((2, 64, 64, 3), np.float32),
            init_params=params,
        )


def test_dryrun_subprocess_overrides_stale_device_count(monkeypatch):
    """A pre-existing smaller device-count flag must be replaced, not
    kept (it would defeat the bootstrap)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    captured = {}

    def fake_run(cmd, env=None, **kw):
        captured["flags"] = env["XLA_FLAGS"]

        class R:
            returncode = 0
            stdout = ""
            stderr = ""

        return R()

    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=4"
    )
    monkeypatch.setattr("subprocess.run", fake_run)
    ge._dryrun_in_subprocess(8)
    assert "--xla_force_host_platform_device_count=8" in captured["flags"]
    assert "count=4" not in captured["flags"]


# ---------------------------------------------------------------------------
# Round-3 review sweep #2 (curves / tokenizers / data / utils / posemb)
# ---------------------------------------------------------------------------


def test_gfpe_follows_token_count_not_isqrt():
    """gfpe tables must have exactly n_pos rows for 1D/grouped
    tokenizers (was: isqrt(n_pos) fallback -> 121 rows for 128 tokens,
    broadcast crash at init)."""
    from sfc_vit_tpu.curves import flat_lut
    from sfc_vit_tpu.models import build_posemb, gfpe

    # square path: bit-identical to the direct reference formula
    want = gfpe(flat_lut("hilbert", 8).astype(np.float32), 32)
    got = build_posemb("gfpe", 64, 32, curve="hilbert", grid=8)
    np.testing.assert_array_equal(got, want)

    # grouped: grid LUT finer than the token count -> first-cell
    # representative positions, still n_pos rows
    t = build_posemb("gfpe", 256, 64, curve="hilbert", grid=32)
    assert t.shape == (256, 64)
    lut = flat_lut("hilbert", 32).astype(np.float32)
    np.testing.assert_array_equal(
        t, gfpe(lut[::4], 64)
    )

    # non-square n_pos without a grid must raise, not mis-broadcast
    with pytest.raises(ValueError, match="perfect square"):
        build_posemb("gfpe", 128, 64, curve="hilbert", grid=None)


def test_gfpe_1d_tokenizer_model_initializes():
    """The CLI-reachable crash: 1D tokenizer (128 tokens from a 32px
    grid) + posemb='gfpe' must init and run."""
    cfg = ModelConfig(
        model="vit", tokenizer="1d", curve="hilbert", img_size=32,
        patch_size=8, embed_dim=64, depth=1, n_heads=2, mlp_dim=64,
        posemb="gfpe", attn_impl="xla",
    )
    model = build_model(cfg)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, cfg.num_classes)


def test_onion_cells_cache_immune_to_caller_mutation():
    """onion_cells returns a copy; mutating it must not corrupt the
    cached LUT that later models bake in as constants."""
    from sfc_vit_tpu.curves import onion_cells

    a = onion_cells(4, 4)
    first = tuple(a[0])
    a[0] = (99, 99)
    b = onion_cells(4, 4)
    assert tuple(b[0]) == first


def test_block_stitch_onion_covers_rectangles():
    """block_stitch over onion: odd dims crashed (onion_curve(0) divided
    by a zero grid -- reference bug) and b>=8 blocks under-covered."""
    from sfc_vit_tpu.curves import block_stitch_sfc
    from sfc_vit_tpu.curves.generators import onion_curve

    assert onion_curve(0) == []
    for w, h in [(3, 3), (5, 7), (8, 8), (9, 6)]:
        curve, blocked = block_stitch_sfc("onion", w, h)
        assert sorted(curve) == sorted(
            (x, y) for x in range(w) for y in range(h)
        ), (w, h)
        assert sum(len(b) for b in blocked) == len(curve)


def test_prefetch_early_break_releases_stager_thread():
    """Breaking out of a prefetch loop must stop the stager thread (was:
    blocked on q.put forever, pinning staged device batches)."""
    import threading
    import time

    from sfc_vit_tpu.data import prefetch_to_device

    pulled = []

    def source():
        for i in range(1000):
            pulled.append(i)
            yield (np.zeros((2, 2), np.float32),)

    before = set(threading.enumerate())
    it = prefetch_to_device(source(), size=2)
    next(it)
    it.close()  # what an early `break` does on GC
    deadline = time.time() + 5.0
    while time.time() < deadline:
        if not (set(threading.enumerate()) - before):
            break
        time.sleep(0.05)
    leaked = set(threading.enumerate()) - before
    assert not leaked, leaked
    assert len(pulled) < 1000  # source was not drained


def test_crop_box_matches_torchvision_sampler():
    """Crop boxes keep the sampled area/ratio joint distribution (was:
    independent clipping produced shrunken, aspect-distorted boxes
    torchvision never emits)."""
    from sfc_vit_tpu.data.augment import _sample_crop_box

    h = w = 32
    scale, ratio = (0.9, 1.0), (3 / 4, 4 / 3)
    for seed in range(200):
        y0, x0, ch, cw = map(
            float,
            _sample_crop_box(jax.random.PRNGKey(seed), h, w, scale, ratio),
        )
        assert 0.0 <= y0 and y0 + ch <= h + 1e-4
        assert 0.0 <= x0 and x0 + cw <= w + 1e-4
        r = cw / ch
        assert ratio[0] - 1e-4 <= r <= ratio[1] + 1e-4
        # a clipped box loses area below the sampled floor
        assert cw * ch >= scale[0] * h * w * (1 - 1e-5)


def test_registry_rejects_silently_ignored_flags():
    """posemb/fused on families that would ignore them must raise (was:
    --model hier --posemb gfpe trained with no positional encoding)."""
    for model in ("simple", "curvevit", "hier"):
        with pytest.raises(ValueError, match="posemb"):
            build_model(ModelConfig(model=model, posemb="gfpe"))
    with pytest.raises(ValueError, match="fused"):
        build_model(ModelConfig(model="curvevit", fused=True))
    # curve validation now runs for the inline-tokenizer families too
    with pytest.raises(KeyError, match="nosuch"):
        build_model(ModelConfig(model="curvevit", curve="nosuch"))
    with pytest.raises(KeyError, match="random"):
        build_model(ModelConfig(model="simple", curve="random"))


def test_gfpe_rejects_random_curve():
    from sfc_vit_tpu.models import build_posemb

    with pytest.raises(ValueError, match="random"):
        build_posemb("gfpe", 64, 32, curve="random", grid=8)


def test_token_merge_ratio_validated():
    from sfc_vit_tpu.ops.token_merge import curve_pair_merge_topk

    x = jnp.ones((1, 8, 4), jnp.float32)
    for bad in (1.5, -0.25):
        with pytest.raises(ValueError, match="merge_ratio"):
            curve_pair_merge_topk(x, merge_ratio=bad)


def test_mixer_block_out_dim_trap_raises():
    from sfc_vit_tpu.models.layers import MixerBlock

    blk = MixerBlock(seq_len=8, embed_dim=16, hidden_dim=32, out_dim=8)
    with pytest.raises(ValueError, match="out_dim == embed_dim"):
        blk.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)))


def test_segment_stats_single_point_curve():
    from sfc_vit_tpu.curves.metrics import segment_stats

    stats = segment_stats([(0, 0)], 1, 1)
    assert stats == {
        "total_length": 0.0,
        "avg_segment_length": 0.0,
        "max_segment_length": 0.0,
        "std_segment_length": 0.0,
    }


def test_int8_dense_keeps_flax_promotion_dtype():
    """Quantized serving must preserve nn.Dense(dtype=None)'s promotion
    rule (was: bf16 input to an fp32-param Dense came back bf16,
    changing every downstream dtype vs the unquantized model)."""
    import flax.linen as nn

    from sfc_vit_tpu.quant.int8 import quantize_dense_params, quantized_apply

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(8, name="d")(x)

    m = M()
    x = jnp.ones((2, 4), jnp.bfloat16)
    variables = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(variables, x)
    assert ref.dtype == jnp.float32  # stock flax promotion
    qtable = quantize_dense_params(variables, paths=[("d",)])
    out = quantized_apply(m, variables, qtable, x)
    assert out.dtype == ref.dtype


def test_int8_dense_keyword_invocation():
    """nn.Dense called as (inputs=x) must quantize, not IndexError."""
    import flax.linen as nn

    from sfc_vit_tpu.quant.int8 import quantize_dense_params, quantized_apply

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(8, name="d")(inputs=x)

    m = M()
    x = jnp.ones((2, 4), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    qtable = quantize_dense_params(variables, paths=[("d",)])
    out = quantized_apply(m, variables, qtable, x)
    assert out.shape == (2, 8)


def test_fused_mlp_grad_mixed_bias_dtype():
    """b2's cotangent keeps b2's own dtype (was: cast to w2.dtype, an
    aval mismatch for bf16-weight / fp32-bias callers)."""
    from sfc_vit_tpu.ops.fused_mlp import fused_mlp_block

    d, f = 128, 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, d)), jnp.bfloat16)
    ls = jnp.ones((d,), jnp.float32)
    lb = jnp.zeros((d,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, f)) * 0.05, jnp.bfloat16)
    b1 = jnp.zeros((f,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f, d)) * 0.05, jnp.bfloat16)
    b2 = jnp.zeros((d,), jnp.float32)

    def loss(b2_):
        out = fused_mlp_block(
            x, ls, lb, w1, b1, w2, b2_,
            interpret=True, train_impl="pallas",
        )
        return jnp.sum(out.astype(jnp.float32))

    g = jax.grad(loss)(b2)
    assert g.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(g), np.full((d,), 8.0), rtol=1e-2
    )


def test_local_attention_fallback_grad_single_forward_parity():
    """Dense-window fallback (n_blocks <= halo+1) gradients match the
    dense-mask XLA formula (the backward now reuses flash's residuals
    instead of re-running a dense forward)."""
    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 16, 1, 32)), jnp.float32)
        for _ in range(3)
    )

    def f_kernel(q, k, v):
        return jnp.sum(
            local_block_attention(q, k, v, block=8, halo=2, interpret=True)
            ** 2
        )

    def f_xla(q, k, v):
        return jnp.sum(
            local_block_attention_xla(q, k, v, block=8, halo=2) ** 2
        )

    g1 = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_trainer_applies_tensor_parallel_sharding():
    """--model-parallel without fsdp must shard params over 'model'
    (was: whole TrainState replicated, the model axis did fully
    redundant compute); losses must match the replicated trainer."""
    from sfc_vit_tpu.models import CurveViT
    from sfc_vit_tpu.training import TrainConfig, Trainer

    def make(mp):
        model = CurveViT(
            curve="hilbert", image_size=16, patch_size=4, num_classes=4,
            dim=64, depth=2, heads=2, mlp_dim=128, dim_head=32,
        )
        cfg = TrainConfig(
            num_classes=4, epochs=1, warmup_epochs=0, use_mixing=False,
            data_parallel=8 // mp, model_parallel=mp,
        )
        return Trainer(
            model, cfg, steps_per_epoch=2,
            sample_input=np.zeros((2, 16, 16, 3), np.float32),
        )

    tr = make(2)
    specs = {
        str(sh.spec)
        for sh in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda l: l.sharding, tr.state.params
            )
        )
    }
    assert any("model" in s for s in specs), specs

    rng = np.random.default_rng(0)
    xs = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    ys = (np.arange(8) % 4).astype(np.int32)
    batches = lambda: iter([(xs, ys)])
    rec_tp = tr.train_epoch(batches())
    rec_rep = make(1).train_epoch(batches())
    np.testing.assert_allclose(
        rec_tp["train_loss"], rec_rep["train_loss"], rtol=1e-5
    )


def test_trainer_pipeline_rejects_unsupported_model_loudly():
    """Unsupported model + --pipeline-parallel raises the explanatory
    TypeError (was: raw KeyError from the param split)."""
    from sfc_vit_tpu.registry import preset_config
    from sfc_vit_tpu.training import TrainConfig, Trainer

    model = build_model(preset_config("flagship", depth=4))
    cfg = TrainConfig(
        num_classes=10, epochs=1, use_mixing=False,
        data_parallel=2, pipeline_parallel=4,
    )
    with pytest.raises(TypeError, match="pre-norm ViT families"):
        Trainer(
            model, cfg, steps_per_epoch=1,
            sample_input=np.zeros((2, 32, 32, 3), np.float32),
        )


def test_eval_only_restores_best_across_pipeline_layouts(tmp_path):
    """restore_best converts checkpoint layouts like maybe_resume (was:
    --eval-only after a --pipeline-parallel run raised a tree
    mismatch)."""
    from sfc_vit_tpu.models import CurveViT
    from sfc_vit_tpu.training import TrainConfig, Trainer

    model = CurveViT(
        curve="hilbert", image_size=16, patch_size=4, num_classes=4,
        dim=32, depth=4, heads=2, mlp_dim=64, dim_head=16,
    )
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    ys = (np.arange(8) % 4).astype(np.int32)
    common = dict(
        num_classes=4, epochs=1, warmup_epochs=0, use_mixing=False,
        workdir=str(tmp_path),
    )
    tr_pp = Trainer(
        model,
        TrainConfig(data_parallel=2, pipeline_parallel=4,
                    pipeline_microbatches=2, **common),
        steps_per_epoch=1,
        sample_input=np.zeros((2, 16, 16, 3), np.float32),
    )
    rec = tr_pp.fit(
        lambda: iter([(xs, ys)]), lambda: iter([(xs, ys)]), epochs=1
    )
    tr_seq = Trainer(
        model, TrainConfig(data_parallel=8, **common), steps_per_epoch=1,
        sample_input=np.zeros((2, 16, 16, 3), np.float32),
    )
    tr_seq.restore_best()  # was: Orbax tree-structure mismatch
    out = tr_seq.evaluate(iter([(xs, ys)]))
    np.testing.assert_allclose(
        out["test_accuracy"], rec["test_accuracy"], rtol=1e-6
    )


def test_best_checkpoint_saved_only_on_improvement(tmp_path):
    """Non-improving epochs must not rewrite the best/ checkpoint."""
    from sfc_vit_tpu.training.checkpoint import Checkpointer

    state = {"w": jnp.ones((4,))}
    ck = Checkpointer(str(tmp_path), keep=2)
    ck.save(1, state, {"test_accuracy": 0.5})
    ck.wait()
    assert ck.best_step() == 1
    ck.save(2, state, {"test_accuracy": 0.4})  # worse: best/ untouched
    ck.wait()
    assert ck.best_step() == 1
    assert ck.best_metric() == 0.5
    ck.save(3, state, {"test_accuracy": 0.6})
    ck.wait()
    assert ck.best_step() == 3
    assert ck.best_metric() == 0.6
    ck.close()


def test_native_solver_rejects_out_of_grid_start():
    """An out-of-grid start cell must raise, not heap-corrupt (the C++
    search writes visited[start] unguarded)."""
    from sfc_vit_tpu.curves.native import (
        find_hamiltonian_path_native,
        native_available,
    )

    if not native_available():
        pytest.skip("no native toolchain")
    with pytest.raises(ValueError, match="outside"):
        find_hamiltonian_path_native(4, 4, adjacency_order={(10, 10): 0})


def test_metrics_csv_resume_keeps_header_alignment(tmp_path):
    """A resumed run (new process, different first-record shape) must
    append under the EXISTING csv header, not freeze new columns."""
    import csv as _csv

    from sfc_vit_tpu.training.metrics_logger import MetricsLogger

    lg = MetricsLogger(tmp_path, stdout=False, primary=True)
    lg.log({"epoch": 1, "train_loss": 1.0, "test_accuracy": 0.5})
    lg.close()
    lg2 = MetricsLogger(tmp_path, stdout=False, primary=True)
    lg2.log({"epoch": 2, "test_accuracy": 0.6})  # eval-only record
    lg2.close()
    with open(tmp_path / "metrics.csv", newline="") as f:
        rows = list(_csv.DictReader(f))
    assert rows[1]["epoch"] == "2"
    assert rows[1]["test_accuracy"] == "0.6"
    assert rows[1]["train_loss"] == ""  # blank, not misaligned


def test_bench_unrolled_and_ring_context(monkeypatch):
    """bench --attn-impl ring must actually enter the sequence-sharding
    context (was: silently measured XLA fallback); the unrolled timing
    harness runs end-to-end."""
    import bench

    rec = bench.main([
        "--quick", "--iters", "4", "--unroll", "2", "--curve", "hilbert",
        "--attn-impl", "ring", "--dtype", "float32",
    ])
    assert rec["value"] > 0


def test_bench_mfu_accounting():
    """The MFU line (VERDICT r4 item 8): nominal ViT-B/16 GEMM FLOPs
    must land on the published ~17.6 GFLOP/img figure, training must
    count the conventional 3x, and the --quick smoke must NOT carry an
    MFU field (its CPU numbers against a TPU envelope would be
    nonsense)."""
    import bench

    fwd = bench._model_flops_per_image(quick=False, train=False)
    # ViT-B/16 @224 is ~17.6 GMAC forward (the figure papers often
    # label "FLOPs"); MFU accounting uses 2 FLOPs/MAC => ~35 GFLOP.
    assert 33e9 < fwd < 37e9
    assert bench._model_flops_per_image(quick=False, train=True) == 3.0 * fwd

    rec = bench.main([
        "--quick", "--iters", "2", "--unroll", "1", "--dtype", "float32",
    ])
    assert "mfu" not in rec and "tflops_per_sec" not in rec
